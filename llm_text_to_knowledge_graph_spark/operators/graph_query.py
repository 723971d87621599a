"""Query layer over the canonical nodes/edges tables.

The reference's downstream consumption pattern (examples/bel_graph_rag.ipynb:
merge networks, look up entities, walk neighborhoods for RAG context) maps
to relational graph queries over the two tables:

  * neighbors / k-hop expansion — iterative self-joins (breadth-first
    frontier, dedup per hop; k is small and fixed, so no Pregel needed)
  * hubs — degree aggregation (the Zipf heads that drive join skew)
  * edge evidence lookup — the provenance a RAG prompt wants

All pure DataFrame ops; at scale the edges table is bucketed by ``s`` so
the frontier join co-locates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected_edges(edges: DataFrame) -> DataFrame:
    """(s, t) plus (t, s) — neighborhood queries ignore direction.
    Only the endpoint columns are kept (works for any edge-like input)."""
    fwd = edges.select("s", "t")
    rev = edges.select(F.col("t").alias("s"), F.col("s").alias("t"))
    return fwd.unionByName(rev)


def k_hop_neighborhood(
    edges: DataFrame, seed_node_ids: list[int], k: int = 2
) -> DataFrame:
    """All nodes within k undirected hops of the seeds.

    Returns (node_id, hop) with the minimal hop distance (0 = seed).
    Iterative frontier expansion: k self-joins, frontier deduped against
    the visited set each hop (left_anti), so work is proportional to the
    neighborhood, not the graph.
    """
    spark = edges.sparkSession
    und = undirected_edges(edges)
    visited = spark.createDataFrame(
        [(int(i), 0) for i in seed_node_ids], "node_id long, hop int"
    )
    frontier = visited.select("node_id")
    for hop in range(1, k + 1):
        nxt = (
            und.join(frontier.withColumnRenamed("node_id", "s"), "s")
            .select(F.col("t").alias("node_id"))
            .distinct()
            .join(visited.select("node_id"), "node_id", "left_anti")
            .withColumn("hop", F.lit(hop))
        )
        nxt = nxt.persist()
        if nxt.isEmpty():
            nxt.unpersist()
            break
        visited = visited.unionByName(nxt)
        frontier = nxt.select("node_id")
    return visited


def subgraph(edges: DataFrame, node_ids_df: DataFrame) -> DataFrame:
    """Edges with BOTH endpoints inside the given node set (two semi-joins)."""
    ids = node_ids_df.select(F.col("node_id"))
    return (
        edges.join(ids.withColumnRenamed("node_id", "s"), "s", "left_semi")
        .join(ids.withColumnRenamed("node_id", "t"), "t", "left_semi")
    )


def top_hubs(edges: DataFrame, nodes: DataFrame, k: int = 20) -> DataFrame:
    """Highest-degree entities (undirected degree), with names."""
    deg = (
        undirected_edges(edges)
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("degree"))
        .withColumnRenamed("s", "node_id")
    )
    return (
        deg.join(nodes.select("node_id", "name", "label"), "node_id")
        .orderBy(F.desc("degree"), F.asc("node_id"))
        .limit(k)
    )


def evidence_for_pair(
    edges: DataFrame, nodes: DataFrame, name_a: str, name_b: str
) -> DataFrame:
    """All statements + evidence sentences connecting two entities by name
    (either direction) — the RAG provenance lookup."""
    ids = nodes.filter(F.col("name").isin([name_a, name_b])).select("node_id", "name")
    a = ids.filter(F.col("name") == name_a).select(F.col("node_id").alias("id_a"))
    b = ids.filter(F.col("name") == name_b).select(F.col("node_id").alias("id_b"))
    pair = a.crossJoin(b)
    return edges.join(
        F.broadcast(pair),
        ((edges.s == pair.id_a) & (edges.t == pair.id_b))
        | ((edges.s == pair.id_b) & (edges.t == pair.id_a)),
    ).select("interaction", "bel_expression", "evidence")
