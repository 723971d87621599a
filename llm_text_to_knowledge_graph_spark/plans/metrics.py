"""Pipeline metrics: per-stage table statistics.

The reference prints wall times (main.py:465-466); at scale the equivalent
is a metrics table per stage commit. Distinct-cardinality columns use
approx_count_distinct (HyperLogLog++) — exact distinct would add a full
shuffle per metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_stats(df: DataFrame, key_cols: list[str] | None = None) -> dict:
    """rows + approximate distinct cardinality per key column (one job)."""
    keys = key_cols or []
    aggs = [F.count(F.lit(1)).alias("rows")]
    for k in keys:
        aggs.append(F.approx_count_distinct(k).alias(f"approx_distinct_{k}"))
    row = df.agg(*aggs).collect()[0]
    return row.asDict()


def graph_stats(nodes: DataFrame, edges: DataFrame) -> dict:
    """Headline KG stats: node/edge counts, distinct relations, degree skew
    (max in-degree vs mean — the signal that P7 needs skew handling)."""
    n = nodes.count()
    e = edges.count()
    rel = edges.agg(F.approx_count_distinct("interaction").alias("r")).collect()[0]["r"]
    deg = (
        edges.groupBy("t").agg(F.count(F.lit(1)).alias("d"))
        .agg(F.max("d").alias("max_d"), F.avg("d").alias("avg_d"))
        .collect()[0]
    )
    return {
        "nodes": n,
        "edges": e,
        "approx_distinct_relations": rel,
        "max_in_degree": deg["max_d"],
        "avg_in_degree": float(deg["avg_d"]) if deg["avg_d"] is not None else 0.0,
    }
