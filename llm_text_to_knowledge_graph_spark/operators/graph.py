"""P3-P8 — canonicalization into node/edge property-graph tables.

Reference parity: convert_to_cx2.py:62-170 (node dedup on exact BEL-term
string, label/type extraction, first-wins entry_name -> identifiers.org URL
map, edge rows with source/target labels + bel_expression). The reference's
in-memory dict counters become:

  * node canonicalization  -> distinct + two-phase dense ids (plans/ids.py)
  * first-wins annotation  -> min_by over a deterministic occurrence key
  * edge endpoint lookup   -> two hash joins (broadcast when the node table
                              fits, sort-merge + AQE skew split otherwise;
                              entity frequencies are Zipf so this IS the
                              skew-sensitive join of the pipeline)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..functions.bel import extract_label, extract_type, identifiers_url
from ..plans.ids import dense_ids


@F.pandas_udf(StringType())
def _label_udf(name: pd.Series) -> pd.Series:
    return name.map(extract_label)


@F.pandas_udf(StringType())
def _type_udf(name: pd.Series) -> pd.Series:
    return name.map(extract_type)


def annotation_map(flat_mentions: DataFrame) -> DataFrame:
    """entry_name -> identifiers.org URL, first occurrence wins
    (convert_to_cx2.py:77-82; determinism via min_by over the occurrence key
    instead of scan order)."""
    with_url = flat_mentions.withColumn(
        "ann_url",
        F.concat(
            F.lit("https://identifiers.org/"),
            F.when(F.col("id").contains(":"), F.col("id")).otherwise(
                F.concat_ws(":", F.col("db"), F.col("id"))
            ),
        ),
    )
    return with_url.groupBy("entry_name").agg(
        F.expr(
            "min_by(ann_url, struct(url, para_idx, sent_idx, begin))"
        ).alias("ann_url")
    )


def build_nodes(triples: DataFrame, ann_map: DataFrame | None = None) -> DataFrame:
    """Canonical nodes: dedup by exact BEL-term string, dense ids, label/type,
    URL via name-then-label lookup (convert_to_cx2.py:151-166)."""
    names = (
        triples.select(F.col("subj").alias("name"))
        .unionAll(triples.select(F.col("obj").alias("name")))
        .filter(F.col("name").isNotNull())
        .distinct()
    )
    nodes = dense_ids(names, ["name"], out_col="node_id")
    nodes = nodes.withColumn("label", _label_udf(F.col("name"))).withColumn(
        "type", _type_udf(F.col("name"))
    )
    if ann_map is None:
        return nodes.withColumn("url", F.lit(None).cast("string")).select(
            "node_id", "name", "label", "type", "url"
        )
    by_name = ann_map.select(
        F.col("entry_name").alias("name"), F.col("ann_url").alias("_url_by_name")
    )
    by_label = ann_map.select(
        F.col("entry_name").alias("label"), F.col("ann_url").alias("_url_by_label")
    )
    nodes = (
        nodes.join(F.broadcast(by_name), "name", "left")
        .join(F.broadcast(by_label), "label", "left")
        .withColumn("url", F.coalesce("_url_by_name", "_url_by_label"))
        .select("node_id", "name", "label", "type", "url")
    )
    return nodes


def build_edges(triples: DataFrame, nodes: DataFrame, broadcast_nodes: bool = False) -> DataFrame:
    """Edge materialization (convert_to_cx2.py:104-133): endpoint-id joins +
    bel_expression/text/evidence carry-through, dense edge ids."""
    node_ids = nodes.select("node_id", "name")
    if broadcast_nodes:
        node_ids = F.broadcast(node_ids)
    s_ids = node_ids.select(
        F.col("name").alias("subj"), F.col("node_id").alias("s")
    )
    t_ids = node_ids.select(F.col("name").alias("obj"), F.col("node_id").alias("t"))
    edges = (
        triples.join(s_ids, "subj").join(t_ids, "obj")
        .withColumn(
            "bel_expression", F.concat_ws(" ", F.col("subj"), F.col("pred"), F.col("obj"))
        )
        .select(
            "url",
            "para_idx",
            "sent_idx",
            "s",
            "t",
            F.col("pred").alias("interaction"),
            "bel_expression",
            F.col("evidence").alias("text"),
            "evidence",
        )
    )
    edges = dense_ids(
        edges,
        ["url", "para_idx", "sent_idx", "bel_expression"],
        out_col="edge_id",
    )
    return edges.select(
        "edge_id", "s", "t", "interaction", "bel_expression", "text", "evidence"
    )


def identifiers_url_col(db, the_id):
    """Column-expression form of the identifiers.org URL construction
    (grounding_genes.py:75-92) for relational use."""
    return F.concat(
        F.lit("https://identifiers.org/"),
        F.when(the_id.contains(":"), the_id).otherwise(F.concat_ws(":", db, the_id)),
    )


# keep the pure-Python version importable next to the column version
__all__ = [
    "annotation_map",
    "build_nodes",
    "build_edges",
    "identifiers_url_col",
    "identifiers_url",
]
