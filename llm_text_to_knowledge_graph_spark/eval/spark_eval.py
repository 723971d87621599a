"""Distributed P/R evaluation: grouped bipartite matching + aggregation.

E4 (per-evidence-group matching) runs as applyInPandas over
groupBy(url, evidence) — the groups are tiny by construction (statements
sharing one evidence sentence), so the Python matcher cost is bounded while
the shuffle distributes groups across the cluster. E5 (P/R aggregation) is
a relational groupBy at the end.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from .bel_eval import match_group

MATCH_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("evidence", StringType(), False),
        StructField("pred_statement", StringType(), True),
        StructField("gold_statement", StringType(), True),
        StructField("match_type", StringType(), False),
        StructField("score", DoubleType(), False),
    ]
)


def match_statements(
    pred: DataFrame, gold: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """pred/gold: DataFrames with (url, evidence, bel_statement).
    Returns one row per matched pair / unmatched statement."""
    p = pred.select(
        "url", "evidence", F.col("bel_statement").alias("stmt"), F.lit("pred").alias("side")
    )
    g = gold.select(
        "url", "evidence", F.col("bel_statement").alias("stmt"), F.lit("gold").alias("side")
    )
    both = p.unionByName(g)

    def _match(key, pdf: pd.DataFrame) -> pd.DataFrame:
        url, evidence = key
        preds = pdf.loc[pdf["side"] == "pred", "stmt"].tolist()
        golds = pdf.loc[pdf["side"] == "gold", "stmt"].tolist()
        rows = match_group(preds, golds, threshold=threshold)
        return pd.DataFrame(
            {
                "url": url,
                "evidence": evidence,
                "pred_statement": [r["pred_statement"] for r in rows],
                "gold_statement": [r["gold_statement"] for r in rows],
                "match_type": [r["match_type"] for r in rows],
                "score": [r["score"] for r in rows],
            }
        )

    return both.groupBy("url", "evidence").applyInPandas(_match, schema=MATCH_SCHEMA)


def precision_recall(matches: DataFrame) -> dict:
    """E5 semantics: precision = matched/total_pred, recall = matched/total_gold
    (compare_bel_statements.py:128-148; matched = exact+core)."""
    agg = matches.agg(
        F.sum(
            (F.col("match_type").isin("exact_match", "core_match")).cast("long")
        ).alias("matched"),
        F.sum((F.col("pred_statement").isNotNull()).cast("long")).alias("pred_total"),
        F.sum((F.col("gold_statement").isNotNull()).cast("long")).alias("gold_total"),
        F.sum((F.col("match_type") == "exact_match").cast("long")).alias("exact"),
    ).collect()[0]
    matched, pred_total, gold_total = agg["matched"], agg["pred_total"], agg["gold_total"]
    return {
        "matched": matched,
        "exact": agg["exact"],
        "pred_total": pred_total,
        "gold_total": gold_total,
        "precision": matched / pred_total if pred_total else 0.0,
        "recall": matched / gold_total if gold_total else 0.0,
    }
