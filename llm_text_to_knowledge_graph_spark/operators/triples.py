"""P1/P2 — BEL statement parse -> (subj, pred, obj) triples.

Reference parity: transform_bel_statements.py:1-105. The balanced-paren
parse is not regex-expressible (nesting), so it runs as an Arrow-batched
pandas UDF over the pure function in functions/bel.py; the flattening /
null-dropping is relational so Catalyst can push filters around it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..functions.bel import split_statement

_SPLIT_SCHEMA = StructType(
    [
        StructField("subj", StringType(), True),
        StructField("pred", StringType(), True),
        StructField("obj", StringType(), True),
    ]
)


@F.pandas_udf(_SPLIT_SCHEMA)
def _split_udf(stmt: pd.Series) -> pd.DataFrame:
    parts = [split_statement(s) for s in stmt]
    return pd.DataFrame(
        {
            "subj": [p[0] for p in parts],
            "pred": [p[1] for p in parts],
            "obj": [p[2] for p in parts],
        }
    )


def parse_triples(statements: DataFrame, keep_unary: bool = False) -> DataFrame:
    """STATEMENTS -> TRIPLES. Edge rows require subj & pred & obj all present
    (transform_bel_statements.py:88 guard); unary statements can be kept for
    node-only semantics when ``keep_unary``."""
    parsed = statements.withColumn("p", _split_udf(F.col("bel_statement"))).select(
        "url",
        "warc_ts",
        "para_idx",
        "sent_idx",
        F.col("p.subj").alias("subj"),
        F.col("p.pred").alias("pred"),
        F.col("p.obj").alias("obj"),
        "bel_statement",
        "evidence",
    )
    if keep_unary:
        return parsed
    return parsed.filter(
        F.col("subj").isNotNull() & F.col("pred").isNotNull() & F.col("obj").isNotNull()
    )
