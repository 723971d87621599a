"""E6 — term-level annotation-faithfulness scoring (fully relational).

Ported semantics of utilities/compare_annotations.py:66-137: for each
extracted statement, the fraction of its (namespace, name) entity terms
that exist in the provided mention list; error classes:

  * ok                  — (db, entry_name) pair is in the mentions
  * wrong namespace     — the name was mentioned, but under a different db
  * manufactured entity — the name appears in no mention at all

No UDF: term harvesting is regexp_extract_all, the checks are two left
joins + conditional aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ns:value pairs inside BEL terms, e.g. p(HGNC:AKT1) -> (HGNC, AKT1)
_TERM_RE = r"([A-Z][A-Z0-9]+):([A-Za-z0-9_\-]+)"


def statement_terms(triples: DataFrame) -> DataFrame:
    """Explode each statement into its (db, name) entity terms."""
    stmts = triples.select("url", "para_idx", "sent_idx", "bel_statement")
    pairs = stmts.withColumn(
        "dbs", F.regexp_extract_all(F.col("bel_statement"), F.lit(_TERM_RE), 1)
    ).withColumn(
        "names", F.regexp_extract_all(F.col("bel_statement"), F.lit(_TERM_RE), 2)
    )
    return pairs.select(
        "url",
        "para_idx",
        "sent_idx",
        "bel_statement",
        F.explode(F.arrays_zip("dbs", "names")).alias("t"),
    ).select(
        "url",
        "para_idx",
        "sent_idx",
        "bel_statement",
        F.col("t.dbs").alias("db"),
        F.col("t.names").alias("term_name"),
    )


def annotation_faithfulness(triples: DataFrame, flat_mentions: DataFrame) -> DataFrame:
    """Per-statement faithfulness score + error-class counts."""
    terms = statement_terms(triples)
    by_pair = flat_mentions.select(
        F.col("db").alias("m_db"), F.col("entry_name").alias("term_name")
    ).distinct()
    by_name = flat_mentions.select(
        F.col("entry_name").alias("term_name")
    ).distinct().withColumn("name_known", F.lit(True))

    checked = (
        terms.join(
            F.broadcast(by_pair),
            (terms.db == by_pair.m_db) & (terms.term_name == by_pair.term_name),
            "left",
        )
        .drop(by_pair.term_name)
        .join(F.broadcast(by_name), "term_name", "left")
        .withColumn(
            "status",
            F.when(F.col("m_db").isNotNull(), F.lit("ok"))
            .when(F.col("name_known"), F.lit("wrong_namespace"))
            .otherwise(F.lit("manufactured_entity")),
        )
    )
    return checked.groupBy("url", "para_idx", "sent_idx", "bel_statement").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum((F.col("status") == "ok").cast("long")).alias("n_ok"),
        F.sum((F.col("status") == "wrong_namespace").cast("long")).alias(
            "n_wrong_namespace"
        ),
        F.sum((F.col("status") == "manufactured_entity").cast("long")).alias(
            "n_manufactured"
        ),
        F.round(
            F.sum((F.col("status") == "ok").cast("double")) / F.count(F.lit(1)), 6
        ).alias("faithfulness"),
    )
