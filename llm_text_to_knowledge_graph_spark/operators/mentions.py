"""C1 — mention detection + grounding against a broadcast alias dictionary.

Reference parity: grounding_genes.py:13-52 (Gilda annotate per paragraph,
keep each mention's top match (db, id, entry_name)). Here the dictionary is
a Spark broadcast; scanning is a leftmost-longest compiled-regex pass inside
an Arrow-batched pandas UDF (no per-row Python crossing). Disambiguation of
an ambiguous surface form is top-1 by prior with a stable (db, id) tie-break
— the relational equivalent of "keep Gilda's top match".

At 100TB the dictionary (a few MB) broadcasts once per executor; the scan is
embarrassingly parallel with zero shuffle.
"""

from __future__ import annotations

import re
import uuid

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from ..schemas import MENTION

# per-executor-process matcher cache, keyed by a per-call uuid token (lazy
# init once per Python worker — the reference's lru_cache analog, SURVEY.md
# §4). NOT keyed by id(broadcast): memory addresses are reused after GC,
# which silently served a stale dictionary to later runs in one session.
_MATCHER_CACHE: dict[str, "AliasMatcher"] = {}


class AliasMatcher:
    """Leftmost-longest dictionary matcher over word-boundary alias spans."""

    def __init__(self, alias_rows: list[tuple[str, str, str, str, float]]):
        best: dict[str, tuple[str, str, str, float]] = {}
        for alias, db, ent_id, entry_name, prior in alias_rows:
            cur = best.get(alias)
            cand = (db, ent_id, entry_name, float(prior))
            # top-1 by prior, stable tie-break by (db, id)
            if (
                cur is None
                or cand[3] > cur[3]
                or (cand[3] == cur[3] and (cand[0], cand[1]) < (cur[0], cur[1]))
            ):
                best[alias] = cand
        self.lookup = best
        ordered = sorted(best, key=len, reverse=True)
        pattern = "|".join(re.escape(a) for a in ordered)
        self.rx = re.compile(rf"(?<![\w-])({pattern})(?![\w-])") if ordered else None

    def find(self, text: str) -> list[tuple]:
        if self.rx is None:
            return []
        out = []
        for m in self.rx.finditer(text):
            alias = m.group(1)
            db, ent_id, entry_name, prior = self.lookup[alias]
            out.append((m.start(), m.end(), alias, db, ent_id, entry_name, prior))
        return out


def _get_matcher(bc, token: str) -> AliasMatcher:
    matcher = _MATCHER_CACHE.get(token)
    if matcher is None:
        if len(_MATCHER_CACHE) >= 8:  # bound worker memory across many runs
            _MATCHER_CACHE.clear()
        matcher = AliasMatcher(bc.value)
        _MATCHER_CACHE[token] = matcher
    return matcher


def detect_mentions(sentences: DataFrame, alias_rows: list) -> DataFrame:
    """sentences -> MENTIONS schema (sentence + array<mention struct>).

    ``alias_rows``: list of (alias, db, id, entry_name, prior) broadcast to
    every executor.
    """
    spark = sentences.sparkSession
    bc = spark.sparkContext.broadcast(list(alias_rows))
    token = uuid.uuid4().hex

    @F.pandas_udf(ArrayType(MENTION))
    def _annotate(sent: pd.Series) -> pd.Series:
        matcher = _get_matcher(bc, token)
        return pd.Series(
            [
                [
                    {
                        "begin": b,
                        "end": e,
                        "alias": a,
                        "db": db,
                        "id": i,
                        "entry_name": n,
                        "score": p,
                    }
                    for (b, e, a, db, i, n, p) in matcher.find(s)
                ]
                for s in sent
            ]
        )

    return sentences.withColumn("mentions", _annotate(F.col("sentence")))


def explode_mentions(mentions_df: DataFrame) -> DataFrame:
    """Flat mention rows (url, para_idx, sent_idx, begin, end, db, id,
    entry_name, score) — the relational view of D3 for joins/eval."""
    return mentions_df.select(
        "url",
        "warc_ts",
        "para_idx",
        "sent_idx",
        F.explode("mentions").alias("m"),
    ).select(
        "url",
        "warc_ts",
        "para_idx",
        "sent_idx",
        F.col("m.begin").alias("begin"),
        F.col("m.end").alias("end"),
        F.col("m.alias").alias("alias"),
        F.col("m.db").alias("db"),
        F.col("m.id").alias("id"),
        F.col("m.entry_name").alias("entry_name"),
        F.col("m.score").alias("score"),
    )


def count_mentions_native(sentences: DataFrame, alias_rows: list) -> DataFrame:
    """Pure-counting fast path: per-entity mention counts with NO Python
    crossing (PLANS.md round-1 follow-up).

    Builds the same leftmost-longest alternation pattern as ``AliasMatcher``
    (length-desc ordered alternates, word-boundary lookarounds) and runs it
    through the JVM's ``regexp_extract_all`` inside WholeStageCodegen; the
    alias -> entry_name grounding is a broadcast join against the top-1
    dictionary. Match parity with the Python matcher: both engines use
    ordered-alternation leftmost semantics, and ``(?U)`` forces Java's \\w
    to the Unicode class Python uses. For counting workloads (entity
    frequency tables, vocab pruning) this is the plan to use — the full
    ``detect_mentions`` is only needed when downstream wants spans/scores.
    """
    spark = sentences.sparkSession
    matcher = AliasMatcher(alias_rows)
    if not matcher.lookup:
        return spark.createDataFrame([], "entry_name string, n_mentions long")
    ordered = sorted(matcher.lookup, key=len, reverse=True)
    pattern = (
        r"(?U)(?<![\w-])(" + "|".join(re.escape(a) for a in ordered) + r")(?![\w-])"
    )
    amap = spark.createDataFrame(
        [(a, v[2]) for a, v in matcher.lookup.items()],
        "alias string, entry_name string",
    )
    hits = sentences.select(
        F.explode(
            F.regexp_extract_all(F.col("sentence"), F.lit(pattern), F.lit(1))
        ).alias("alias")
    )
    return (
        hits.join(F.broadcast(amap), "alias")
        .groupBy("entry_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_mentions"))
    )
