"""BM25 keyword retrieval over the document corpus.

The data-curation uses: pulling topical subsets out of a 100-TB crawl
("all pages about X" for a domain-targeted corpus), nearest-keyword
context selection for RAG over the knowledge graph's evidence table, and
relevance-weighted sampling. Lexical BM25 is the standard first-stage
ranker; the embedding ANN operators (operators/similarity.py) are the
second stage.

Spark-first plan (Robertson/Sparck-Jones BM25, Lucene idf variant):

  * tokenize once (same whitespace-split contract as textstats) and
    filter to the query vocabulary IMMEDIATELY — the per-doc explode is
    pruned to query terms inside the scan stage, so the shuffled volume
    is O(matching tokens), not O(corpus tokens);
  * document frequencies of the query terms: one partial-agg groupBy over
    the (doc, term) distinct pairs — at most |terms| rows out;
  * avgdl: a 1-row aggregate crossJoined in (broadcast), never collected;
  * tf: one partial-agg groupBy(doc, term);
  * score: idf and the saturation term are pure column math; the per-doc
    sum over matched terms is ONE final partial-agg groupBy(doc).

Everything is JVM column expressions — no Python in the plan. The idf
table and avgdl row are broadcast; the corpus crosses the wire once, as
(doc, term, tf) rows pruned to the query vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), TOKEN_SPLIT)
        ).alias("term"),
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id_col, score) for every document matching >= 1 query term,
    BM25-scored against the whole corpus' statistics.

    idf is the Lucene non-negative variant ln(1 + (N - df + 0.5)/(df +
    0.5)); tf saturation tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl)). All
    constants and the tokenizer are part of the contract — the DuckDB
    oracle reproduces every double.
    """
    terms = sorted(set(t.lower() for t in query_terms))
    toks = _tokens(docs, id_col, text_col)

    # per-doc length BEFORE pruning (dl counts all tokens, not matches)
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    n_docs_avgdl = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    matched = toks.filter(F.col("term").isin(terms))
    tf = matched.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = (
        matched.select(id_col, "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )

    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(n_docs_avgdl))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    sat = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    return (
        scored.select(id_col, (idf * sat).alias("s"))
        .groupBy(id_col)
        .agg(F.round(F.sum("s"), 6).alias("score"))
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    weights: list[float] | None = None,
    top: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of N ranked
    lists: ``score(d) = sum_i w_i / (k + rank_i(d))`` — the standard
    hybrid-retrieval combiner (lexical BM25 + dense ANN) because it needs
    no score calibration between the legs, only ranks.

    Each input is (``id_col``, ``rank_col``) with rank starting at 1.
    Plan: tag + unionByName (no shuffle), ONE partial-agg groupBy on the
    id — each leg is already top-k-sized, so the fusion input is
    O(N*k*|queries|) regardless of corpus size. Scores are rounded to 6dp
    (the per-leg terms are exact binary rationals only for k+rank a power
    of two, so the sum is order-sensitive at the last ulp without it)."""
    if weights is None:
        weights = [1.0] * len(rankings)
    if len(weights) != len(rankings):
        raise ValueError("one weight per ranking")
    tagged = None
    for w, r in zip(weights, rankings):
        leg = r.select(
            F.col(id_col),
            (F.lit(float(w)) / (F.lit(float(k)) + F.col(rank_col))).alias(
                "contrib"
            ),
        )
        tagged = leg if tagged is None else tagged.unionByName(leg)
    fused = tagged.groupBy(id_col).agg(
        F.round(F.sum("contrib"), 6).alias("rrf_score"),
        F.count(F.lit(1)).cast("long").alias("n_lists"),
    )
    if top is not None:
        fused = fused.orderBy(F.desc("rrf_score"), id_col).limit(top)
    return fused


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k by BM25 — ordered take over the scored frame (TakeOrdered,
    no global sort materialization)."""
    scored = bm25_scores(docs, query_terms, id_col, text_col, k1, b)
    return scored.orderBy(F.desc("score"), id_col).limit(k)
