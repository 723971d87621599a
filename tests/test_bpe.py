"""BPE tokenizer (functions/bpe.py).

The greedy lowest-rank encoder is checked against an INDEPENDENT
sequential-application implementation (apply each merge rule in rank
order across the word — the textbook-equivalent formulation), plus
determinism, concatenation and Spark/driver parity checks."""

import pyspark.sql.functions as F

from llm_text_to_knowledge_graph_spark.functions.bpe import (
    EOW,
    _word_syms,
    bpe_encode_df,
    bpe_encode_word,
    bpe_train,
)


def _seq_apply(word: str, merges) -> list[str]:
    """Independent reference: apply merges one at a time, in rank order,
    merging every occurrence before moving to the next rule."""
    syms = list(_word_syms(word))
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


CORPUS = [
    (0, "the cat sat on the mat and the cat ran"),
    (1, "the protein binds the receptor and the receptor responds"),
    (2, "protein expression in the cell increases protein binding"),
    (3, "cats and mats and rats and bats in the cell"),
]


def test_encoder_matches_sequential_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = bpe_train(docs, n_merges=50)
    assert len(merges) > 10
    ranks = {p: i for i, p in enumerate(merges)}
    words = set(" ".join(t for _, t in CORPUS).split()) | {
        "unseen", "receptorless", "x", "thecat"
    }
    for w in words:
        assert bpe_encode_word(w, ranks) == _seq_apply(w, merges), w


def test_training_is_deterministic(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    assert bpe_train(docs, n_merges=30) == bpe_train(docs, n_merges=30)


def test_roundtrip_and_compression(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = bpe_train(docs, n_merges=80)
    ranks = {p: i for i, p in enumerate(merges)}
    for _, text in CORPUS:
        for w in text.split():
            toks = bpe_encode_word(w, ranks)
            # lossless: concatenating tokens restores the word + marker
            assert "".join(toks) == w + EOW
    # frequent in-sample words compress to few tokens
    assert len(bpe_encode_word("the", ranks)) == 1
    assert len(bpe_encode_word("protein", ranks)) <= 3


def test_encode_df_matches_driver(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = bpe_train(docs, n_merges=40)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_encode_df(docs, merges).collect()
    }
    for did, text in CORPUS:
        words = text.lower().split()
        n_tok = sum(len(bpe_encode_word(w, ranks)) for w in words)
        assert got[did] == (len(words), n_tok)


def test_encode_df_plan_single_crossing(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = bpe_train(docs, n_merges=10)
    plan = (
        bpe_encode_df(docs, merges)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan  # map-only: tokenization rides the scan
