"""Reciprocal-rank fusion (operators/retrieval.py::rrf_fuse) vs a
pure-Python replay."""

from __future__ import annotations

import pytest

from llm_text_to_knowledge_graph_spark.operators.retrieval import rrf_fuse

LEX = [(1, 1), (2, 2), (3, 3)]          # (doc_id, rank)
DEN = [(3, 1), (9, 2), (1, 3)]


def _py_rrf(k=60, w=(1.0, 1.0)):
    out = {}
    for wi, leg in zip(w, (LEX, DEN)):
        for d, r in leg:
            s, n = out.get(d, (0.0, 0))
            out[d] = (s + wi / (k + r), n + 1)
    return {d: (round(s, 6), n) for d, (s, n) in out.items()}


@pytest.fixture(scope="module")
def legs(spark):
    a = spark.createDataFrame(LEX, ["doc_id", "rank"])
    b = spark.createDataFrame(DEN, ["doc_id", "rank"])
    return a, b


def test_rrf_matches_python(legs):
    got = {
        r["doc_id"]: (r["rrf_score"], r["n_lists"])
        for r in rrf_fuse(list(legs)).collect()
    }
    assert got == _py_rrf()
    # doc 1 and 3 appear in both legs at mirrored ranks: identical scores
    assert got[1] == got[3]
    assert got[1][1] == 2
    assert got[9][1] == 1


def test_rrf_weights_and_top(legs):
    got = rrf_fuse(list(legs), weights=[2.0, 1.0], top=2).collect()
    expect = _py_rrf(w=(2.0, 1.0))
    order = sorted(expect, key=lambda d: (-expect[d][0], d))[:2]
    assert [r["doc_id"] for r in got] == order


def test_rrf_weight_arity(legs):
    with pytest.raises(ValueError):
        rrf_fuse(list(legs), weights=[1.0])
