"""edge_rollup / contradictions (operators/kgquality.py) vs hand-computed
expectations and a pure-Python replay."""

from __future__ import annotations

import pytest

from llm_text_to_knowledge_graph_spark.operators.kgquality import (
    contradictions,
    edge_rollup,
)

COLS = ["url", "subj", "pred", "obj", "bel_statement"]
ROWS = [
    # A increases B asserted twice in doc1 (dup statement), once in doc2
    ("doc://1", "A", "increases", "B", "A increases B"),
    ("doc://1", "A", "increases", "B", "A increases B"),
    ("doc://2", "A", "increases", "B", "A increases B"),
    # A decreases B: the contradiction, one doc
    ("doc://3", "A", "decreases", "B", "A decreases B"),
    # directly* variants count into the same sign families
    ("doc://4", "C", "directlyIncreases", "D", "C directlyIncreases D"),
    ("doc://5", "C", "directlyDecreases", "D", "C directlyDecreases D"),
    ("doc://6", "C", "directlyDecreases", "D", "C directlyDecreases D"),
    # association is unsigned: never a contradiction
    ("doc://7", "E", "association", "F", "E association F"),
    ("doc://8", "E", "association", "F", "E association F"),
]


@pytest.fixture(scope="module")
def stmts(spark):
    return spark.createDataFrame(ROWS, COLS)


def test_edge_rollup_support(stmts):
    got = {
        (r["subj"], r["pred"], r["obj"]): r
        for r in edge_rollup(stmts).collect()
    }
    assert len(got) == 5
    aib = got[("A", "increases", "B")]
    assert aib["n_evidence"] == 3
    assert aib["n_docs"] == 2
    assert aib["first_url"] == "doc://1"
    assert aib["bel_statement"] == "A increases B"
    assert got[("E", "association", "F")]["n_evidence"] == 2
    assert got[("C", "directlyDecreases", "D")]["n_docs"] == 2


def test_edge_rollup_deterministic_rep(spark):
    # min() representative: stable whichever partition arrives first
    df = spark.createDataFrame(
        [("u2", "A", "p", "B", "stmt-z"), ("u1", "A", "p", "B", "stmt-a")],
        COLS,
    ).repartition(4)
    r = edge_rollup(df).collect()[0]
    assert r["first_url"] == "u1"
    assert r["bel_statement"] == "stmt-a"


def test_contradictions(stmts):
    got = {(r["subj"], r["obj"]): r for r in contradictions(stmts).collect()}
    # E/F is association-only: filtered before the shuffle
    assert set(got) == {("A", "B"), ("C", "D")}
    ab = got[("A", "B")]
    assert (ab["n_pos"], ab["n_neg"]) == (3, 1)
    assert ab["conflict_ratio"] == pytest.approx(1 / 3, abs=1e-6)
    cd = got[("C", "D")]
    assert (cd["n_pos"], cd["n_neg"]) == (1, 2)
    assert cd["conflict_ratio"] == pytest.approx(0.5, abs=1e-6)


def test_contradictions_none(spark):
    df = spark.createDataFrame(
        [("u", "A", "increases", "B", "s"), ("u", "B", "decreases", "A", "s")],
        COLS,
    )
    # opposite signs on DIFFERENT (subj, obj) pairs are not a conflict
    assert contradictions(df).count() == 0


def test_single_shuffle_plans(stmts):
    plan = edge_rollup(stmts)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # partial agg + distinct expand phase
    plan2 = contradictions(stmts)._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("Exchange") == 1
