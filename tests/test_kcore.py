"""k-core peeling vs an independent Python reference, plus structural
cases (cliques survive, trees vanish, chain peeling depth)."""

import numpy as np

from llm_text_to_knowledge_graph_spark.operators.graph_query import k_core


def _py_kcore(pairs, k):
    """Independent reference: repeated low-degree removal to fixpoint."""
    adj = {}
    for s, t in pairs:
        adj.setdefault(s, set()).add(t)
        adj.setdefault(t, set()).add(s)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for u in adj[v]:
                    adj[u].discard(v)
                del adj[v]
                changed = True
    return {v: len(ns) for v, ns in adj.items() if ns}


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "s long, t long")


def test_matches_python_reference_random(spark):
    rng = np.random.RandomState(5)
    pairs = list(
        {
            (int(a), int(b))
            for a, b in rng.randint(0, 60, size=(220, 2))
            if a != b
        }
    )
    for k in (2, 3, 4):
        got = {
            r["node_id"]: r["degree"]
            for r in k_core(_df(spark, pairs), k=k).collect()
        }
        assert got == _py_kcore(pairs, k), k


def test_clique_survives_tree_vanishes(spark):
    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    tree = [(100, 101), (101, 102), (101, 103), (103, 104)]
    got = {
        r["node_id"]: r["degree"]
        for r in k_core(_df(spark, clique + tree), k=3).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}  # K4 is its own 3-core


def test_chain_peels_layer_per_round_and_cycle_survives(spark):
    chain = [(i, i + 1) for i in range(6)]
    cycle = [(10, 11), (11, 12), (12, 10)]
    got = {
        r["node_id"]: r["degree"]
        for r in k_core(_df(spark, chain + cycle), k=2).collect()
    }
    assert got == {10: 2, 11: 2, 12: 2}  # the path peels away entirely
