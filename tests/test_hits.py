"""HITS hubs/authorities (graph_query.hits_scores) vs an independent
numpy power iteration with the same L1 normalization."""

import numpy as np
import pytest

from llm_text_to_knowledge_graph_spark.operators.graph_query import hits_scores


def _py_hits(edges, iterations):
    nodes = sorted({x for e in edges for x in e})
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for s, t in set(edges):
        A[ix[s], ix[t]] = 1.0
    hub = np.full(n, 1.0 / n)
    auth = np.zeros(n)
    for _ in range(iterations):
        auth = A.T @ hub
        auth = auth / max(auth.sum(), 1e-300)
        hub = A @ auth
        hub = hub / max(hub.sum(), 1e-300)
    return {v: (hub[ix[v]], auth[ix[v]]) for v in nodes}


def test_hits_matches_numpy(spark):
    edges = [(1, 2), (1, 3), (2, 3), (4, 3), (4, 2), (5, 1), (3, 6)]
    got = {
        r.node_id: (r.hub, r.authority)
        for r in hits_scores(
            spark.createDataFrame(edges, "s long, t long"), iterations=4
        ).collect()
    }
    want = _py_hits(edges, 4)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v][0] - want[v][0]) < 1e-9, v
        assert abs(got[v][1] - want[v][1]) < 1e-9, v


def test_hits_star_graph_structure(spark):
    # spokes all point at the center: center is the unique authority,
    # spokes are equal hubs, center's hub score is 0 (no out-edges)
    edges = [(i, 99) for i in range(1, 6)]
    rows = {
        r.node_id: r
        for r in hits_scores(
            spark.createDataFrame(edges, "s long, t long"), iterations=3
        ).collect()
    }
    assert abs(rows[99].authority - 1.0) < 1e-12
    assert rows[99].hub == 0.0
    for i in range(1, 6):
        assert abs(rows[i].hub - 0.2) < 1e-12
        assert rows[i].authority == 0.0


def test_hits_rejects_zero_iterations(spark):
    df = spark.createDataFrame([(1, 2)], ["s", "t"])
    with pytest.raises(ValueError, match="iterations must be >= 1"):
        hits_scores(df, iterations=0)
