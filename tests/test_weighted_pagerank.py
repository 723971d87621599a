"""Weighted PageRank (graph_query.pagerank weight_col=) vs an independent
numpy power iteration with the same teleport/dangling handling."""

import numpy as np

from llm_text_to_knowledge_graph_spark.operators.graph_query import pagerank

EDGES = [  # (s, t, w) — node 5 and 6 are dangling (no out-edges)
    (1, 2, 3.0),
    (1, 3, 1.0),
    (2, 3, 2.0),
    (3, 5, 1.0),
    (4, 5, 5.0),
    (4, 6, 1.0),
    (2, 6, 4.0),
]


def _py_weighted_pr(edges, iters, d=0.85):
    nodes = sorted({x for s, t, _ in edges for x in (s, t)})
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for s, t, w in edges:
        W[ix[s], ix[t]] += w
    wout = W.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for i in range(n):
            if wout[i] > 0:
                contrib += r[i] * W[i] / wout[i]
        r = (1.0 - d) / n + d * contrib
        r = r + (1.0 - r.sum()) / n  # dangling mass, uniform
    return {v: r[ix[v]] for v in nodes}


def test_weighted_pagerank_matches_numpy(spark):
    df = spark.createDataFrame(EDGES, "s long, t long, n_links double")
    got = {
        r.node_id: r.rank
        for r in pagerank(
            df, iterations=5, undirected=False, weight_col="n_links"
        ).collect()
    }
    want = _py_weighted_pr(EDGES, 5)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_uniform_weights_equal_unweighted(spark):
    uw = [(s, t) for s, t, _ in EDGES]
    df_u = spark.createDataFrame(uw, "s long, t long")
    df_w = spark.createDataFrame(
        [(s, t, 1.0) for s, t in uw], "s long, t long, w double"
    )
    r_u = {r.node_id: r.rank for r in pagerank(df_u, 4, undirected=False).collect()}
    r_w = {
        r.node_id: r.rank
        for r in pagerank(df_w, 4, undirected=False, weight_col="w").collect()
    }
    for v in r_u:
        assert abs(r_u[v] - r_w[v]) < 1e-12
