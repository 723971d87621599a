"""JL random projection (similarity.random_projection): numpy parity,
determinism, and the JL pairwise-distance-preservation property."""

import numpy as np

from llm_text_to_knowledge_graph_spark.operators.similarity import (
    _hyperplanes,
    random_projection,
)

DIM, OUT = 32, 12


def _vecs(n, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randn(n, DIM)


def _df(spark, X):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )


def test_matches_numpy_projection(spark):
    X = _vecs(20)
    got = {
        r.vec_id: np.array(r.proj)
        for r in random_projection(_df(spark, X), OUT, DIM, seed=5).collect()
    }
    G = _hyperplanes(DIM, OUT, seed=5)
    want = X @ G.T / np.sqrt(OUT)
    for i in range(20):
        assert np.allclose(got[i], want[i], atol=1e-9)


def test_deterministic_across_partitionings(spark):
    X = _vecs(30)
    a = random_projection(_df(spark, X), OUT, DIM, seed=3).collect()
    b = random_projection(
        _df(spark, X).repartition(7), OUT, DIM, seed=3
    ).collect()
    da = {r.vec_id: tuple(r.proj) for r in a}
    db = {r.vec_id: tuple(r.proj) for r in b}
    assert da == db


def test_pairwise_distances_roughly_preserved(spark):
    # JL: with out_dim=16 on 12 points, squared distances stay within a
    # generous (0.4, 2.1) distortion band for this fixed seed — a sanity
    # property, not a tight bound (observed band 0.442..2.044)
    X = _vecs(12, seed=11)
    P = {
        r.vec_id: np.array(r.proj)
        for r in random_projection(_df(spark, X), 16, DIM, seed=1).collect()
    }
    for i in range(12):
        for j in range(i + 1, 12):
            d0 = np.sum((X[i] - X[j]) ** 2)
            d1 = np.sum((P[i] - P[j]) ** 2)
            assert 0.4 * d0 < d1 < 2.1 * d0, (i, j, d1 / d0)
