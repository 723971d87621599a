"""int8 embedding quantization: exact numpy parity, reconstruction-error
bound, and top-k recall vs float32 brute force."""

import numpy as np

from llm_text_to_knowledge_graph_spark.operators.similarity import (
    brute_force_topk,
    ivf_index,
    ivf_topk_indexed,
    ivf_topk_quantized,
    quantize_int8,
    quantized_topk,
)


def _py_quant(v):
    v = np.asarray(v, dtype=np.float64)
    amax = float(np.max(np.abs(v))) if len(v) else 0.0
    scale = amax / 127.0 if amax > 0 else 1.0
    # HALF_UP (away from zero), matching Spark's ROUND — np.round is
    # banker's and would disagree on exact .5
    q = np.sign(v) * np.floor(np.abs(v) / scale + 0.5)
    return [int(x) for x in q], scale


def test_quantize_matches_numpy_reference(spark):
    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.randn(16) * (i + 1)]) for i in range(20)]
    rows.append((99, [0.0] * 16))  # all-zero: scale 1, exact zeros
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (list(r["qvec"]), r["scale"])
        for r in quantize_int8(df).collect()
    }
    for vid, v in rows:
        q, s = _py_quant(v)
        assert got[vid][0] == q, vid
        assert abs(got[vid][1] - s) < 1e-12, vid
        # reconstruction error bound: scale/2 per component
        rec = np.array(got[vid][0]) * got[vid][1]
        assert np.max(np.abs(rec - np.array(v))) <= s / 2 + 1e-12
        assert all(-127 <= x <= 127 for x in got[vid][0])


def test_quantized_topk_recall(spark):
    # clustered vectors: int8 must preserve neighbor ranks almost always
    rng = np.random.RandomState(4)
    centers = rng.randn(5, 32) * 3
    rows = [
        (i, [float(x) for x in centers[i % 5] + rng.randn(32) * 0.4])
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = [0, 1, 2, 3]
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(df, queries, k=10).collect()
    }
    quant = {
        (r["query_id"], r["neighbor_id"])
        for r in quantized_topk(quantize_int8(df), queries, k=10).collect()
    }
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.9, recall


def test_ivf_quantized_matches_float_ivf(spark):
    # IVF-SQ8: same index probed over the int8 corpus must agree with the
    # float IVF probe almost everywhere (quantization perturbs assignment
    # and ranks by <= scale/2 per component)
    rng = np.random.RandomState(7)
    centers = rng.randn(4, 32) * 3
    rows = [
        (i, [float(x) for x in centers[i % 4] + rng.randn(32) * 0.4])
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    corpus, cents = ivf_index(df, n_centroids=4, method="lowest_id")
    queries = [0, 1, 2, 3]
    flt = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk_indexed(corpus, cents, queries, k=10, nprobe=2).collect()
    }
    corpus_q = quantize_int8(corpus, extra_cols=("cell",))
    assert corpus_q.columns == ["vec_id", "qvec", "scale", "cell"]
    qnt = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk_quantized(corpus_q, cents, queries, k=10, nprobe=2).collect()
    }
    overlap = len(flt & qnt) / len(flt)
    assert overlap >= 0.9, overlap
