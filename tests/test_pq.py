"""Product quantization: encode parity vs an independent numpy
implementation, self-reconstruction exactness on codebook points, and ADC
top-k recall vs exact L2 on clustered data."""

import numpy as np

from llm_text_to_knowledge_graph_spark.operators.similarity import (
    brute_force_l2_topk,
    pq_codebooks,
    pq_encode,
    pq_topk,
)


def _np_codebooks_lowest_id(vecs_by_id, ksub, m):
    ids = sorted(vecs_by_id)[:ksub]
    dim = len(vecs_by_id[ids[0]])
    sd = dim // m
    return [
        [list(vecs_by_id[i][j * sd : (j + 1) * sd]) for i in ids]
        for j in range(m)
    ]


def _np_encode(v, books):
    sd = len(books[0][0])
    out = []
    for j, book in enumerate(books):
        sub = np.asarray(v[j * sd : (j + 1) * sd], dtype=np.float64)
        d = [round(float(np.sum((sub - np.asarray(c)) ** 2)), 9) for c in book]
        # ties -> lowest code id (np.argmin already takes the first min)
        out.append(int(np.argmin(d)))
    return out


def test_pq_encode_matches_numpy(spark):
    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq_codebooks(df, m=4, ksub=8, method="lowest_id")
    assert len(books) == 4 and len(books[0]) == 8 and len(books[0][0]) == 4
    by_id = {i: v for i, v in rows}
    assert books == _np_codebooks_lowest_id(by_id, ksub=8, m=4)
    got = {
        r["vec_id"]: list(r["codes"]) for r in pq_encode(df, books).collect()
    }
    for i, v in rows:
        assert got[i] == _np_encode(v, books), i


def test_pq_codebook_points_reconstruct_exactly(spark):
    # a vector whose every subvector IS a codebook entry encodes to itself,
    # and its ADC against any query equals the exact squared L2 — the
    # zero-quantization-error invariant that pins the ADC arithmetic
    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(12)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq_codebooks(df, m=3, ksub=6, method="lowest_id")
    codes = pq_encode(df, books)
    got = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    # ids 0..5 are the codebook source rows -> code j == their own slot
    for i in range(6):
        assert got[i] == [i, i, i], got[i]
    # ADC of a codebook-source neighbor == exact l2sq (same rounding)
    adc = {
        (r["query_id"], r["neighbor_id"]): r["adc"]
        for r in pq_topk(codes, books, df, query_ids=[20], k=39).collect()
    }
    exact = {
        (r["query_id"], r["neighbor_id"]): r["l2sq"]
        for r in brute_force_l2_topk(df, query_ids=[20], k=39).collect()
    }
    for i in range(6):
        assert abs(adc[(20, i)] - exact[(20, i)]) < 1e-6, i


def test_pq_topk_recall_clustered(spark):
    rng = np.random.RandomState(7)
    centers = rng.randn(5, 32) * 4
    rows = [
        (i, [float(x) for x in centers[i % 5] + rng.randn(32) * 0.3])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq_codebooks(df, m=8, ksub=16, method="kmeans", fit_sample=0.5)
    codes = pq_encode(df, books)
    qids = [0, 1, 2, 3, 4]
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_l2_topk(df, qids, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(codes, books, df, qids, k=10).collect()
    }
    # raw ADC is code-resolution-bound (8*4=32 bits/vector) on tight
    # clusters: top-10 within a sigma=0.3 cluster needs sub-code precision
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, recall
    # the production shape: ADC shortlist (codes-only scan) -> exact
    # re-rank of Q*R float rows. Recovers exact-search recall.
    refined = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(codes, books, df, qids, k=10, rerank=60).collect()
    }
    recall_r = len(exact & refined) / len(exact)
    assert recall_r >= 0.9, recall_r
