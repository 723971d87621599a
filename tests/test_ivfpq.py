"""IVF-PQ composition: assignment/encode parity vs an independent numpy
implementation, the exact-ADC invariant on codebook-representable
residuals, cell pruning actually bounding the scan, and rerank recall
vs exact L2 on clustered data."""

import numpy as np

from llm_text_to_knowledge_graph_spark.operators.similarity import (
    brute_force_l2_topk,
    ivf_pq_index,
    ivf_pq_topk,
)


def _np_index_lowest_id(vecs_by_id, n_cells, m, ksub):
    """Independent reference: lowest-id centroids, residual codebooks from
    the ksub lowest-id residuals, argmin-L2 everywhere (round-9 ties,
    slot-asc)."""
    ids = sorted(vecs_by_id)
    cents = np.asarray([vecs_by_id[i] for i in ids[:n_cells]], dtype=np.float64)
    dim = cents.shape[1]
    sd = dim // m

    def cell_of(v):
        d = np.round(((cents - np.asarray(v)) ** 2).sum(axis=1), 9)
        return int(np.argmin(d))  # first min = lowest slot

    resid = {i: np.asarray(vecs_by_id[i]) - cents[cell_of(vecs_by_id[i])] for i in ids}
    books = [
        np.asarray([resid[i][j * sd : (j + 1) * sd] for i in ids[:ksub]])
        for j in range(m)
    ]

    def encode(i):
        out = []
        for j in range(m):
            sub = resid[i][j * sd : (j + 1) * sd]
            d = np.round(((books[j] - sub) ** 2).sum(axis=1), 9)
            out.append(int(np.argmin(d)))
        return out

    return cents, books, {i: (cell_of(vecs_by_id[i]), encode(i)) for i in ids}


def test_ivfpq_lowest_id_parity_with_numpy(spark):
    rng = np.random.RandomState(19)
    rows = [(i, [float(x) for x in rng.randn(24)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    codes, cents, books = ivf_pq_index(
        df, n_cells=4, m=4, ksub=8, method="lowest_id"
    )
    by_id = {i: v for i, v in rows}
    ncents, nbooks, nenc = _np_index_lowest_id(by_id, n_cells=4, m=4, ksub=8)
    assert np.allclose(np.asarray(cents), ncents)
    for j in range(4):
        assert np.allclose(np.asarray(books[j]), nbooks[j]), j
    got = {
        r["vec_id"]: (r["cell"], list(r["codes"])) for r in codes.collect()
    }
    for i in by_id:
        assert got[i] == nenc[i], (i, got[i], nenc[i])


def test_ivfpq_codebook_residuals_reconstruct_exactly(spark):
    # rows whose residual IS a codebook entry decode exactly, so their ADC
    # against any query (with the row's cell probed) equals the exact
    # squared L2 — the invariant that pins the residual-ADC arithmetic
    rng = np.random.RandomState(5)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    codes, cents, books = ivf_pq_index(
        df, n_cells=3, m=4, ksub=8, method="lowest_id"
    )
    qid = 30
    adc = {
        (r["query_id"], r["neighbor_id"]): r["adc"]
        for r in ivf_pq_topk(
            codes, cents, books, df, query_ids=[qid], k=49, nprobe=3
        ).collect()
    }
    exact = {
        (r["query_id"], r["neighbor_id"]): r["l2sq"]
        for r in brute_force_l2_topk(df, query_ids=[qid], k=49).collect()
    }
    # ids 0..7 are the codebook-source rows (ids 0..2 doubling as the
    # centroids: zero residual = entry of slot<=2's zero tie class)
    for i in range(8):
        assert abs(adc[(qid, i)] - exact[(qid, i)]) < 1e-6, i


def test_ivfpq_probe_prunes_scan(spark):
    # with nprobe=1 only the probed cell's rows can appear
    rng = np.random.RandomState(23)
    centers = rng.randn(4, 16) * 10
    rows = [
        (i, [float(x) for x in centers[i % 4] + rng.randn(16) * 0.2])
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    codes, cents, books = ivf_pq_index(
        df, n_cells=4, m=4, ksub=8, method="kmeans", fit_sample=0.5
    )
    cell_of = {r["vec_id"]: r["cell"] for r in codes.collect()}
    out = ivf_pq_topk(codes, cents, books, df, query_ids=[0], k=100, nprobe=1)
    got = [r["neighbor_id"] for r in out.collect()]
    assert got, "probe returned nothing"
    assert {cell_of[n] for n in got} == {cell_of[0]}


def test_ivfpq_rerank_recall_clustered(spark):
    rng = np.random.RandomState(7)
    centers = rng.randn(6, 32) * 4
    rows = [
        (i, [float(x) for x in centers[i % 6] + rng.randn(32) * 0.3])
        for i in range(240)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    codes, cents, books = ivf_pq_index(
        df, n_cells=6, m=8, ksub=16, method="kmeans", fit_sample=0.5
    )
    qids = [0, 1, 2, 3, 4]
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_l2_topk(df, qids, k=10).collect()
    }
    raw = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_pq_topk(codes, cents, books, df, qids, k=10, nprobe=2).collect()
    }
    # residual encoding resolves finer than flat PQ at the same bit budget:
    # raw ADC should already rank most of the true top-10 into place
    recall_raw = len(exact & raw) / len(exact)
    assert recall_raw >= 0.5, recall_raw
    refined = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_pq_topk(
            codes, cents, books, df, qids, k=10, nprobe=2, rerank=60
        ).collect()
    }
    recall = len(exact & refined) / len(exact)
    assert recall >= 0.9, recall
