"""IVF ANN: deterministic index, probe-limited search, recall vs exact."""

import numpy as np
from pyspark.sql import functions as F

from llm_text_to_knowledge_graph_spark.operators.similarity import (
    brute_force_topk,
    ivf_centroids,
    ivf_topk,
)


def _emb_df(spark, n=300, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    # 4 well-separated gaussian clusters so cells are meaningful
    centers = rng.randn(4, dim) * 4
    rows = []
    for i in range(n):
        v = centers[i % 4] + rng.randn(dim) * 0.5
        rows.append((i, [float(x) for x in v]))
    # planted near-duplicates of vectors 0..2 (the query ids)
    for j, qid in enumerate([0, 1, 2]):
        v = np.array(rows[qid][1]) + rng.randn(dim) * 1e-3
        rows.append((n + j, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_centroids_deterministic(spark):
    # lowest_id: fully deterministic independent of partitioning (the
    # SQL-oracle mode)
    emb = _emb_df(spark)
    a = ivf_centroids(emb, 8, method="lowest_id")
    b = ivf_centroids(emb.repartition(13), 8, method="lowest_id")
    assert a == b
    assert [c[0] for c in a] == list(range(8))


def test_ivf_kmeans_centroids_beat_lowest_id_on_clustered_data(spark):
    """KMeans centroids spread across the real clusters; lowest-id picks
    arbitrary vectors (here: 4 of one cluster's neighborhood per round-robin
    construction). Pin that the kmeans quantizer's cells are balanced."""
    from llm_text_to_knowledge_graph_spark.operators.similarity import ivf_index

    emb = _emb_df(spark, n=400)
    corpus_km, cents_km = ivf_index(emb, n_centroids=4, method="kmeans")
    sizes = [
        r["n"]
        for r in corpus_km.groupBy("cell").agg(F.count("*").alias("n")).collect()
    ]
    # 4 clusters, 4 centroids: every cell gets roughly a quarter
    assert len(sizes) == 4
    assert max(sizes) <= 2 * min(sizes), sizes


def test_ivf_kmeans_recall_vs_brute_force(spark):
    from llm_text_to_knowledge_graph_spark.operators.similarity import (
        ivf_index,
        ivf_topk_indexed,
    )

    emb = _emb_df(spark)
    k = 10
    exact = brute_force_topk(emb, [0, 1, 2], k=k)
    corpus, cents = ivf_index(emb, n_centroids=8, method="kmeans")
    approx = ivf_topk_indexed(corpus, cents, [0, 1, 2], k=k, nprobe=2)
    ex = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    ap = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.9, recall


def test_ivf_finds_planted_near_dups_and_overlaps_exact(spark):
    emb = _emb_df(spark)
    k = 10
    exact = brute_force_topk(emb, [0, 1, 2], k=k)
    approx = ivf_topk(emb, [0, 1, 2], k=k, n_centroids=8, nprobe=2)
    ex = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    ap = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    # planted near-dup is every query's top hit in both
    for j, qid in enumerate([0, 1, 2]):
        assert (qid, 300 + j) in ap
    # recall@10 of the probe-limited search on clustered data
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.8, recall


def test_ivf_results_ranked_and_bounded(spark):
    emb = _emb_df(spark)
    out = ivf_topk(emb, [0, 1], k=5, n_centroids=8, nprobe=1).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert len(rows) <= 5
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines, reverse=True)


def test_ivf_assignment_is_shuffle_free(spark):
    emb = _emb_df(spark)
    cents = ivf_centroids(emb, 8)
    from llm_text_to_knowledge_graph_spark.operators.similarity import _nearest_cells

    plan = (
        emb.withColumn("cell", _nearest_cells(F.col("embedding"), cents, 1)[0])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_cell_assignment_plan_parity_across_k_cutoff(spark):
    """nearest_cells_col switches plans at _LITERAL_K_MAX=64 (literal
    codegen vs Arrow/BLAS). IVF results must be invariant to that cutoff:
    both paths round cosines to 9 digits, then break ties cid-ascending —
    including exact ties from duplicated centroids."""
    from llm_text_to_knowledge_graph_spark.operators.similarity import (
        _nearest_cells,
        _nearest_cells_pandas,
    )

    emb = _emb_df(spark, n=120)
    for k in (63, 65):
        cents = ivf_centroids(emb, 8, method="lowest_id")
        # pad the centroid list past/below the cutoff with duplicates of the
        # first two centroids under new ids — guaranteed exact cosine ties
        cents = cents + [(100 + i, cents[i % 2][1]) for i in range(k - len(cents))]
        lit = emb.withColumn(
            "cells", _nearest_cells(F.col("embedding"), cents, 3)
        ).select("vec_id", "cells")
        pdp = emb.withColumn(
            "cells", _nearest_cells_pandas(F.col("embedding"), cents, 3)
        ).select("vec_id", "cells")
        a = {r.vec_id: list(r.cells) for r in lit.collect()}
        b = {r.vec_id: list(r.cells) for r in pdp.collect()}
        assert a == b, f"k={k}: plan-dependent assignment"


def test_ivf_sampled_fit_recall_parity(spark):
    """Quantizer fit on a deterministic 30% hash-sample (the production
    build: FAISS-style bounded training set) must match the FULL-corpus
    fit's recall — K centroids need O(K) statistics, not the corpus.
    Parity, not an absolute bound: on this 4-blob corpus a few exact
    cosine neighbors are cross-cluster for BOTH fits (measured 26/30
    either way), so an absolute threshold would test the data, not the
    sampling."""
    from llm_text_to_knowledge_graph_spark.operators.similarity import (
        ivf_index,
        ivf_topk_indexed,
    )

    emb = _emb_df(spark, n=400)
    k = 10
    ex = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, [0, 1, 2], k=k).collect()
    }

    def recall(fit_sample):
        corpus, cents = ivf_index(
            emb, n_centroids=4, method="kmeans", fit_sample=fit_sample
        )
        ap = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk_indexed(corpus, cents, [0, 1, 2], k=k, nprobe=2).collect()
        }
        return len(ex & ap) / len(ex)

    r_full, r_sampled = recall(None), recall(0.3)
    assert r_sampled >= r_full
    assert r_sampled >= 0.8
    # the sampled fit is a pure function of (id, seed): identical cell
    # ids regardless of partitioning
    _, cents_a = ivf_index(emb, n_centroids=4, method="kmeans", fit_sample=0.3)
    _, cents_b = ivf_index(
        emb.repartition(7), n_centroids=4, method="kmeans", fit_sample=0.3
    )
    assert [c[0] for c in cents_a] == [c[0] for c in cents_b]
