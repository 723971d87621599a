"""Streaming semantic dedup: one-batch equivalence with the batch
operator, cross-wave drops via the kept store, replay convergence,
pairwise-separation invariant, and cell-partition probe pruning."""

import glob
import os

import numpy as np
from pyspark.sql import functions as F

from llm_text_to_knowledge_graph_spark.operators.similarity import (
    cosine_col,
    semantic_dedup,
)
from llm_text_to_knowledge_graph_spark.streaming.semdedup import (
    _assign,
    _dup_ids,
    _store_path,
    incremental_semantic_dedup,
    read_kept_store,
    read_kept_vectors,
)

CENTS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.0, 1.0, 0.0, 0.0]),
    (2, [0.0, 0.0, 1.0, 0.0]),
]


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _unit(v):
    v = np.asarray(v, dtype=float)
    return [float(x) for x in v / np.linalg.norm(v)]


def test_one_batch_stream_equals_batch_operator(spark, tmp_path):
    rng = np.random.RandomState(3)
    rows = []
    for i in range(30):
        base = np.zeros(4)
        base[i % 3] = 1.0
        rows.append((i, _unit(base + rng.randn(4) * 0.25)))
    # planted near-dups inside the batch
    for j, src in enumerate([0, 1, 4]):
        rows.append((100 + j, _unit(np.array(rows[src][1]) + rng.randn(4) * 0.01)))
    df = _vecs(spark, rows)

    vec_dir = str(tmp_path / "vecs")
    out_root = str(tmp_path / "sem")
    df.write.parquet(vec_dir)
    incremental_semantic_dedup(
        spark, vec_dir, out_root, str(tmp_path / "ckpt"), CENTS, threshold=0.95
    ).awaitTermination(120)

    stream_kept = {
        r["vec_id"]: (r["cell"], r["centroid_sim"])
        for r in read_kept_vectors(spark, out_root).collect()
    }
    batch_kept = {
        r["vec_id"]: (r["cell"], r["centroid_sim"])
        for r in semantic_dedup(df, CENTS, threshold=0.95).collect()
        if r["keep"]
    }
    assert stream_kept == batch_kept


def test_cross_wave_drop_and_invariant(spark, tmp_path):
    vec_dir = str(tmp_path / "vecs")
    out_root = str(tmp_path / "sem")
    ckpt = str(tmp_path / "ckpt")

    # wave 1: one vector per cell
    _vecs(
        spark,
        [(0, _unit([1, 0.1, 0, 0])), (1, _unit([0, 1, 0.1, 0]))],
    ).write.mode("append").parquet(vec_dir)
    incremental_semantic_dedup(
        spark, vec_dir, out_root, ckpt, CENTS, threshold=0.95
    ).awaitTermination(120)
    assert read_kept_vectors(spark, out_root).count() == 2

    # wave 2: a near-dup of wave-1's survivor 0 + one genuinely new vector
    _vecs(
        spark,
        [(10, _unit([1, 0.11, 0.01, 0])), (11, _unit([0, 0, 1, 0.2]))],
    ).write.mode("append").parquet(vec_dir)
    incremental_semantic_dedup(
        spark, vec_dir, out_root, ckpt, CENTS, threshold=0.95
    ).awaitTermination(120)

    kept = read_kept_vectors(spark, out_root)
    assert sorted(r["vec_id"] for r in kept.collect()) == [0, 1, 11]

    # invariant: kept set pairwise < threshold within every cell
    a = kept.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"), "cell")
    b = kept.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"), "cell")
    viol = (
        a.join(b, "cell")
        .filter(F.col("ia") < F.col("ib"))
        .filter(F.round(cosine_col(F.col("va"), F.col("vb")), 6) >= 0.95)
    )
    assert viol.count() == 0

    # drained stream re-run appends nothing (streaming checkpoint)
    incremental_semantic_dedup(
        spark, vec_dir, out_root, ckpt, CENTS, threshold=0.95
    ).awaitTermination(120)
    assert read_kept_vectors(spark, out_root).count() == 3


def test_replayed_batch_converges(spark):
    """A replayed batch whose survivors are ALREADY in the store must not
    match itself (old != new guard): same survivors, not empty."""
    df = _vecs(spark, [(1, _unit([1, 0, 0, 0])), (2, _unit([0, 1, 0, 0]))])
    assigned = _assign(df, CENTS, "vec_id", "embedding")
    dups = _dup_ids(assigned, assigned, threshold=0.95)
    assert dups.count() == 0


def test_store_probe_prunes_cells(spark, tmp_path):
    """The per-batch store probe must read ONLY the batch's cell
    partitions: PartitionFilters in the plan, numFiles < store files."""
    vec_dir = str(tmp_path / "vecs")
    out_root = str(tmp_path / "sem")

    rng = np.random.RandomState(7)
    rows = []
    for i in range(30):
        base = np.zeros(4)
        base[i % 3] = 1.0
        rows.append((i, _unit(base + rng.randn(4) * 0.2)))
    _vecs(spark, rows).write.parquet(vec_dir)
    incremental_semantic_dedup(
        spark, vec_dir, out_root, str(tmp_path / "ckpt"), CENTS, threshold=0.99
    ).awaitTermination(120)

    store_files = glob.glob(
        os.path.join(_store_path(out_root), "**", "*.parquet"), recursive=True
    )
    cell_dirs = {p.split("cell=")[1].split(os.sep)[0] for p in store_files}
    assert len(cell_dirs) == 3  # the layout fans out across cells

    probe = read_kept_store(spark, out_root, cell_ids=[0])
    assert probe.count() > 0
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan

    leaves = probe._jdf.queryExecution().executedPlan().collectLeaves()
    num_files = None
    for i in range(leaves.length()):
        try:
            num_files = leaves.apply(i).metrics().apply("numFiles").value()
            break
        except Exception:
            continue
    assert num_files is not None and num_files < len(store_files)
