"""Incremental (streaming) semantic dedup — the online form of
``operators/similarity.py::semantic_dedup`` (SemDeDup, Abbas et al. 2023).

Why this works incrementally: the coarse-quantizer centroids are FROZEN
literals (fit once offline, same fit/score split as the IVF index, the
bigram LM, and the BPE merges), so tonight's micro-batch assigns to the
SAME cells as last month's corpus without refitting anything. The kept
store is just a parquet table of (vec_id, v, cell) — no model object, the
same engine-portability property the deterministic MinHash store has over
pyspark.ml's MinHashLSH.

Per micro-batch of newly landed vectors:

  1. assign cells map-only (literal-centroid codegen / Arrow BLAS —
     identical plan to the batch operator)
  2. within-batch SemDeDup ordering (centroid-sim ASC, id ASC — the batch
     operator's diversity rule, so a one-batch stream EQUALS the batch
     operator row-for-row; pinned by test)
  3. cosine-probe the ACCUMULATED kept store, pruned to the batch's own
     ``cell`` partitions — new vectors within ``threshold`` of any earlier
     survivor are dropped (arrival order replaces centroid-sim order
     ACROSS batches: an online pass cannot reorder history)
  4. append only the survivors, idempotent per-batch partition overwrite
     (replayed batches converge; the ``old != new`` guard keeps a replayed
     vector from matching its own half-written store row)

Invariant (holds for the batch operator too, and is pinned here): the kept
set is pairwise < threshold within every cell — if two kept vectors were
within threshold, whichever ranked later would have been dropped.

Store layout at 100 TB: partitioned by ``cell`` (the direct analog of the
signature store's ``sig_bucket``), so the per-batch probe reads ONLY the
batch's cells — a small batch touches few of the K cell directories of a
multi-TB store; the cell list per batch is <= K integers (one tiny
driver-side collect, metrics-scalar class). Iceberg production equivalent:
``PARTITIONED BY (cell)`` + partition pruning. Cell sizes are bounded by
the quantizer (pick K so cells are ~10⁴-10⁵ vectors), which also bounds
the per-batch probe join to |batch| × |cell| comparisons.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import cosine_col, nearest_cells_col
from .incremental import _write_batch_idempotent

KEPT_SCHEMA = "vec_id long, v array<double>, cell int, centroid_sim double"


def _store_path(out_root: str) -> str:
    return f"{out_root}/kept"


def stream_vectors(
    spark: SparkSession,
    vec_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_files: int = 64,
) -> DataFrame:
    """File-source stream of newly landed embedding files."""
    schema = f"{id_col} long, {vec_col} array<double>"
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(vec_dir)
    )


def read_kept_store(
    spark: SparkSession, out_root: str, cell_ids: list[int] | None = None
) -> DataFrame:
    """Accumulated kept vectors (empty-safe). ``cell_ids`` prunes the read
    to those ``cell`` partitions — the filter reaches the file index, so
    only those directories are listed and read (the 100-TB probe path)."""
    path = _store_path(out_root)
    if not os.path.exists(path):
        return spark.createDataFrame([], KEPT_SCHEMA)
    df = spark.read.parquet(path)
    if cell_ids is not None:
        df = df.filter(F.col("cell").isin([int(c) for c in cell_ids]))
    # parquet partition columns come back as the partition's read type;
    # normalize so unions/joins against KEPT_SCHEMA line up
    return df.select(
        F.col("vec_id").cast("long"),
        "v",
        F.col("cell").cast("int"),
        "centroid_sim",
    )


def _assign(
    batch_df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(vec_id, v, cell, centroid_sim) — identical math to the batch
    operator: round-9 centroid cosine, cid-asc ties."""
    vec = F.col(vec_col).cast("array<double>")
    cids_lit = F.array(*[F.lit(int(cid)) for cid, _ in centroids])
    cvecs_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in cvec]) for _, cvec in centroids]
    )
    assigned = batch_df.select(
        F.col(id_col).cast("long").alias("vec_id"),
        vec.alias("v"),
        nearest_cells_col(vec, centroids, 1)[0].cast("int").alias("cell"),
    )
    pos = F.array_position(cids_lit, F.col("cell")).cast("int")
    return assigned.withColumn(
        "centroid_sim",
        F.round(cosine_col(F.col("v"), F.element_at(cvecs_lit, pos)), 9),
    )


def _dup_ids(
    new_assigned: DataFrame,
    store: DataFrame,
    threshold: float,
    round_digits: int = 6,
) -> DataFrame:
    """Ids in ``new_assigned`` within ``threshold`` of any stored survivor
    (arrival order) or of an earlier-ranked batch mate (SemDeDup order).
    One distinct ``vec_id`` column."""
    n = new_assigned.select(
        F.col("vec_id").alias("new_id"), F.col("v").alias("new_v"),
        "cell", F.col("centroid_sim").alias("new_cs"),
    )
    close = (
        F.round(cosine_col(F.col("new_v"), F.col("old_v")), round_digits)
        >= F.lit(threshold)
    )
    # old != new: on a foreachBatch REPLAY the store may already hold this
    # very batch's partially-written survivors — without the guard every
    # replayed vector matches itself at cos=1.0 and the idempotent
    # overwrite would converge to an EMPTY partition instead of the same one
    vs_store = (
        n.join(
            store.select(
                "cell",
                F.col("vec_id").alias("old_id"), F.col("v").alias("old_v"),
            ),
            "cell",
        )
        .filter(F.col("old_id") != F.col("new_id"))
        .filter(close)
        .select("new_id")
    )
    o = new_assigned.select(
        F.col("vec_id").alias("old_id"), F.col("v").alias("old_v"),
        "cell", F.col("centroid_sim").alias("old_cs"),
    )
    earlier = (F.col("old_cs") < F.col("new_cs")) | (
        (F.col("old_cs") == F.col("new_cs")) & (F.col("old_id") < F.col("new_id"))
    )
    vs_batch = n.join(o, "cell").filter(earlier).filter(close).select("new_id")
    return vs_store.union(vs_batch).distinct()


def incremental_semantic_dedup(
    spark: SparkSession,
    vec_dir: str,
    out_root: str,
    checkpoint_dir: str,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    available_now: bool = True,
):
    """Streaming semantic-dup filter: new embedding files -> surviving
    vectors appended to ``{out_root}/kept`` partitioned by cell. Returns
    the started query."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        assigned = _assign(batch_df, centroids, id_col, vec_col).persist()
        try:
            # the batch's cell footprint (<= K ints) prunes the store probe
            # to the directories that can possibly match
            cell_ids = sorted(
                r[0] for r in assigned.select("cell").distinct().collect()
            )
            store = read_kept_store(spark, out_root, cell_ids)
            dups = _dup_ids(assigned, store, threshold)
            survivors = assigned.join(
                dups.withColumnRenamed("new_id", "vec_id"), "vec_id", "left_anti"
            )
            _write_batch_idempotent(
                survivors, _store_path(out_root), batch_id, sub_partition="cell"
            )
        finally:
            assigned.unpersist()

    writer = (
        stream_vectors(spark, vec_dir, id_col, vec_col)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_kept_vectors(spark: SparkSession, out_root: str) -> DataFrame:
    """Surviving vectors across all processed batches."""
    return read_kept_store(spark, out_root)
