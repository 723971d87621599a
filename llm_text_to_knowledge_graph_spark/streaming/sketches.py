"""Incrementally maintained HLL distinct counts over the page stream.

The operational question ("how many DISTINCT urls/domains/tokens has this
crawl seen so far, per group?") has to be answerable while the crawl is
still landing — an exact streaming DISTINCT means unbounded state, and a
nightly batch recount means re-scanning everything ingested so far. The
HLL register table (operators/sketches.py) makes the incremental answer a
bit of arithmetic: registers merge by MAX, which is associative AND
idempotent, so per-batch register tables fold into the running answer in
any order, any number of times.

Exactly-once story — chosen to need NO read-modify-write: each micro-batch
writes ITS OWN registers into its ``batch_id=<id>`` partition (dynamic
partition overwrite, same convergence contract as the triples/dedup
sinks: a replayed batch rewrites the identical partition). The read side
folds all batch partitions with one groupBy(...).max(m) over sketch-sized
rows (<= 256 * n_groups per batch) and estimates. A read-modify-write
store would double-count nothing either (MAX is idempotent) — but it
would serialize batches; the per-batch layout keeps the sink append-only
and lets compaction (rewriting the folded registers) happen lazily, the
Iceberg-rewrite way.

At 10^12 documents the register traffic per batch is KBs — the stream's
state cost is independent of both corpus and key cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import hll_estimate, hll_registers
from .incremental import _write_batch_idempotent, stream_pages


def incremental_hll(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str = "url",
    group_cols: list[str] | None = None,
    available_now: bool = True,
):
    """Maintain per-group HLL registers over a file-source page stream.

    Each micro-batch contributes its registers to its own ``batch_id``
    partition; :func:`read_hll_distinct` folds them. Returns the query."""
    group_cols = list(group_cols or [])

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        regs = hll_registers(batch_df, key_col, group_cols)
        _write_batch_idempotent(regs, out_dir, batch_id)

    writer = (
        stream_pages(spark, pages_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_hll_registers(
    spark: SparkSession, out_dir: str, group_cols: list[str] | None = None
) -> DataFrame:
    """The folded register table: MAX-merge across all batch partitions
    (associative + idempotent, so replayed or compacted partitions cannot
    change the answer)."""
    group_cols = list(group_cols or [])
    return (
        spark.read.parquet(out_dir)
        .groupBy(*group_cols, "register")
        .agg(F.max("m").alias("m"))
    )


def read_hll_distinct(
    spark: SparkSession, out_dir: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Current distinct estimate per group from the accumulated store."""
    group_cols = list(group_cols or [])
    return hll_estimate(read_hll_registers(spark, out_dir, group_cols), group_cols)


def compact_hll_store(spark: SparkSession, out_dir: str, group_cols: list[str] | None = None) -> None:
    """Rewrite the per-batch register partitions as ONE folded partition
    (``batch_id=-1``) — the lazy maintenance pass that keeps an old store's
    file count proportional to groups, not to micro-batches. Safe at any
    time because the fold is the same MAX the readers apply: compacting
    and then folding again returns the identical registers (idempotent),
    and a crash between write and cleanup only leaves extra partitions
    whose re-fold cannot change the answer.

    Write-then-swap: the folded table lands in a sibling directory and
    replaces the store with an atomic rename, so concurrent readers see
    either the old layout or the new one — never a partial mix."""
    import os
    import shutil

    group_cols = list(group_cols or [])
    folded = read_hll_registers(spark, out_dir, group_cols)
    tmp = out_dir.rstrip("/") + ".compact-tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        folded.withColumn("batch_id", F.lit(-1))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(tmp)
    )
    old = out_dir.rstrip("/") + ".compact-old"
    shutil.rmtree(old, ignore_errors=True)
    os.replace(out_dir, old)
    os.replace(tmp, out_dir)
    shutil.rmtree(old, ignore_errors=True)
