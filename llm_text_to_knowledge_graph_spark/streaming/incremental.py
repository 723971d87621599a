"""Incremental (Structured Streaming) mode.

The reference is batch-only; its per-stage JSON checkpoint chain
(main.py:55-98) is the closest analog to incremental processing. At scale
the natural incremental shape is: new page files land in the corpus
directory -> a file-source stream picks them up -> the SAME extraction
logic (fused operator) runs per micro-batch -> triples append to the
triples table; Spark's streaming checkpoint gives exactly-once file
processing, and the warc_ts watermark bounds the stateful aggregation
example (per-hour page counts with late-data tolerance).

foreachBatch reuses the batch operators verbatim — one code path for both
modes (SURVEY.md §7 M5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.fused import extract_triples_fused
from ..schemas import PAGES


def stream_pages(spark: SparkSession, pages_dir: str, max_files: int = 64) -> DataFrame:
    """File-source stream of newly landed page files."""
    return (
        spark.readStream.schema(PAGES)
        .option("maxFilesPerTrigger", max_files)
        .parquet(pages_dir)
    )


def incremental_triples(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    alias_rows: list,
    available_now: bool = True,
):
    """Run extraction incrementally: each micro-batch of new pages ->
    fused extraction -> append to the triples table. Returns the query."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        triples = extract_triples_fused(batch_df, alias_rows)
        triples.write.mode("append").parquet(out_dir)

    writer = (
        stream_pages(spark, pages_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def hourly_page_counts(
    spark: SparkSession,
    pages_dir: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked windowed aggregation: pages per (lang, 1h warc_ts window)
    tolerating late arrivals up to the watermark."""
    return (
        stream_pages(spark, pages_dir)
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), F.col("lang"))
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
        )
    )


def incremental_graph(
    spark: SparkSession,
    pages_dir: str,
    out_root: str,
    checkpoint_dir: str,
    alias_rows: list,
    available_now: bool = True,
):
    """Incremental graph construction: each micro-batch of new pages appends
    hash-id edges and (batch-distinct) nodes.

    Content-addressed ids (operators/graph.py::node_id_col) are what makes
    this possible: a node's id is a pure function of its name, so two
    micro-batches — or a micro-batch and a historical backfill — assign the
    SAME id to the same entity with no coordination, no global counter, no
    id-lookup join. Dense 0..n-1 ids fundamentally cannot do this.
    Cross-batch duplicate node rows are benign (identical bytes); read the
    node table through ``read_incremental_nodes`` (Iceberg MERGE INTO is the
    at-scale equivalent of that dedup)."""
    from ..operators.graph import build_edges, build_nodes

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        t = extract_triples_fused(batch_df, alias_rows)
        build_edges(t, id_strategy="hash").write.mode("append").parquet(
            f"{out_root}/edges"
        )
        build_nodes(t, id_strategy="hash").write.mode("append").parquet(
            f"{out_root}/nodes"
        )

    writer = (
        stream_pages(spark, pages_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_incremental_nodes(spark: SparkSession, out_root: str) -> DataFrame:
    """Deduplicated view of the incrementally-appended node table. Rows for
    one name are byte-identical across batches, so any-row-per-id wins."""
    return spark.read.parquet(f"{out_root}/nodes").dropDuplicates(["node_id"])
