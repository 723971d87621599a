"""Streaming HLL == batch HLL, replay-idempotent, incrementally growing."""

import shutil

from pyspark.sql import functions as F

from llm_text_to_knowledge_graph_spark.operators.sketches import hll_distinct
from llm_text_to_knowledge_graph_spark.streaming.sketches import (
    incremental_hll,
    read_hll_distinct,
)

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _pages_df(spark, lo, hi):
    # urls with overlap across waves and per-lang groups; duplicates in-wave
    rows = [
        (f"u://{lang}/{i % 400}", None, None, "t", lang)
        for i in range(lo, hi)
        for lang in ("en", "de")
    ]
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def test_streaming_hll_matches_batch_and_grows(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "hll")
    ckpt = str(tmp_path / "ckpt")

    wave1 = _pages_df(spark, 0, 300)
    wave1.write.mode("append").parquet(pages_dir)
    incremental_hll(
        spark, pages_dir, out_dir, ckpt, group_cols=["lang"]
    ).awaitTermination(120)
    got1 = {
        r["lang"]: r["est_distinct"]
        for r in read_hll_distinct(spark, out_dir, ["lang"]).collect()
    }
    batch1 = {
        r["lang"]: r["est_distinct"]
        for r in hll_distinct(
            spark.read.parquet(pages_dir), "url", ["lang"]
        ).collect()
    }
    assert got1 == batch1  # streaming fold == batch sketch, exactly

    # wave 2 overlaps wave 1 (urls 0..399 mod): the MAX-merge must count
    # the union's distinct, not the sum of per-wave distincts
    _pages_df(spark, 300, 900).write.mode("append").parquet(pages_dir)
    incremental_hll(
        spark, pages_dir, out_dir, ckpt, group_cols=["lang"]
    ).awaitTermination(120)
    got2 = {
        r["lang"]: r["est_distinct"]
        for r in read_hll_distinct(spark, out_dir, ["lang"]).collect()
    }
    batch2 = {
        r["lang"]: r["est_distinct"]
        for r in hll_distinct(
            spark.read.parquet(pages_dir), "url", ["lang"]
        ).collect()
    }
    assert got2 == batch2
    for lang in ("en", "de"):
        assert got2[lang] >= got1[lang]  # monotone under union
        # true distinct is 400 per lang; HLL RSE ~6.5%
        assert abs(got2[lang] - 400) / 400 < 0.25

    # replay idempotence: wipe the CHECKPOINT (not the store) and rerun —
    # every batch replays into its identical partitions; the folded
    # estimate must not move
    shutil.rmtree(ckpt)
    incremental_hll(
        spark, pages_dir, out_dir, str(tmp_path / "ckpt2"), group_cols=["lang"]
    ).awaitTermination(120)
    got3 = {
        r["lang"]: r["est_distinct"]
        for r in read_hll_distinct(spark, out_dir, ["lang"]).collect()
    }
    assert got3 == got2


def test_compact_hll_store_preserves_answer(spark, tmp_path):
    from llm_text_to_knowledge_graph_spark.streaming.sketches import (
        compact_hll_store,
    )

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "hll")
    _pages_df(spark, 0, 250).write.mode("append").parquet(pages_dir)
    incremental_hll(
        spark, pages_dir, out_dir, str(tmp_path / "c1"), group_cols=["lang"]
    ).awaitTermination(120)
    _pages_df(spark, 250, 600).write.mode("append").parquet(pages_dir)
    incremental_hll(
        spark, pages_dir, out_dir, str(tmp_path / "c1"), group_cols=["lang"]
    ).awaitTermination(120)
    before = {
        r["lang"]: r["est_distinct"]
        for r in read_hll_distinct(spark, out_dir, ["lang"]).collect()
    }
    import glob

    files_before = len(glob.glob(f"{out_dir}/**/*.parquet", recursive=True))
    compact_hll_store(spark, out_dir, ["lang"])
    files_after = len(glob.glob(f"{out_dir}/**/*.parquet", recursive=True))
    after = {
        r["lang"]: r["est_distinct"]
        for r in read_hll_distinct(spark, out_dir, ["lang"]).collect()
    }
    assert after == before
    assert files_after < files_before
    # stream continues over a compacted store: new batches append their
    # own partitions and the fold still matches batch
    _pages_df(spark, 600, 800).write.mode("append").parquet(pages_dir)
    incremental_hll(
        spark, pages_dir, out_dir, str(tmp_path / "c1"), group_cols=["lang"]
    ).awaitTermination(120)
    got = {
        r["lang"]: r["est_distinct"]
        for r in read_hll_distinct(spark, out_dir, ["lang"]).collect()
    }
    batch = {
        r["lang"]: r["est_distinct"]
        for r in hll_distinct(
            spark.read.parquet(pages_dir), "url", ["lang"]
        ).collect()
    }
    assert got == batch
