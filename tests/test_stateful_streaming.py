"""applyInPandasWithState cross-batch dedup: state survives micro-batches
and restarts (streaming checkpoint)."""

import datetime as dt

from llm_text_to_knowledge_graph_spark.schemas import PAGES
from llm_text_to_knowledge_graph_spark.streaming.stateful import run_streaming_dedup


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1), None, t, "en") for u, t in rows], schema=PAGES
    )


def test_streaming_dedup_across_batches(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "dedup")
    ckpt = str(tmp_path / "ckpt")

    _pages(
        spark,
        [
            ("u://a", "alpha text body one"),
            ("u://b", "beta text body two"),
            ("u://c", "alpha text body one"),  # dup of a, same batch
        ],
    ).write.mode("append").parquet(pages_dir)
    q = run_streaming_dedup(spark, pages_dir, out_dir, ckpt)
    q.awaitTermination(120)

    out1 = spark.read.parquet(out_dir).collect()
    assert {r["url"] for r in out1} == {"u://a", "u://b"}

    # batch 2 (separate query restart, same checkpoint): one dup of batch 1,
    # one genuinely new text
    _pages(
        spark,
        [
            ("u://d", "alpha text body one"),   # dup across batches -> dropped
            ("u://e", "gamma text body three"),
        ],
    ).write.mode("append").parquet(pages_dir)
    q = run_streaming_dedup(spark, pages_dir, out_dir, ckpt)
    q.awaitTermination(120)

    out2 = spark.read.parquet(out_dir).collect()
    assert {r["url"] for r in out2} == {"u://a", "u://b", "u://e"}
