"""Stream-stream interval join: streamed result == batch join, the
event-time bound excludes out-of-window rows, and left_outer emits
unmatched rows once the watermark closes their window."""

import datetime as dt

from pyspark.sql import functions as F

from llm_text_to_knowledge_graph_spark.streaming.joins import (
    interval_join_streams,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

PAGES_SCHEMA = "url string, warc_ts timestamp"
ANN_SCHEMA = "url string, ann_ts timestamp, quality double"


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


def _data(spark):
    pages = spark.createDataFrame(
        [
            ("u://a", _mins(0)),
            ("u://b", _mins(5)),
            ("u://c", _mins(10)),
            # late-window sentinel: pushes the final watermark far past
            # every other row so outer results all emit under availableNow
            ("u://zz", _mins(600)),
        ],
        PAGES_SCHEMA,
    )
    anns = spark.createDataFrame(
        [
            ("u://a", _mins(30), 0.9),   # in window (<= 60 min)
            ("u://a", _mins(90), 0.1),   # OUT: 90 > 0 + 60
            ("u://b", _mins(4), 0.5),    # OUT: before the page
            ("u://b", _mins(64), 0.7),   # in window (59 min after)
            ("u://zz", _mins(600), 1.0),
        ],
        ANN_SCHEMA,
    )
    return pages, anns


def _run_stream(spark, tmp_path, how):
    pages, anns = _data(spark)
    pdir, adir = str(tmp_path / "pages"), str(tmp_path / "anns")
    pages.write.parquet(pdir)
    anns.write.parquet(adir)
    lstream = spark.readStream.schema(PAGES_SCHEMA).parquet(pdir)
    rstream = spark.readStream.schema(ANN_SCHEMA).parquet(adir)
    out = interval_join_streams(
        lstream, rstream, max_delay="60 minutes", watermark="30 minutes",
        how=how,
    )
    name = f"sj_{how}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_interval_join_stream_matches_batch(spark, tmp_path):
    got = {
        (r["url"], r["ann_ts"], r["quality"])
        for r in _run_stream(spark, tmp_path, "inner").collect()
    }
    pages, anns = _data(spark)
    batch = {
        (r["url"], r["ann_ts"], r["quality"])
        for r in interval_join_streams(
            pages, anns, max_delay="60 minutes", watermark="30 minutes"
        ).collect()
    }
    assert got == batch
    assert got == {
        ("u://a", _mins(30), 0.9),
        ("u://b", _mins(64), 0.7),
        ("u://zz", _mins(600), 1.0),
    }


def test_interval_join_left_outer_emits_unmatched(spark, tmp_path):
    rows = _run_stream(spark, tmp_path, "left_outer").collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r)
    # matched rows identical to inner
    assert {(r["url"], r["quality"]) for r in by_url["u://a"]} == {("u://a", 0.9)}
    # u://c has no annotation: emitted once with null right columns after
    # the sentinel advanced the watermark past its window
    assert len(by_url["u://c"]) == 1
    assert by_url["u://c"][0]["quality"] is None
    assert by_url["u://c"][0]["ann_ts"] is None


def test_interval_join_batch_mode_projection(spark):
    # column contract: left cols, then right cols minus key; collision
    # handling via right_ prefix
    pages, anns = _data(spark)
    anns2 = anns.withColumn("warc_ts", F.col("ann_ts"))
    out = interval_join_streams(
        pages, anns2, max_delay="60 minutes", watermark="30 minutes"
    )
    assert out.columns == ["url", "warc_ts", "ann_ts", "quality", "right_warc_ts"]
