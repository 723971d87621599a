"""Streaming near-dup filter == batch dedup semantics.

The deterministic MinHash sketch (operators/dedup.py) is a pure function of
the text, so signatures written by earlier micro-batches band-join
correctly against later ones — the property pyspark.ml's model-bound
MinHashLSH lacks. These tests drive the stream in two waves and check the
cross-wave and within-wave drop behavior, plus replay convergence.
"""

from pyspark.sql import functions as F

from llm_text_to_knowledge_graph_spark.streaming.dedup import (
    incremental_dedup,
    read_deduped_docs,
    read_signature_store,
)

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, None, None, t, "en") for u, t in rows], PAGES_SCHEMA
    )


def test_incremental_dedup_two_waves(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_root = str(tmp_path / "dedup")
    ckpt = str(tmp_path / "ckpt")

    base = "alpha beta gamma delta epsilon zeta eta theta"
    near = "alpha beta gamma delta epsilon zeta eta iota"  # 7/9 jaccard
    other = "one two three four five six seven eight"

    # wave 1: two distinct docs + one exact in-wave dup of the first +
    # an HTML-MODE dup (text NULL, html <p> block extracting to the same
    # text) — the stream must sketch the EXTRACTED text, not skip
    # null-text pages (the pages corpus is mostly html-mode)
    html_dup = ("u://a3", None, f"<p>{base}</p>".encode(), None, "en")
    spark.createDataFrame(
        [("u://a", None, None, base, "en"),
         ("u://b", None, None, other, "en"),
         ("u://a2", None, None, base, "en"),
         html_dup],
        PAGES_SCHEMA,
    ).write.mode("append").parquet(pages_dir)
    incremental_dedup(spark, pages_dir, out_root, ckpt, bands=8).awaitTermination(120)

    docs1 = {r["url"]: r["text"] for r in read_deduped_docs(spark, out_root).collect()}
    # exactly one of the three base-content copies survives (min doc_id —
    # here the html-mode row, whose text column is NULL by construction)
    assert len(docs1) == 2
    assert other in docs1.values()
    assert set(docs1) == {"u://b", "u://a3"}

    # wave 2: a near-dup of wave-1's survivor + one genuinely new doc
    _pages(
        spark,
        [("u://c", near), ("u://d", "nine ten eleven twelve thirteen fourteen")],
    ).write.mode("append").parquet(pages_dir)
    incremental_dedup(spark, pages_dir, out_root, ckpt, bands=8).awaitTermination(120)

    docs2 = read_deduped_docs(spark, out_root)
    texts = {r["text"] for r in docs2.collect()}
    assert near not in texts  # cross-wave near-dup dropped via the store
    assert "nine ten eleven twelve thirteen fourteen" in texts
    assert docs2.count() == 3

    # the signature store holds exactly the survivors' banded rows
    store = read_signature_store(spark, out_root)
    assert store.select("id").distinct().count() == 3
    assert store.count() == 3 * 8  # bands=8 rows per survivor

    # drained stream re-run appends nothing (streaming checkpoint)
    incremental_dedup(spark, pages_dir, out_root, ckpt, bands=8).awaitTermination(120)
    assert read_deduped_docs(spark, out_root).count() == 3


def test_replayed_batch_converges(spark, tmp_path):
    """Replaying a batch whose signatures are ALREADY in the store must not
    let docs match themselves (the old_id != new_id guard): the partition
    rewrite converges to the same survivors, not to empty."""
    from llm_text_to_knowledge_graph_spark.streaming.dedup import (
        _dup_ids,
    )
    from llm_text_to_knowledge_graph_spark.operators.dedup import (
        minhash_det_banded,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "one two three four")],
        "doc_id long, text string",
    )
    banded = minhash_det_banded(docs)
    # simulate the replay: the store already holds this batch's signatures
    dups = _dup_ids(banded, banded, num_hashes=16, min_est=0.5)
    assert dups.count() == 0


def test_store_probe_prunes_buckets(spark, tmp_path):
    """The per-batch store probe must read ONLY the batch's sig_bucket
    partitions (VERDICT r2 #5). Asserted two ways: the scan plan carries a
    PartitionFilters clause on sig_bucket, and the executed scan's numFiles
    metric is strictly below the store's file count."""
    import glob
    import os

    from llm_text_to_knowledge_graph_spark.streaming.dedup import (
        SIG_BUCKETS,
        _bucket_col,
        _store_path,
        incremental_dedup,
    )

    pages_dir = str(tmp_path / "pages")
    out_root = str(tmp_path / "dedup")
    ckpt = str(tmp_path / "ckpt")

    # 40 distinct docs -> 40*bands banded keys spread over many buckets
    rows = [
        (f"u://{i}", None, None,
         f"w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f w{i}g w{i}h", "en")
        for i in range(40)
    ]
    spark.createDataFrame(rows, PAGES_SCHEMA).write.mode("append").parquet(
        pages_dir
    )
    incremental_dedup(spark, pages_dir, out_root, ckpt, bands=4).awaitTermination(120)

    store_files = glob.glob(
        os.path.join(_store_path(out_root), "**", "*.parquet"), recursive=True
    )
    bucket_dirs = {
        p.split("sig_bucket=")[1].split(os.sep)[0]
        for p in store_files
    }
    assert len(bucket_dirs) > 4  # the layout actually fans out

    # probe exactly one doc's buckets, the way process_batch does
    one = spark.createDataFrame(rows[:1], PAGES_SCHEMA).withColumn(
        "doc_id", F.xxhash64("url")
    )
    from llm_text_to_knowledge_graph_spark.operators.dedup import (
        minhash_det_banded,
    )

    banded = minhash_det_banded(one, bands=4, text_col="text").withColumn(
        "sig_bucket", _bucket_col(SIG_BUCKETS)
    )
    bucket_ids = sorted(
        r[0] for r in banded.select("sig_bucket").distinct().collect()
    )
    assert 0 < len(bucket_ids) <= 4

    probe = read_signature_store(spark, out_root, bucket_ids)
    rows_read = probe.collect()
    # semantic: the probe sees the target doc's own signatures
    target_id = one.select("doc_id").first()[0]
    assert any(r["id"] == target_id for r in rows_read)

    # plan: the partition filter reached the file index
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "sig_bucket" in plan

    # physical: strictly fewer files scanned than the store holds
    leaves = probe._jdf.queryExecution().executedPlan().collectLeaves()
    num_files = None
    for i in range(leaves.length()):
        leaf = leaves.apply(i)
        try:
            num_files = leaf.metrics().apply("numFiles").value()
            break
        except Exception:
            continue
    assert num_files is not None
    assert num_files < len(store_files)
    # and no more files than the probed buckets' own directories hold
    probed_files = [
        p for p in store_files
        if any(f"sig_bucket={b}{os.sep}" in p or p.endswith(f"sig_bucket={b}")
               or f"sig_bucket={b}/" in p for b in bucket_ids)
    ]
    assert num_files <= len(probed_files)
