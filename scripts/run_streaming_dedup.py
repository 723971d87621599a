"""spark-submit driver for the streaming dedup modes.

Drives either incremental dedup over a landing directory of page files:

  * ``--mode near`` (default): MinHash near-dup filter
    (streaming/dedup.py) — survivors + their banded signature store accrue
    under --workdir; re-running picks up only newly landed files.
  * ``--mode exact``: applyInPandasWithState exact dedup
    (streaming/stateful.py) — first-seen page per md5(text) is emitted,
    state survives restarts via the checkpoint.

Example (generates two waves of synthetic pages, drains each):

  spark-submit --py-files /tmp/kgspark.zip scripts/run_streaming_dedup.py \\
      --gen-docs 100 --workdir /tmp/kg_stream_dedup
  spark-submit --py-files /tmp/kgspark.zip scripts/run_streaming_dedup.py \\
      --gen-docs 160 --workdir /tmp/kg_stream_dedup   # wave 2: docs 100-159
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--mode", choices=["near", "exact"], default="near")
    ap.add_argument("--pages-dir", default=None,
                    help="landing dir of page parquet files (default <workdir>/pages)")
    ap.add_argument("--gen-docs", type=int, default=0,
                    help="extend the synthetic corpus in --pages-dir to this many docs")
    ap.add_argument("--min-est", type=float, default=0.5)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--ngram", type=int, default=3,
                    help="shingle width; unigrams over-collapse templated text")
    args = ap.parse_args()

    from llm_text_to_knowledge_graph_spark import get_spark

    spark = get_spark("kg-stream-dedup")
    pages_dir = args.pages_dir or os.path.join(args.workdir, "pages")

    if args.gen_docs:
        from llm_text_to_knowledge_graph_spark.corpus import pages_df

        have = 0
        if os.path.exists(pages_dir):
            have_urls = spark.read.parquet(pages_dir).select("url").distinct().count()
            have = have_urls
        if args.gen_docs > have:
            allp = pages_df(spark, args.gen_docs, seed=42)
            w = allp  # full corpus; land only the not-yet-landed tail
            if have:
                seen = spark.read.parquet(pages_dir).select("url").distinct()
                w = allp.join(seen, "url", "left_anti")
            w.write.mode("append").parquet(pages_dir)
            print(f"landed wave: corpus now {args.gen_docs} docs")

    ckpt = os.path.join(args.workdir, f"ckpt_{args.mode}")
    out_root = os.path.join(args.workdir, f"out_{args.mode}")

    if args.mode == "near":
        from llm_text_to_knowledge_graph_spark.streaming.dedup import (
            incremental_dedup,
            read_deduped_docs,
            read_signature_store,
        )

        incremental_dedup(
            spark, pages_dir, out_root, ckpt,
            n=args.ngram, bands=args.bands, min_est=args.min_est,
        ).awaitTermination()
        docs = read_deduped_docs(spark, out_root)
        print(f"survivors: {docs.count()} docs; "
              f"signature store: {read_signature_store(spark, out_root).count()} banded rows")
        docs.select("url", "lang").show(5, truncate=60)
    else:
        from llm_text_to_knowledge_graph_spark.streaming.stateful import (
            run_streaming_dedup,
        )

        q = run_streaming_dedup(spark, pages_dir, out_root, ckpt)
        q.awaitTermination()
        n = spark.read.parquet(out_root).count()
        print(f"unique pages emitted: {n}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
