"""Benchmark harness — one JSON line on stdout.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. The KG pipeline runs on
the deterministic synthetic page corpus sized to the scale factor (the
driver's documents table has no planted relations, so pipeline throughput
is measured on the corpus the extraction semantics target).

Output: {"metric": "total_bench_sec", "value": N, "unit": "sec",
         "queries": {name: sec, ...}, "sf": X,
         "kg_triples_per_sec": ..., "kg_pages_per_sec": ...}

NOTE on cross-round totals: the query set GROWS each round (round 2 added
minhash_pairs_det, simhash_pairs_native, ivf_index_build, ann_brute_32q,
ann_ivf_32q, eval_match_statements vs round 1), so compare per-query
timings across rounds, not the total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from llm_text_to_knowledge_graph_spark import get_spark  # noqa: E402
from llm_text_to_knowledge_graph_spark.corpus import build_alias_rows, pages_df  # noqa: E402
from llm_text_to_knowledge_graph_spark.plans.pipeline import run_pipeline  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# synthetic corpus size scales with the sf dir (sf0.1 -> 3000 pages)
_SF_GUESS = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
N_DOCS = max(200, int(30000 * _SF_GUESS))


def main() -> int:
    from llm_text_to_knowledge_graph_spark.operators.fused import extract_triples_fused

    spark = get_spark(
        "kg-bench", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 16)
    )
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # --- warmup (untimed): spin up Python workers for every UDF eval node ---
    # cold-start of the Arrow worker pool costs tens of seconds on a fresh
    # JVM and amortizes to zero at scale; the bench measures steady state.
    alias_rows = build_alias_rows()
    wpages = pages_df(spark, 40, seed=1, partitions=8)
    run_pipeline(spark, wpages, alias_rows, parallelism=8)["edges"].count()
    extract_triples_fused(wpages, alias_rows).count()

    # --- headline 1a: fused extraction (one Python crossing) ----------------
    t0 = time.monotonic()
    pages = pages_df(spark, N_DOCS, seed=42, partitions=CPUS * 2)
    n_triples = extract_triples_fused(pages, alias_rows).count()
    dt = time.monotonic() - t0
    timings["kg_extract_fused"] = round(dt, 3)
    extras["kg_fused_triples_per_sec"] = round(n_triples / dt, 1)
    extras["kg_fused_pages_per_sec"] = round(N_DOCS / dt, 1)

    # --- headline 1b: modular five-stage pipeline ----------------------------
    t0 = time.monotonic()
    res = run_pipeline(
        spark, pages, alias_rows, parallelism=CPUS * 2, persist=True
    )
    n_triples = res["triples"].count()
    dt = time.monotonic() - t0
    timings["kg_pipeline"] = round(dt, 3)
    extras["kg_triples_per_sec"] = round(n_triples / dt, 1)
    extras["kg_pages_per_sec"] = round(N_DOCS / dt, 1)
    extras["kg_triples"] = n_triples

    # --- headline 2: graph materialization (nodes+edges) --------------------
    t0 = time.monotonic()
    n_edges = res["edges"].count()
    timings["kg_graph_materialize"] = round(time.monotonic() - t0, 3)
    extras["kg_edges"] = n_edges

    # --- headline 2b: hash-id (content-addressed) graph build — the 100TB
    # scale path: join-free edges + one-distinct nodes over cached triples
    from llm_text_to_knowledge_graph_spark.operators.graph import (
        build_edges,
        build_nodes,
    )

    t0 = time.monotonic()
    n_edges_h = build_edges(res["triples"], id_strategy="hash").count()
    build_nodes(res["triples"], id_strategy="hash").count()
    timings["kg_graph_hash"] = round(time.monotonic() - t0, 3)
    assert n_edges_h == n_edges

    # --- oracle-contract queries over the sf dir -----------------------------
    qs = entrymod.queries()
    bench_queries = [
        "q1_pricing",
        "top_customers",
        "edge_materialization",
        "jaccard_pairs",
        "dedup_exact",
        "token_count",
        "quality_score",
        "lang_id",
        "embedding_topk",
        "ivf_ann_topk",
        "mention_counts",
        "mention_counts_native",
        "connected_components_graph",
        "minhash_pairs",
        "minhash_pairs_det",
        "simhash_pairs",
        "simhash_pairs_native",
    ]
    for name in bench_queries:
        t0 = time.monotonic()
        # count() forces full evaluation without driver-side collect
        qs[name](spark, SF_DIR).count()
        timings[name] = round(time.monotonic() - t0, 3)

    # --- ANN in its amortized regime: index built once (kmeans), then a
    # 32-query batch over the cached index vs brute force over the same
    # batch. One-shot IVF (ivf_ann_topk above) pays K cosines per corpus
    # vector at index-build time and only wins when |queries| > K; the
    # prebuilt index is the 100TB shape (corpus written partitioned by
    # cell, probed many times).
    from llm_text_to_knowledge_graph_spark.operators.similarity import (
        brute_force_topk,
        ivf_index,
        ivf_topk_indexed,
    )

    # K=8, nprobe=4: the sf embeddings table is ISOTROPIC (same-label mean
    # cosine 0.03), so IVF recall there is scan-fraction-bound for any
    # quantizer — 4/8 cells ~ 0.75 recall at half the scan. On genuinely
    # clustered data the same index reaches >=0.9 recall at a 25% scan
    # (pinned in tests/test_ivf.py).
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qids = list(range(32))
    t0 = time.monotonic()
    corpus, cents = ivf_index(emb, n_centroids=8, method="kmeans")
    corpus = corpus.persist()
    corpus.count()
    timings["ivf_index_build"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    exact = brute_force_topk(emb, qids, k=10)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    timings["ann_brute_32q"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    approx = ivf_topk_indexed(corpus, cents, qids, k=10, nprobe=4)
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    timings["ann_ivf_32q"] = round(time.monotonic() - t0, 3)
    extras["ivf_recall_32q"] = round(len(ex & ap) / max(len(ex), 1), 4)
    corpus.unpersist()

    # --- eval harness at bench scale: grouped bipartite matching (E4) over
    # the synthetic pipeline's predictions vs planted gold. Shuffle key is
    # (url, evidence): group sizes are bounded by statements-per-sentence
    # (small, near-uniform), so no skew handling is needed here — see
    # PLANS.md §eval for the 10^9-statement shuffle note.
    from llm_text_to_knowledge_graph_spark.corpus import gold_df
    from llm_text_to_knowledge_graph_spark.eval.spark_eval import match_statements

    t0 = time.monotonic()
    pred = res["triples"].select("url", "evidence", "bel_statement")
    gold = gold_df(spark, N_DOCS, seed=42).select("url", "evidence", "bel_statement")
    n_match = match_statements(pred, gold).count()
    timings["eval_match_statements"] = round(time.monotonic() - t0, 3)
    extras["eval_match_rows"] = n_match

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _SF_GUESS,
        **extras,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
