"""End-to-end KG-construction pipeline (SURVEY.md §3.1 Spark lifecycle).

pages -> paragraphs -> sentences -> mentions -> statements -> triples
      -> nodes + edges

Two modes:
  * lazy (workdir=None): one Catalyst plan end to end — UDF stages fuse into
    scan-side projections, no materialization.
  * checkpointed (workdir set): each stage commits an atomic snapshot via
    the TableStore shim with per-partition lineage + a metrics row; a rerun
    with the same input fingerprint resumes past completed stages
    (reference analog: per-stage JSON checkpoints, main.py:55-98).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import annotation_map, build_edges, build_nodes
from ..operators.mentions import detect_mentions, explode_mentions
from ..operators.paragraphs import extract_paragraphs, split_into_sentences
from ..operators.statements import extract_statements
from ..operators.triples import parse_triples
from .checkpoint import TableStore, make_table_store

STAGES = (
    "paragraphs",
    "sentences",
    "mentions",
    "statements",
    "triples",
    "flat_mentions",
    "nodes",
    "edges",
)


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    alias_rows: list,
    workdir: str | None = None,
    input_token: str = "adhoc",
    run_id: str = "run-0",
    lang: str | None = "en",
    parallelism: int | None = None,
    broadcast_nodes: bool = False,
    persist: bool = False,
    id_strategy: str = "dense",
    fuse: bool = True,
    extractor: str = "sentence",
) -> dict:
    """Run the full pipeline; returns dict of stage-name -> DataFrame plus
    ``metrics`` (list of dicts) when checkpointing.

    ``extractor`` selects the C2 engine for the statements/triples stages:
    ``"sentence"`` (default) is the round-1 exact-phrase engine over
    sentence-sliced mentions; ``"block"`` runs the extended paragraph-level
    pattern engine (``operators.extraction``) — coordination, displaced-agent
    passives, nominalizations, fold-continuations, cnc+pretreatment synergy —
    as ONE fused C1+C2 Python crossing over whole paragraphs
    (``extract_statements_extended``). Block statements carry ``sent_idx = 0``
    (evidence is the whole paragraph). The sentences/mentions stages are
    unchanged either way.

    Default decision (r3, evidence-based): ``"sentence"`` stays the
    throughput default — warm sf0.1 measures the fused block engine ~8%
    slower while emitting identical triples on corpora whose relations are
    sentence-local by construction. Pick ``"block"`` for real prose, where
    its cross-clause patterns earn the measured real-gold recall
    (tests/test_real_gold.py); both engines are benched every round
    (``kg_extract_fused`` vs ``kg_extract_fused_block``).

    ``persist=True`` caches the multiply-referenced stages MEMORY_AND_DISK
    in lazy mode — without it the graph build re-executes the extraction
    once per downstream reference. The checkpointed mode gets the same cut
    for free from its parquet snapshots.

    ``fuse=True`` (lazy mode only): run extraction as ONE fused Python
    crossing (``extract_sentence_level_fused``) and derive every stage
    relationally — same outputs, ~5x fewer Arrow round-trips. ``fuse=False``
    forces the modular five-UDF chain (each stage independently computed).
    Checkpointed runs always use the modular chain: each stage is a table
    with its own lineage.
    """
    from pyspark import StorageLevel

    par = parallelism or spark.sparkContext.defaultParallelism * 2
    # real Iceberg when a SparkCatalog is configured, parquet shim here
    store = make_table_store(spark, workdir) if workdir else None
    metrics: list[dict] = []
    _multi_ref = {"mentions", "triples", "nodes"}

    def stage(name: str, thunk, token_extra: str = ""):
        if store is None:
            df = thunk()
            if persist and name in _multi_ref:
                df = df.persist(StorageLevel.MEMORY_AND_DISK)
            return df
        t0 = time.monotonic()
        df, resumed = store.resume_or_compute(
            spark, name, f"{input_token}:{name}{token_extra}", run_id, thunk
        )
        m = store.manifest(name)
        metrics.append(
            {
                "run_id": run_id,
                "stage": name,
                "rows": m["rows"],
                "wall_ms": int((time.monotonic() - t0) * 1000),
                "resumed": resumed,
            }
        )
        return df

    if store is None and fuse:
        # Lazy mode: ONE Python crossing computes sentences + mentions +
        # parsed statements (operators/fused.py); every stage below is a
        # relational view of it. The modular five-UDF chain stacks five
        # ArrowEvalPython/MapInPandas nodes in one physical stage — each
        # chained node holds its own Python worker per task (measured 2-7x
        # slowdown from worker oversubscription) — so it is reserved for
        # checkpointed runs where stages materialize to tables anyway.
        from ..operators.fused import extract_sentence_level_fused

        base = extract_sentence_level_fused(pages, alias_rows, lang=lang)
        if persist:
            base = base.persist(StorageLevel.MEMORY_AND_DISK)
        paragraphs = extract_paragraphs(pages, lang=lang)  # lazy; free unless used
        sentences = base.select("url", "warc_ts", "para_idx", "sent_idx", "sentence")
        mentions = base.drop("results")
        statements = (
            base.filter(F.size("results") > 0)
            .select(
                "url", "warc_ts", "para_idx", "sent_idx",
                F.explode("results").alias("r"),
            )
            .select(
                "url", "warc_ts", "para_idx", "sent_idx",
                F.col("r.bel_statement").alias("bel_statement"),
                F.col("r.evidence").alias("evidence"),
            )
        )
        triples = (
            base.select(
                "url", "warc_ts", "para_idx", "sent_idx",
                F.explode("results").alias("r"),
            )
            .select(
                "url", "warc_ts", "para_idx", "sent_idx",
                F.col("r.subj").alias("subj"),
                F.col("r.pred").alias("pred"),
                F.col("r.obj").alias("obj"),
                F.col("r.bel_statement").alias("bel_statement"),
                F.col("r.evidence").alias("evidence"),
            )
            .filter(
                F.col("subj").isNotNull()
                & F.col("pred").isNotNull()
                & F.col("obj").isNotNull()
            )
        )
        flat_mentions = explode_mentions(mentions)
    else:
        paragraphs = stage("paragraphs", lambda: extract_paragraphs(pages, lang=lang))
        sentences = stage(
            "sentences",
            # explicit repartition before the heavy UDF stages so extraction
            # parallelism matches cores (north_rule: explicit partitioning)
            lambda: split_into_sentences(paragraphs).repartition(par, "url"),
        )
        mentions = stage("mentions", lambda: detect_mentions(sentences, alias_rows))
        if extractor == "sentence":
            statements = stage("statements", lambda: extract_statements(mentions))
            triples = stage("triples", lambda: parse_triples(statements))
        flat_mentions = stage("flat_mentions", lambda: explode_mentions(mentions))
    if extractor == "block":
        from ..operators.extraction import extract_statements_extended

        statements = stage(
            "statements_block",
            lambda: extract_statements_extended(paragraphs, alias_rows),
            token_extra=":block",
        )
        triples = stage(
            "triples", lambda: parse_triples(statements), token_extra=":block"
        )
    elif extractor != "sentence":
        raise ValueError(f"unknown extractor {extractor!r}")
    ann_map = annotation_map(flat_mentions)
    # id_strategy participates in the snapshot fingerprint: resuming a dense
    # run under --id-strategy hash (or vice versa) must recompute, not serve
    # the other scheme's snapshot
    nodes = stage(
        "nodes",
        lambda: build_nodes(triples, ann_map, id_strategy=id_strategy),
        token_extra=f":{id_strategy}",
    )
    edges = stage(
        "edges",
        lambda: build_edges(
            triples, nodes, broadcast_nodes=broadcast_nodes, id_strategy=id_strategy
        ),
        token_extra=f":{id_strategy}",
    )

    out = {
        "paragraphs": paragraphs,
        "sentences": sentences,
        "mentions": mentions,
        "statements": statements,
        "triples": triples,
        "flat_mentions": flat_mentions,
        "nodes": nodes,
        "edges": edges,
        "metrics": metrics,
    }
    if store is not None:
        _write_metrics(spark, store, metrics)
    return out


def _write_metrics(spark: SparkSession, store: TableStore, metrics: list[dict]) -> None:
    if not metrics:
        return
    df = spark.createDataFrame(
        [
            (m["run_id"], m["stage"], int(m["rows"]), int(m["wall_ms"]))
            for m in metrics
        ],
        schema="run_id string, stage string, rows long, wall_ms long",
    )
    # each store knows its own metrics sink (parquet dir for the shim, an
    # Iceberg metrics_log table for the catalog store)
    store.write_metrics(df)


def documents_as_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's ``documents`` table to the pages input schema —
    lets the same pipeline run over /root/testdata corpora."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
