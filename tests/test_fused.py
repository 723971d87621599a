"""Fused fast paths must be row-identical to the five-stage modular chain."""

from llm_text_to_knowledge_graph_spark.corpus import build_alias_rows, pages_df
from llm_text_to_knowledge_graph_spark.operators.fused import extract_triples_fused
from llm_text_to_knowledge_graph_spark.plans.pipeline import run_pipeline

TRIPLE_COLS = [
    "url", "para_idx", "sent_idx", "subj", "pred", "obj", "bel_statement", "evidence",
]


def test_fused_equals_modular(spark):
    pages = pages_df(spark, 40, seed=5)
    alias_rows = build_alias_rows(5)
    modular = run_pipeline(spark, pages, alias_rows, fuse=False)["triples"]
    fused = extract_triples_fused(pages, alias_rows)
    a = sorted(tuple(r) for r in modular.select(TRIPLE_COLS).collect())
    b = sorted(tuple(r) for r in fused.select(TRIPLE_COLS).collect())
    assert a == b
    assert len(a) > 50


def test_fused_lazy_pipeline_stages_equal_modular(spark):
    """run_pipeline(fuse=True) derives every stage from one crossing; each
    must match the independently-computed modular stage row-for-row."""
    pages = pages_df(spark, 40, seed=7)
    alias_rows = build_alias_rows(5)
    fast = run_pipeline(spark, pages, alias_rows, fuse=True, persist=True)
    slow = run_pipeline(spark, pages, alias_rows, fuse=False)

    def rows(df, cols):
        return sorted(tuple(r) for r in df.select(cols).collect())

    sent_cols = ["url", "para_idx", "sent_idx", "sentence"]
    assert rows(fast["sentences"], sent_cols) == rows(slow["sentences"], sent_cols)

    flat_cols = ["url", "para_idx", "sent_idx", "begin", "end", "db", "id",
                 "entry_name", "score"]
    assert rows(fast["flat_mentions"], flat_cols) == rows(slow["flat_mentions"], flat_cols)

    stmt_cols = ["url", "para_idx", "sent_idx", "bel_statement", "evidence"]
    assert rows(fast["statements"], stmt_cols) == rows(slow["statements"], stmt_cols)

    assert rows(fast["triples"], TRIPLE_COLS) == rows(slow["triples"], TRIPLE_COLS)

    # graph tables built on top agree too (dense ids are deterministic)
    node_cols = ["node_id", "name", "label", "type", "url"]
    assert rows(fast["nodes"], node_cols) == rows(slow["nodes"], node_cols)
    edge_cols = ["edge_id", "s", "t", "interaction", "bel_expression"]
    assert rows(fast["edges"], edge_cols) == rows(slow["edges"], edge_cols)


def test_fused_lazy_single_python_crossing(spark, tmp_path):
    # materialize pages first — the synthetic generator is itself a
    # MapInPandas node and would double-count
    pages_df(spark, 10, seed=9).write.parquet(str(tmp_path / "pages"))
    pages = spark.read.parquet(str(tmp_path / "pages"))
    alias_rows = build_alias_rows(5)
    plan = (
        run_pipeline(spark, pages, alias_rows, fuse=True)["triples"]
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1
    assert "ArrowEvalPython" not in plan


def test_fused_block_equals_modular_block(spark):
    """extract_triples_fused_block (one crossing) must be row-identical to
    run_pipeline(extractor="block") (paragraphs stage + extended engine)."""
    from llm_text_to_knowledge_graph_spark.operators.fused import (
        extract_triples_fused_block,
    )

    pages = pages_df(spark, 40, seed=5)
    alias_rows = build_alias_rows(5)
    modular = run_pipeline(spark, pages, alias_rows, extractor="block")["triples"]
    fused = extract_triples_fused_block(pages, alias_rows)
    a = sorted(tuple(r) for r in modular.select(TRIPLE_COLS).collect())
    b = sorted(tuple(r) for r in fused.select(TRIPLE_COLS).collect())
    assert a == b
    assert len(a) > 50


def test_fused_block_single_python_crossing(spark, tmp_path):
    from pyspark.sql import functions as F

    from llm_text_to_knowledge_graph_spark.operators.fused import (
        extract_triples_fused_block,
    )

    pages_df(spark, 10, seed=9).write.mode("overwrite").parquet(
        str(tmp_path / "pages_b")
    )
    pages = spark.read.parquet(str(tmp_path / "pages_b"))
    plan = (
        extract_triples_fused_block(pages, build_alias_rows(5))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1
    assert "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # map-only: no shuffle before the sink
