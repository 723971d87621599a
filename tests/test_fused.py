"""Fused fast path must be row-identical to the five-stage modular chain."""

from llm_text_to_knowledge_graph_spark.corpus import build_alias_rows, pages_df
from llm_text_to_knowledge_graph_spark.operators.fused import extract_triples_fused
from llm_text_to_knowledge_graph_spark.plans.pipeline import run_pipeline


def test_fused_equals_modular(spark):
    pages = pages_df(spark, 40, seed=5)
    alias_rows = build_alias_rows(5)
    modular = run_pipeline(spark, pages, alias_rows)["triples"]
    fused = extract_triples_fused(pages, alias_rows)
    cols = ["url", "para_idx", "sent_idx", "subj", "pred", "obj", "bel_statement", "evidence"]
    a = sorted(tuple(r) for r in modular.select(cols).collect())
    b = sorted(tuple(r) for r in fused.select(cols).collect())
    assert a == b
    assert len(a) > 50
