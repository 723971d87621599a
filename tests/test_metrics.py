from llm_text_to_knowledge_graph_spark.corpus import build_alias_rows, pages_df
from llm_text_to_knowledge_graph_spark.plans.metrics import graph_stats, table_stats
from llm_text_to_knowledge_graph_spark.plans.pipeline import run_pipeline


def test_table_and_graph_stats(spark):
    res = run_pipeline(spark, pages_df(spark, 25, seed=17), build_alias_rows(17))
    ts = table_stats(res["triples"], key_cols=["pred", "url"])
    assert ts["rows"] > 0
    assert 0 < ts["approx_distinct_pred"] <= 30
    assert ts["approx_distinct_url"] <= 30  # HLL++ estimate near 25

    gs = graph_stats(res["nodes"], res["edges"])
    assert gs["nodes"] > 0 and gs["edges"] == ts["rows"]
    # Zipf entity frequencies -> in-degree skew signal present
    assert gs["max_in_degree"] >= gs["avg_in_degree"]
