"""doc_meta (D9/S4), E6 annotation faithfulness, planted near-miss linking."""

from pyspark.sql import functions as F

from llm_text_to_knowledge_graph_spark.corpus import (
    alias_df,
    build_alias_rows,
    pages_df,
)
from llm_text_to_knowledge_graph_spark.plans.pipeline import run_pipeline


def test_doc_meta(spark):
    from llm_text_to_knowledge_graph_spark.operators.doc_meta import extract_doc_meta

    meta = extract_doc_meta(pages_df(spark, 40, seed=42)).collect()
    assert len(meta) == 40
    by_url = {m["url"]: m for m in meta}
    html_docs = [m for m in meta if m["title"] is not None]
    assert html_docs, "html-mode pages must yield <title>"
    for m in html_docs:
        assert m["title"].startswith("Synthetic corpus document")
    # text-mode pages (doc_id % 10 == 7) have no <title> but do have paragraphs
    text_mode = by_url["https://corpus.test/doc/000000000007"]
    assert text_mode["title"] is None and text_mode["n_paragraphs"] > 0
    assert text_mode["abstract"]


def test_annotation_faithfulness_all_ok_on_pipeline_output(spark):
    from llm_text_to_knowledge_graph_spark.eval.annotation_check import (
        annotation_faithfulness,
    )

    res = run_pipeline(spark, pages_df(spark, 30, seed=13), build_alias_rows(13))
    scored = annotation_faithfulness(res["triples"], res["flat_mentions"])
    rows = scored.collect()
    assert rows
    # extractor only uses grounded mentions -> faithfulness must be 1.0
    assert all(r["faithfulness"] == 1.0 for r in rows)
    assert all(r["n_manufactured"] == 0 for r in rows)


def test_annotation_faithfulness_flags_errors(spark):
    import datetime as dt

    from llm_text_to_knowledge_graph_spark.eval.annotation_check import (
        annotation_faithfulness,
    )

    triples = spark.createDataFrame(
        [
            ("u", dt.datetime(2024, 1, 1), 0, 0, "p(HGNC:AKT1)", "increases",
             "p(HGNC:GHOST9)", "p(HGNC:AKT1) increases p(HGNC:GHOST9)", "ev"),
            ("u", dt.datetime(2024, 1, 1), 0, 1, "p(CHEBI:AKT1)", "increases",
             "p(HGNC:AKT1)", "p(CHEBI:AKT1) increases p(HGNC:AKT1)", "ev2"),
        ],
        schema="url string, warc_ts timestamp, para_idx int, sent_idx int, "
        "subj string, pred string, obj string, bel_statement string, evidence string",
    )
    mentions = spark.createDataFrame(
        [("u", dt.datetime(2024, 1, 1), 0, 0, 0, 4, "AKT1", "HGNC", "391", "AKT1", 1.0)],
        schema="url string, warc_ts timestamp, para_idx int, sent_idx int, "
        "begin int, end int, alias string, db string, id string, "
        "entry_name string, score double",
    )
    rows = {r["bel_statement"]: r for r in annotation_faithfulness(triples, mentions).collect()}
    ghost = rows["p(HGNC:AKT1) increases p(HGNC:GHOST9)"]
    assert ghost["n_ok"] == 1 and ghost["n_manufactured"] == 1
    wrong_ns = rows["p(CHEBI:AKT1) increases p(HGNC:AKT1)"]
    assert wrong_ns["n_wrong_namespace"] == 1 and wrong_ns["n_ok"] == 1


def test_planted_near_misses_fuzzy_linked(spark):
    from llm_text_to_knowledge_graph_spark.operators.linking import (
        candidate_spans,
        link_fuzzy,
    )
    from llm_text_to_knowledge_graph_spark.operators.paragraphs import (
        extract_paragraphs,
        split_into_sentences,
    )

    sents = split_into_sentences(extract_paragraphs(pages_df(spark, 60, seed=42)))
    adf = alias_df(spark)
    known = [r["alias"] for r in adf.select("alias").collect()]
    spans = candidate_spans(sents, known)
    linked = link_fuzzy(spans, adf).collect()
    assert linked, "planted near-miss typos must produce fuzzy links"
    # typo doubles one char, so the linked entry_name is a subsequence match
    for r in linked[:10]:
        assert r["score"] >= 0.3
        assert r["fuzzy"] is True
