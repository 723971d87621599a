"""Fuzzy entity linking: LSH-blocked candidate generation + top-1 scoring."""

from llm_text_to_knowledge_graph_spark.corpus import alias_df
from llm_text_to_knowledge_graph_spark.operators.linking import (
    candidate_spans,
    link_fuzzy,
)


def test_fuzzy_linking_near_misses(spark):
    aliases = [
        ("TP53", "HGNC", "11998", "TP53", 1.0),
        ("AKT1", "HGNC", "391", "AKT1", 1.0),
        ("MAPK14", "HGNC", "6876", "MAPK14", 1.0),
    ]
    adf = spark.createDataFrame(
        aliases, "alias string, db string, id string, entry_name string, prior double"
    )
    rows = [
        # TP53- and MAPK14-like typos; 'Results' is entity-looking but far
        # from every alias and must not link
        ("u://1", 0, 0, "TPp53 and MAPKK14 were assayed; Results follow."),
    ]
    sents = spark.createDataFrame(
        rows, "url string, para_idx int, sent_idx int, sentence string"
    )
    spans = candidate_spans(sents, [a[0] for a in aliases])
    toks = {r["token"] for r in spans.collect()}
    assert "TPp53" in toks and "MAPKK14" in toks

    linked = link_fuzzy(spans, adf, max_jaccard_distance=0.7, min_score=0.3)
    got = {r["alias"]: r["entry_name"] for r in linked.collect()}
    assert got.get("TPp53") == "TP53"
    assert got.get("MAPKK14") == "MAPK14"
    assert "Results" not in got


def test_exact_hits_not_respanned(spark):
    adf = alias_df(spark)
    known = [r["alias"] for r in adf.select("alias").collect()]
    a, b = known[0], known[10]
    rows = [("u://1", 0, 0, f"{a} binds to {b}.")]
    sents = spark.createDataFrame(
        rows, "url string, para_idx int, sent_idx int, sentence string"
    )
    spans = candidate_spans(sents, known)
    toks = {r["token"] for r in spans.collect()}
    # exact dictionary hits are excluded from the fuzzy path
    assert a not in toks and b not in toks
