"""Graph query layer over a small hand-built graph + the synthetic KG."""

import pytest

from llm_text_to_knowledge_graph_spark.operators.graph_query import (
    evidence_for_pair,
    k_hop_neighborhood,
    subgraph,
    top_hubs,
)


@pytest.fixture(scope="module")
def tiny_graph(spark):
    # path: 0-1-2-3-4 plus a spur 1-5
    edges = spark.createDataFrame(
        [
            (0, 0, 1, "increases", "e01", "t", "ev01"),
            (1, 1, 2, "increases", "e12", "t", "ev12"),
            (2, 2, 3, "decreases", "e23", "t", "ev23"),
            (3, 3, 4, "association", "e34", "t", "ev34"),
            (4, 1, 5, "association", "e15", "t", "ev15"),
        ],
        "edge_id long, s long, t long, interaction string, "
        "bel_expression string, text string, evidence string",
    )
    nodes = spark.createDataFrame(
        [(i, f"p(HGNC:N{i})", f"N{i}", "p", None) for i in range(6)],
        "node_id long, name string, label string, type string, url string",
    )
    return nodes, edges


def test_k_hop(tiny_graph):
    nodes, edges = tiny_graph
    hops = {r["node_id"]: r["hop"] for r in k_hop_neighborhood(edges, [0], k=2).collect()}
    assert hops == {0: 0, 1: 1, 2: 2, 5: 2}


def test_k_hop_exhausts_early(tiny_graph):
    nodes, edges = tiny_graph
    hops = k_hop_neighborhood(edges, [0], k=10).collect()
    assert {r["node_id"] for r in hops} == {0, 1, 2, 3, 4, 5}


def test_subgraph(tiny_graph, spark):
    nodes, edges = tiny_graph
    keep = spark.createDataFrame([(0,), (1,), (2,)], "node_id long")
    sub = subgraph(edges, keep).collect()
    assert {e["edge_id"] for e in sub} == {0, 1}


def test_top_hubs(tiny_graph):
    nodes, edges = tiny_graph
    hubs = top_hubs(edges, nodes, k=2).collect()
    assert hubs[0]["node_id"] == 1 and hubs[0]["degree"] == 3


def test_evidence_for_pair(tiny_graph):
    nodes, edges = tiny_graph
    ev = evidence_for_pair(edges, nodes, "p(HGNC:N2)", "p(HGNC:N1)").collect()
    assert len(ev) == 1 and ev[0]["evidence"] == "ev12"


def test_on_pipeline_output(spark):
    from llm_text_to_knowledge_graph_spark.corpus import build_alias_rows, pages_df
    from llm_text_to_knowledge_graph_spark.plans.pipeline import run_pipeline

    res = run_pipeline(spark, pages_df(spark, 40, seed=42), build_alias_rows())
    nodes, edges = res["nodes"].persist(), res["edges"].persist()
    hubs = top_hubs(edges, nodes, k=5).collect()
    assert len(hubs) == 5 and hubs[0]["degree"] >= hubs[-1]["degree"]
    seed = hubs[0]["node_id"]
    nb = k_hop_neighborhood(edges, [seed], k=2)
    assert nb.count() > 1
    sub = subgraph(edges, nb)
    assert 0 < sub.count() <= edges.count()
