"""GraphRAG composite (operators/rag.py) vs an independent Python replay.

The replay re-implements every stage from scratch (numpy-free dict math):
symmetrized PPR power iteration, the 6dp top-m cut, per-doc entity mass,
and Lucene-variant BM25 — so a bug in the Spark composition cannot hide
behind shared code.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from llm_text_to_knowledge_graph_spark.operators.rag import rag_context

DOCS = [
    (0, "alpha beta talks about spark and join plans"),
    (1, "beta gamma gamma stream stream vector"),
    (2, "delta only here with vector text"),
    (3, "alpha delta spark spark stream"),
    (4, "unrelated words entirely different"),
    (5, "gamma alpha beta mix of all"),
]
# entity graph: 0=alpha 1=beta 2=gamma 3=delta (co-mention edges)
EDGES = [(0, 1), (1, 2), (0, 3), (2, 0)]
ENTITY_DOCS = [
    (0, 0), (1, 0),
    (1, 1), (2, 1),
    (3, 2),
    (0, 3), (3, 3),
    (2, 5), (0, 5), (1, 5),
]
SEEDS = [0, 2]
TERMS = ["spark", "stream", "vector"]
TOP_M = 3
ITERS = 3
DAMPING = 0.85


def _ppr_reference() -> dict[int, float]:
    und = set()
    for s, t in EDGES:
        und.add((s, t))
        und.add((t, s))
    nodes = sorted({s for s, _ in und} | {t for _, t in und})
    deg = {n: sum(1 for s, _ in und if s == n) for n in nodes}
    p0 = {n: (1.0 / len(SEEDS) if n in SEEDS else 0.0) for n in nodes}
    rank = dict(p0)
    for _ in range(ITERS):
        in_rank = {n: 0.0 for n in nodes}
        for s, t in sorted(und):
            in_rank[t] += rank[s] / deg[s]
        rank = {
            n: (1.0 - DAMPING) * p0[n] + DAMPING * in_rank[n] for n in nodes
        }
    return rank


def _bm25_reference(k1: float = 1.2, b: float = 0.75) -> dict[int, float]:
    toks = {d: t.strip().lower().split() for d, t in DOCS}
    dl = {d: len(ts) for d, ts in toks.items()}
    n_docs = len(dl)
    avgdl = sum(dl.values()) / n_docs
    scores: dict[int, float] = {}
    for term in TERMS:
        df = sum(1 for ts in toks.values() if term in ts)
        if df == 0:
            continue
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        for d, ts in toks.items():
            tf = ts.count(term)
            if tf == 0:
                continue
            sat = tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * dl[d] / avgdl)
            )
            scores[d] = scores.get(d, 0.0) + idf * sat
    return {d: round(s, 6) for d, s in scores.items()}


def _expected() -> dict[int, tuple[int, float, float, float]]:
    rank = {n: round(r, 6) for n, r in _ppr_reference().items()}
    top = sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_M]
    top_rank = dict(top)
    mass: dict[int, float] = {}
    n_ent: dict[int, int] = {}
    for node, doc in set(ENTITY_DOCS):
        if node in top_rank:
            mass[doc] = mass.get(doc, 0.0) + top_rank[node]
            n_ent[doc] = n_ent.get(doc, 0) + 1
    bm = _bm25_reference()
    out = {}
    for doc, gm in mass.items():
        gm = round(gm, 6)
        b = bm.get(doc, 0.0)
        out[doc] = (n_ent[doc], gm, b, round(gm * (1.0 + b), 6))
    return out


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    edges = spark.createDataFrame(EDGES, "s long, t long")
    edocs = spark.createDataFrame(ENTITY_DOCS, "node_id long, doc_id long")
    return docs, edges, edocs


def test_rag_context_matches_independent_replay(frames):
    docs, edges, edocs = frames
    got = {
        r["doc_id"]: (
            r["n_entities"],
            r["graph_mass"],
            r["bm25"],
            r["score"],
        )
        for r in rag_context(
            edges,
            edocs,
            docs,
            SEEDS,
            TERMS,
            top_entities=TOP_M,
            iterations=ITERS,
        ).collect()
    }
    exp = _expected()
    assert set(got) == set(exp)
    for doc, (n, gm, b, sc) in exp.items():
        gn, ggm, gb, gsc = got[doc]
        assert gn == n, (doc, got[doc], exp[doc])
        assert abs(ggm - gm) < 1e-9
        assert abs(gb - b) < 1e-9
        assert abs(gsc - sc) < 1e-9


def test_rag_context_topk_cut_is_deterministic(frames):
    docs, edges, edocs = frames
    rows = rag_context(
        edges, edocs, docs, SEEDS, TERMS,
        top_entities=TOP_M, iterations=ITERS, k=2,
    ).collect()
    exp = sorted(
        _expected().items(), key=lambda kv: (-kv[1][3], kv[0])
    )[:2]
    assert [(r["doc_id"], r["score"]) for r in rows] == [
        (d, pytest.approx(v[3], abs=1e-9)) for d, v in exp
    ]


def test_rag_context_graph_only_doc_still_ranks(frames):
    """A doc with zero lexical match but a top entity must appear with
    bm25 == 0 and score == graph_mass (the 'graph recall' contract)."""
    docs, edges, edocs = frames
    got = {
        r["doc_id"]: r
        for r in rag_context(
            edges, edocs, docs, SEEDS, TERMS,
            top_entities=TOP_M, iterations=ITERS,
        ).collect()
    }
    exp = _expected()
    lexical_free = [d for d, v in exp.items() if v[2] == 0.0]
    assert lexical_free, "fixture must contain a graph-only document"
    for d in lexical_free:
        assert got[d]["bm25"] == 0.0
        assert got[d]["score"] == pytest.approx(
            got[d]["graph_mass"], abs=1e-9
        )


def test_rag_plan_properties(spark):
    """Scale claims pinned: the top-entity cut joins the mention map via
    BROADCAST (query-sized side never shuffles the corpus-sized side's
    rows twice) and the whole composite has zero Python eval nodes."""
    from pyspark.sql import functions as F  # noqa: F811

    edges = spark.createDataFrame([(0, 1), (1, 2)], ["s", "t"])
    ed = spark.createDataFrame([(0, 0), (1, 1)], ["node_id", "doc_id"])
    docs = spark.createDataFrame(
        [(0, "alpha spark"), (1, "beta")], ["doc_id", "text"]
    )
    out = rag_context(edges, ed, docs, seeds=[0], query_terms=["spark"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan
