"""TransE scoring (operators/kge.py) vs a pure-Python md5 replay."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from llm_text_to_knowledge_graph_spark.operators.kge import (
    margin_ranking_loss,
    pseudo_embeddings,
    transe_energy,
)

DIM, SEED = 4, 11
NODES = [1, 2, 3, 40]
TRIPLES = [(1, "rel_a", 2), (2, "rel_a", 3), (3, "rel_b", 40)]


def _vec(key: int | str, prefix: str = "") -> list[float]:
    return [
        int(hashlib.md5(f"{prefix}{key}:{j}:{SEED}".encode()).hexdigest()[0], 16)
        / 15.0
        - 0.5
        for j in range(DIM)
    ]


def _energy(s, p, t, norm="l1") -> float:
    h, r, tt = _vec(s), _vec(p), _vec(t)
    d = [h[j] + r[j] - tt[j] for j in range(DIM)]
    return round(sum(abs(x) for x in d) if norm == "l1" else sum(x * x for x in d), 6)


@pytest.fixture(scope="module")
def frames(spark):
    ids = spark.createDataFrame([(n,) for n in NODES], ["node_id"])
    ent = pseudo_embeddings(ids, dim=DIM, seed=SEED)
    rels = spark.createDataFrame([("rel_a",), ("rel_b",)], ["node_id"])
    rel = pseudo_embeddings(rels, dim=DIM, seed=SEED).withColumnRenamed(
        "node_id", "rel"
    )
    tri = spark.createDataFrame(TRIPLES, ["s", "p", "t"])
    return tri, ent, rel


def test_pseudo_embeddings_replay(spark):
    ids = spark.createDataFrame([(n,) for n in NODES], ["node_id"])
    got = {
        r["node_id"]: list(r["vec"])
        for r in pseudo_embeddings(ids, dim=DIM, seed=SEED).collect()
    }
    for n in NODES:
        assert got[n] == pytest.approx(_vec(n), abs=1e-12)


@pytest.mark.parametrize("norm", ["l1", "l2sq"])
def test_transe_energy_replay(frames, norm):
    tri, ent, rel = frames
    got = {
        (r["s"], r["p"], r["t"]): r["energy"]
        for r in transe_energy(tri, ent, rel, norm=norm).collect()
    }
    assert len(got) == len(TRIPLES)
    for s, p, t in TRIPLES:
        assert got[(s, p, t)] == pytest.approx(_energy(s, p, t, norm), abs=1e-6)


def test_margin_ranking_loss(frames):
    tri, ent, rel = frames
    pos = transe_energy(tri, ent, rel)
    # corrupt every tail to node 40 (except the one already 40 -> 1)
    neg_rows = [(s, p, 40 if t != 40 else 1) for s, p, t in TRIPLES]
    neg = transe_energy(
        pos.sparkSession.createDataFrame(neg_rows, ["s", "p", "t"]), ent, rel
    ).select(
        F.col("s"), F.col("p"), F.lit(None).alias("t_neg"), F.col("energy")
    )
    # pair on (s, p): each positive has exactly one corruption here
    got = margin_ranking_loss(pos, neg, ["s", "p"], margin=1.0).collect()[0]
    exp_terms = []
    for (s, p, t), (_, _, tn) in zip(TRIPLES, neg_rows):
        exp_terms.append(max(0.0, 1.0 + _energy(s, p, t) - _energy(s, p, tn)))
    assert got["n_pairs"] == 3
    assert got["loss"] == pytest.approx(round(sum(exp_terms) / 3, 6), abs=1e-5)


def test_bad_norm(frames):
    tri, ent, rel = frames
    with pytest.raises(ValueError):
        transe_energy(tri, ent, rel, norm="l3")
