"""Deterministic random walks (operators/walks.py).

Verified against an independent hashlib/py-dict replay of the walk
process — same draw definition, different machinery (Python dict
adjacency vs Spark joins) — plus determinism-under-repartition and
structural invariants (every step follows an edge).
"""

import hashlib

import pytest

from llm_text_to_knowledge_graph_spark.operators.walks import (
    random_walks,
    ranked_adjacency,
    skipgram_pairs,
)

EDGES = [
    (1, 2),
    (1, 3),
    (2, 3),
    (3, 4),
    (4, 5),
    (5, 1),
    (6, 1),
    (4, 7),
]


def _edges_df(spark, edges=EDGES):
    return spark.createDataFrame(edges, "s long, t long")


def _py_adj(edges, directed=False):
    adj = {}
    pairs = set()
    for s, t in edges:
        if s == t:
            continue
        pairs.add((s, t))
        if not directed:
            pairs.add((t, s))
    for s, t in sorted(pairs):
        adj.setdefault(s, []).append(t)  # sorted => rank order by t asc
    return adj


def _py_draw(walk_id, step, seed):
    hx = hashlib.md5(f"{walk_id}:{step}:{seed}".encode()).hexdigest()
    return int(hx[:15], 16)


def _py_walks(edges, walk_len, walks_per_node, seed, directed=False):
    adj = _py_adj(edges, directed)
    rows = set()
    for node in adj:
        for copy in range(walks_per_node):
            wid = node * walks_per_node + copy
            cur = node
            rows.add((wid, 0, cur))
            for step in range(1, walk_len + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break  # directed sink: walk ends
                cur = nbrs[_py_draw(wid, step, seed) % len(nbrs)]
                rows.add((wid, step, cur))
    return rows


def test_ranked_adjacency_rank_and_degree(spark):
    adj = ranked_adjacency(_edges_df(spark)).collect()
    by_s = {}
    for r in adj:
        by_s.setdefault(r.s, []).append(r)
    py = _py_adj(EDGES)
    assert set(by_s) == set(py)
    for s, rows in by_s.items():
        rows = sorted(rows, key=lambda r: r.idx)
        assert [r.t for r in rows] == py[s]
        assert [r.idx for r in rows] == list(range(1, len(py[s]) + 1))
        assert all(r.deg == len(py[s]) for r in rows)


@pytest.mark.parametrize("directed", [False, True])
def test_walks_match_independent_replay(spark, directed):
    got = {
        (r.walk_id, r.step, r.node)
        for r in random_walks(
            _edges_df(spark), walk_len=5, walks_per_node=2, seed=7,
            directed=directed,
        ).collect()
    }
    assert got == _py_walks(EDGES, 5, 2, 7, directed)


def test_walks_follow_edges_and_are_repartition_invariant(spark):
    e = _edges_df(spark)
    w1 = random_walks(e, walk_len=4, walks_per_node=1, seed=3)
    w2 = random_walks(e.repartition(7), walk_len=4, walks_per_node=1, seed=3)
    r1 = {(r.walk_id, r.step, r.node) for r in w1.collect()}
    r2 = {(r.walk_id, r.step, r.node) for r in w2.collect()}
    assert r1 == r2
    # every consecutive (step, step+1) pair is an undirected edge
    und = {(s, t) for s, t in EDGES} | {(t, s) for s, t in EDGES}
    by_walk = {}
    for wid, step, node in r1:
        by_walk.setdefault(wid, {})[step] = node
    assert by_walk  # non-empty
    for steps in by_walk.values():
        assert sorted(steps) == list(range(5))  # undirected: never dies
        for i in range(4):
            assert (steps[i], steps[i + 1]) in und


def test_skipgram_pairs_window(spark):
    walks = random_walks(_edges_df(spark), walk_len=4, walks_per_node=1, seed=3)
    pairs = {
        (r.walk_id, r.step, r.center, r.context)
        for r in skipgram_pairs(walks, window=2).collect()
    }
    # independent pair construction from the collected walks
    by_walk = {}
    for r in walks.collect():
        by_walk.setdefault(r.walk_id, {})[r.step] = r.node
    want = set()
    for wid, steps in by_walk.items():
        for sa, center in steps.items():
            for sb, context in steps.items():
                if 1 <= abs(sa - sb) <= 2 and center != context:
                    want.add((wid, sa, center, context))
    assert pairs == want


def test_walks_reject_string_node_ids(spark):
    """String-keyed graphs (e.g. resolution.py alias graphs) must fail
    fast: walk_id arithmetic on strings silently nulls every key."""
    df = spark.createDataFrame([("a", "b"), ("b", "c")], ["s", "t"])
    with pytest.raises(TypeError, match="integer node ids"):
        random_walks(df, walk_len=2)
