"""Hungarian assignment vs brute force; greedy-vs-hungarian agreement on
eval-shaped groups."""

import itertools
import random

from llm_text_to_knowledge_graph_spark.eval.bel_eval import match_group
from llm_text_to_knowledge_graph_spark.eval.hungarian import (
    linear_sum_assignment_min,
    max_score_assignment,
)


def _brute_min(cost):
    n, m = len(cost), len(cost[0])
    k = min(n, m)
    best = None
    rows = range(n)
    for rsub in itertools.permutations(rows, k):
        for csub in itertools.permutations(range(m), k):
            tot = sum(cost[r][c] for r, c in zip(rsub, csub))
            if best is None or tot < best:
                best = tot
    return best


def test_hungarian_matches_brute_force():
    rng = random.Random(42)
    for trial in range(30):
        n = rng.randint(1, 4)
        m = rng.randint(1, 4)
        cost = [[round(rng.uniform(-5, 5), 3) for _ in range(m)] for _ in range(n)]
        pairs = linear_sum_assignment_min(cost)
        tot = sum(cost[i][j] for i, j in pairs)
        assert len(pairs) == min(n, m)
        assert abs(tot - _brute_min(cost)) < 1e-9, (cost, pairs)


def test_max_assignment():
    scores = [[0.8, 0.5], [0.8, 0.2]]
    pairs = max_score_assignment(scores)
    tot = sum(scores[i][j] for i, j in pairs)
    assert abs(tot - 1.3) < 1e-9  # (0,1)+(1,0) = 0.5+0.8 beats 0.8+0.2


def test_greedy_and_hungarian_agree_on_eval_groups():
    preds = [
        "p(HGNC:A) increases p(HGNC:B)",
        "p(HGNC:A) directlyIncreases p(HGNC:B)",
        "p(HGNC:C) decreases p(HGNC:D)",
    ]
    golds = [
        "p(HGNC:A) directlyIncreases p(HGNC:B)",
        "p(HGNC:C) decreases p(HGNC:D)",
    ]
    for method in ("greedy", "hungarian"):
        rows = match_group(preds, golds, method=method)
        matched = {
            (r["pred_statement"], r["gold_statement"])
            for r in rows
            if r["match_type"] in ("exact_match", "core_match")
        }
        assert matched == {
            (preds[1], golds[0]),
            (preds[2], golds[1]),
        }, method
