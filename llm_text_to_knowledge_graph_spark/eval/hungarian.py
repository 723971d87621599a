"""O(n^3) Hungarian assignment (no scipy in this environment).

Potential-based shortest-augmenting-path formulation. Used by the E4
matcher's "hungarian" mode — the reference prefers
scipy.linear_sum_assignment when importable (bel_parser.py:479-514) and
falls back to greedy; we provide both and pin greedy as the default
(SURVEY.md §7 hard-point 5), asserting in tests that the two agree on
total score for the tiny per-evidence groups this pipeline produces.
"""

from __future__ import annotations


def linear_sum_assignment_min(cost: list[list[float]]) -> list[tuple[int, int]]:
    """Minimize total cost over a 1:1 assignment; returns [(row, col), ...].

    Handles rectangular matrices (assigns min(n_rows, n_cols) pairs).
    """
    n = len(cost)
    if n == 0:
        return []
    m = len(cost[0])
    transposed = n > m
    if transposed:
        cost = [[cost[i][j] for i in range(n)] for j in range(m)]
        n, m = m, n

    INF = float("inf")
    u = [0.0] * (n + 1)
    v = [0.0] * (m + 1)
    p = [0] * (m + 1)  # p[j] = row matched to column j (1-based; 0 = none)
    way = [0] * (m + 1)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = [INF] * (m + 1)
        used = [False] * (m + 1)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = -1
            for j in range(1, m + 1):
                if used[j]:
                    continue
                cur = cost[i0 - 1][j - 1] - u[i0] - v[j]
                if cur < minv[j]:
                    minv[j] = cur
                    way[j] = j0
                if minv[j] < delta:
                    delta = minv[j]
                    j1 = j
            for j in range(m + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while True:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
            if j0 == 0:
                break

    pairs = [(p[j] - 1, j - 1) for j in range(1, m + 1) if p[j] != 0]
    if transposed:
        pairs = [(c, r) for r, c in pairs]
    return sorted(pairs)


def max_score_assignment(scores: list[list[float]]) -> list[tuple[int, int]]:
    """Maximize total score (negated-cost Hungarian)."""
    neg = [[-s for s in row] for row in scores]
    return linear_sum_assignment_min(neg)
