"""Pure-Python Hungarian algorithm (assignment problem), O(n³).

Potentials-based formulation (standard public algorithm; equivalent in
role to the reference's utils/hungarian_algorithm.cpp:25-201, which it
does NOT copy — different algorithmic formulation).  Used on tiny k×k
community-contingency matrices collected to the driver (Q9,
utils/quality_measures.cpp:416-468); scipy is unavailable in-sandbox.
"""

from __future__ import annotations


def linear_sum_assignment_min(cost: list[list[float]]) -> list[tuple[int, int]]:
    """Minimum-cost assignment on an n×m matrix (n <= m required;
    transpose first otherwise). Returns [(row, col), ...] for all rows."""
    n = len(cost)
    if n == 0:
        return []
    m = len(cost[0])
    assert n <= m, "transpose so rows <= cols"
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
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    return [(p[j] - 1, j - 1) for j in range(1, m + 1) if p[j] != 0]


def max_assignment_value(score: list[list[float]]) -> float:
    """Maximum total score over a one-to-one assignment (rows to columns)."""
    if not score or not score[0]:
        return 0.0
    n, m = len(score), len(score[0])
    transposed = n > m
    if transposed:
        score = [[score[i][j] for i in range(n)] for j in range(m)]
        n, m = m, n
    big = max(max(row) for row in score)
    cost = [[big - x for x in row] for row in score]
    pairs = linear_sum_assignment_min(cost)
    return float(sum(score[i][j] for i, j in pairs))
