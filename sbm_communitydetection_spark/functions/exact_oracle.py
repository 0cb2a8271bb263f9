"""D4 — exact modularity maximization oracle (reference src/ip_solver.cpp).

The reference formulates modularity maximization as an ILP over n² binary
co-membership variables with O(n³) reflexivity/transitivity constraints,
solved by SCIP via OR-Tools (src/ip_solver.cpp:43-163) — usable only for
tiny graphs, and kept by the reference as a validation oracle for its
n=20 golden corpus (scripts/overall_run.cpp:24-31, 10% gap). No ILP
solver ships in this sandbox, so the engine's oracle is BRANCH-AND-BOUND
over restricted-growth set-partition strings with an admissible dynamic
upper bound. At depth i (vertices < i assigned), every unassigned vertex
k can add at most

    B_kk  +  max(0, max_b S_b(k))  +  Σ_{i≤j<k} max(0, 2·B_kj)

where S_b(k) = Σ_{j assigned to block b} 2·B_kj (maintained incrementally,
O(n) per branch) — the middle term uses the constraint that k joins
EXACTLY ONE existing block (or a new one, gain 0), which is far tighter
than treating every assigned pair independently; the last term keeps the
independent positive-part relaxation only for pairs among unassigned
vertices (prefix-sum table, O(1) lookup). Pruning `q + UB ≤ best` is
exact. Vertices are ordered by degree descending and the search can be
SEEDED with an incumbent partition (e.g. a Louvain result) so
near-optimal incumbents prune almost everything. Solves the reference's
n=20 corpus configs (dense AND noisy) in seconds.

Pure driver-side python/numpy on a COLLECTED subgraph — deliberately not
a Spark op (SURVEY.md §2.9 D4: "Not a Spark op").
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame


def _modularity_of(B: np.ndarray, assign: list[int], two_m: float) -> float:
    n = len(assign)
    q = 0.0
    for i in range(n):
        q += B[i][i]
        for j in range(i):
            if assign[j] == assign[i]:
                q += 2.0 * B[i][j]
    return q / two_m


def exact_max_modularity_py(
    edges: list[tuple[int, int, int]],
    max_n: int = 24,
    initial_labels: dict[int, int] | None = None,
) -> tuple[float, dict[int, int]]:
    """(best_Q, labels) by branch-and-bound partition search (exact).

    ``edges`` is the SYMMETRIZED directed list (both (u,v) and (v,u)).
    ``initial_labels`` (optional) seeds the incumbent — any partition of
    the vertex set, e.g. a Louvain result; correctness does not depend on
    it, pruning speed does.
    """
    ids = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    n = len(ids)
    if n > max_n:
        raise ValueError(f"exact oracle limited to n<={max_n}, got {n}")
    idx = {v: i for i, v in enumerate(ids)}
    two_m = float(sum(w for _, _, w in edges))
    deg = np.zeros(n)
    adj = np.zeros((n, n))
    for u, v, w in edges:
        deg[idx[u]] += w
        adj[idx[u]][idx[v]] += w

    # search order: degree descending (hub placements constrain the bound
    # earliest); `order[k]` = original index placed at depth k
    order = sorted(range(n), key=lambda i: (-deg[i], i))
    perm = np.asarray(order)

    # modularity matrix in SEARCH order: B_uv = A_uv − d_u d_v / 2m
    dg = deg[perm]
    B = adj[np.ix_(perm, perm)] - np.outer(dg, dg) / two_m
    twoB = 2.0 * B
    pos2B = np.maximum(twoB, 0.0)

    # pairUB[k, i] = Σ_{i<=j<k} max(0, 2B_kj): prefix sums per row
    tril_pos = np.tril(pos2B, k=-1)
    cum = np.concatenate([np.zeros((n, 1)), np.cumsum(tril_pos, axis=1)], axis=1)
    row_tot = cum[np.arange(n), np.arange(n)]  # Σ_{j<k} pos2B[k,j]
    diagB = np.diag(B).copy()

    best_q = float("-inf")
    best: list[int] | None = None
    if initial_labels is not None:
        seed = [initial_labels[ids[order[k]]] for k in range(n)]
        remap: dict[int, int] = {}
        seed = [remap.setdefault(b, len(remap)) for b in seed]
        best_q = _modularity_of(B, seed, two_m) * two_m
        best = seed

    assign = [0] * n
    # S[b, k] = Σ_{assigned j in block b} 2B[k, j], maintained incrementally
    S = np.zeros((n, n))
    eps = 1e-12

    def rec(i: int, n_blocks: int, q_so_far: float) -> None:
        nonlocal best_q, best
        if i == n:
            if q_so_far > best_q:
                best_q = q_so_far
                best = assign.copy()
            return
        # dynamic admissible bound over unassigned suffix [i, n)
        sfx = slice(i, n)
        joins = S[:n_blocks, sfx].max(axis=0) if n_blocks else np.zeros(n - i)
        ub = float(
            diagB[sfx].sum()
            + np.maximum(joins, 0.0).sum()
            + (row_tot[sfx] - cum[sfx, i]).sum()
        )
        if q_so_far + ub <= best_q + eps:
            return
        # branch: child gain to block b is a free lookup S[b, i]
        for b in range(n_blocks + 1):  # restricted growth: 0..max_used+1
            assign[i] = b
            dq = diagB[i] + (S[b, i] if b < n_blocks else 0.0)
            S[b, i + 1 :] += twoB[i + 1 :, i]
            rec(i + 1, max(n_blocks, b + 1), q_so_far + dq)
            S[b, i + 1 :] -= twoB[i + 1 :, i]

    rec(0, 0, 0.0)
    assert best is not None
    return best_q / two_m, {ids[order[k]]: best[k] for k in range(n)}


def exact_max_modularity(
    edges: DataFrame,
    max_n: int = 24,
    initial_labels: dict[int, int] | None = None,
) -> tuple[float, dict[int, int]]:
    """Collect a small symmetrized edge DataFrame and solve exactly."""
    etup = [(r.src, r.dst, r.weight) for r in edges.select("src", "dst", "weight").collect()]
    return exact_max_modularity_py(etup, max_n=max_n, initial_labels=initial_labels)
