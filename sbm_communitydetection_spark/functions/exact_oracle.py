"""D4 — exact modularity maximization oracle (reference src/ip_solver.cpp).

The reference formulates modularity maximization as an ILP over n² binary
co-membership variables with O(n³) transitivity constraints, solved by
SCIP via OR-Tools (src/ip_solver.cpp:43-163) — usable only for tiny
graphs, and kept by the reference as a validation oracle. No ILP solver
ships in this sandbox, so the engine's oracle is exhaustive set-partition
enumeration (restricted growth strings), exact for n ≤ ~12 (Bell(12) ≈
4.2M) — the same role at the same scale: validate that LPA / Louvain / FM
reach (near-)optimal modularity on driver-collected test graphs.

Pure driver-side python on a COLLECTED subgraph — deliberately not a
Spark op (SURVEY.md §2.9 D4: "Not a Spark op").
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def exact_max_modularity_py(
    edges: list[tuple[int, int, int]], max_n: int = 12
) -> tuple[float, dict[int, int]]:
    """(best_Q, labels) by exhaustive partition enumeration.

    ``edges`` is the SYMMETRIZED directed list (both (u,v) and (v,u)).
    """
    ids = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    n = len(ids)
    if n > max_n:
        raise ValueError(f"exact oracle limited to n<={max_n}, got {n}")
    idx = {v: i for i, v in enumerate(ids)}
    two_m = float(sum(w for _, _, w in edges))
    deg = [0.0] * n
    adj = [[0.0] * n for _ in range(n)]
    for u, v, w in edges:
        deg[idx[u]] += w
        adj[idx[u]][idx[v]] += w

    # modularity matrix B_uv = A_uv − d_u d_v / 2m (summed over directed
    # entries and divided by 2m gives Q); Q(partition) = Σ same-block B/2m
    B = [
        [adj[u][v] - deg[u] * deg[v] / two_m for v in range(n)]
        for u in range(n)
    ]

    best_q = float("-inf")
    best: list[int] | None = None
    assign = [0] * n

    def rec(i: int, n_blocks: int, q_so_far: float) -> None:
        nonlocal best_q, best
        if i == n:
            if q_so_far > best_q:
                best_q = q_so_far
                best = assign.copy()
            return
        for b in range(n_blocks + 1):  # restricted growth: 0..max_used+1
            assign[i] = b
            dq = B[i][i] + 2.0 * sum(B[i][j] for j in range(i) if assign[j] == b)
            rec(i + 1, max(n_blocks, b + 1), q_so_far + dq)

    rec(0, 0, 0.0)
    assert best is not None
    return best_q / two_m, {ids[i]: best[i] for i in range(n)}


def exact_max_modularity(edges: DataFrame, max_n: int = 12) -> tuple[float, dict[int, int]]:
    """Collect a small symmetrized edge DataFrame and solve exactly."""
    etup = [(r.src, r.dst, r.weight) for r in edges.select("src", "dst", "weight").collect()]
    return exact_max_modularity_py(etup, max_n=max_n)
