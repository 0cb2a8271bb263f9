"""Pure-Python reference implementations (no Spark) for algorithm parity.

These mirror the engine's exact semantics (weighted, min-label tie-breaks,
uniform dangling redistribution) so results can be compared allclose(1e-6)
/ exactly, per BASELINE.md targets.
"""

from __future__ import annotations

from collections import defaultdict


def pagerank_oracle(edges, damping=0.85, tol=1e-8, max_iter=100, vertices=None):
    """edges: iterable of (src, dst, weight) DIRECTED. Returns {id: rank}."""
    out_w = defaultdict(float)
    adj = defaultdict(list)
    verts = set(vertices or [])
    for s, d, w in edges:
        out_w[s] += w
        adj[s].append((d, w))
        verts.add(s)
        verts.add(d)
    n = len(verts)
    rank = {v: 1.0 / n for v in verts}
    base = (1.0 - damping) / n
    for _ in range(max_iter):
        dangling = sum(rank[v] for v in verts if out_w[v] == 0.0)
        contrib = defaultdict(float)
        for s, targets in adj.items():
            rs = rank[s] / out_w[s]
            for d, w in targets:
                contrib[d] += rs * w
        new = {v: base + damping * (contrib[v] + dangling / n) for v in verts}
        delta = max(abs(new[v] - rank[v]) for v in verts)
        rank = new
        if delta <= tol:
            break
    return rank


def components_oracle(edges, vertices=None):
    """Union-find; component id = min member id. Returns {id: component}."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for s, d in edges:
        union(s, d)
    for v in vertices or []:
        find(v)
    return {v: find(v) for v in parent}


def lpa_oracle(edges, vertices=None, max_iter=30, initial=None, variant="plain"):
    """Synchronous weighted LPA, min-label tie-break. edges: (src, dst, weight)
    SYMMETRIZED. variant: 'plain' or 'keep_own' (move only on strict
    improvement over current label's score).
    Returns ({id: label}, iterations, converged)."""
    adj = defaultdict(list)
    verts = set(vertices or [])
    for s, d, w in edges:
        adj[s].append((d, w))
        verts.add(s)
        verts.add(d)
    label = dict(initial) if initial else {v: v for v in verts}
    for i in range(1, max_iter + 1):
        new = {}
        for v in verts:
            if not adj[v]:
                new[v] = label[v]
                continue
            score = defaultdict(float)
            for d, w in adj[v]:
                score[label[d]] += w
            best_l, best_s = max(score.items(), key=lambda kv: (kv[1], -kv[0]))
            if variant == "keep_own" and score.get(label[v], 0.0) >= best_s:
                new[v] = label[v]
            else:
                new[v] = best_l
        changed = sum(1 for v in verts if new[v] != label[v])
        label = new
        if changed == 0:
            return label, i, True
    return label, max_iter, False


def triangles_oracle(edges):
    """edges: (src, dst) any direction/dupes. Returns ({id: count}, total)."""
    nbrs = defaultdict(set)
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    per = defaultdict(int)
    total = 0
    seen = set()
    for a in nbrs:
        for b in nbrs[a]:
            if b <= a:
                continue
            for c in nbrs[a] & nbrs[b]:
                if c > b:
                    tri = (a, b, c)
                    if tri not in seen:
                        seen.add(tri)
                        total += 1
                        per[a] += 1
                        per[b] += 1
                        per[c] += 1
    return per, total


def modularity_oracle(edges, labels):
    """Q = Σ_c [e_in_c/m − (deg_c/2m)²]; edges SYMMETRIZED (src,dst,weight).

    Matches utils/quality_measures.cpp:3-41 (weighted degree; each
    undirected edge counted once via sum(weight)/2).
    """
    two_m = sum(w for _, _, w in edges)  # symmetrized: = 2m
    if two_m == 0:
        return 0.0
    e_in = defaultdict(float)  # 2 * intra weight per community
    deg = defaultdict(float)
    for s, d, w in edges:
        deg[labels[s]] += w
        if labels[s] == labels[d]:
            e_in[labels[s]] += w
    return sum(e_in[c] / two_m - (deg[c] / two_m) ** 2 for c in deg)
