"""ANSI-SQL oracle generators for the iterative graph algorithms.

The driver's correctness gate compares each Spark query against DuckDB
running plain SQL on the same parquet tables.  Iterative algorithms are
expressible there too:

* fixed-iteration PageRank / LPA  → mechanically UNROLLED CTE chains
  (r0 → r1 → ... → rN), one CTE pair per superstep;
* connected components            → transitive closure via WITH RECURSIVE
  + min-reachable-id aggregation (valid on symmetric edge tables);
* triangle counting               → canonical a<b<c three-way self-join.

All generators assume a CTE named ``edges(src, dst, weight)`` is already
defined (see sources/tpch_graph.lineitem_edges_sql) — SYMMETRIZED,
self-loop-free, so no dangling vertices exist and PageRank's dangling
term is exactly zero.
"""

from __future__ import annotations


def pagerank_unrolled_sql(n_iterations: int, damping: float = 0.85, round_to: int = 8) -> str:
    """Fixed-iteration PageRank over the `edges` CTE; returns (id, rank)."""
    parts = [
        "verts AS (SELECT DISTINCT src AS id FROM edges)",
        "nv AS (SELECT COUNT(*)::DOUBLE AS n FROM verts)",
        "outw AS (SELECT src, SUM(weight)::DOUBLE AS out_w FROM edges GROUP BY src)",
        "adj AS (SELECT e.src, e.dst, e.weight / o.out_w AS frac FROM edges e JOIN outw o ON e.src = o.src)",
        "r0 AS (SELECT id, 1.0 / (SELECT n FROM nv) AS rank FROM verts)",
    ]
    for i in range(1, n_iterations + 1):
        parts.append(
            f"""r{i} AS (
    SELECT v.id,
           (1.0 - {damping}) / (SELECT n FROM nv)
             + {damping} * COALESCE(s.c, 0.0) AS rank
    FROM verts v
    LEFT JOIN (
        SELECT a.dst AS id, SUM(a.frac * r.rank) AS c
        FROM adj a JOIN r{i - 1} r ON a.src = r.id
        GROUP BY a.dst
    ) s ON v.id = s.id
)"""
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT id, ROUND(rank, {round_to}) AS rank FROM r{n_iterations}"
    )


def lpa_unrolled_sql(n_iterations: int) -> str:
    """Fixed-iteration synchronous LPA (plain variant, min-label tie-break)
    over the `edges` CTE; labels init to vertex id; returns (id, label)."""
    parts = [
        "verts AS (SELECT DISTINCT src AS id FROM edges)",
        "l0 AS (SELECT id, id AS label FROM verts)",
    ]
    for i in range(1, n_iterations + 1):
        parts.append(
            f"""s{i} AS (
    SELECT e.src, l.label, SUM(e.weight) AS score
    FROM edges e JOIN l{i - 1} l ON e.dst = l.id
    GROUP BY e.src, l.label
),
l{i} AS (
    SELECT v.id, COALESCE(b.label, p.label) AS label
    FROM verts v
    JOIN l{i - 1} p ON v.id = p.id
    LEFT JOIN (
        SELECT src AS id, label FROM (
            SELECT src, label,
                   ROW_NUMBER() OVER (PARTITION BY src ORDER BY score DESC, label ASC) AS rn
            FROM s{i}
        ) WHERE rn = 1
    ) b ON v.id = b.id
)"""
        )
    return ",\n".join(parts) + f"\nSELECT id, label FROM l{n_iterations}"


def components_recursive_sql() -> str:
    """Exact components on the symmetric `edges` CTE: component = min
    reachable id, via recursive transitive closure (small-scale oracle
    only — the engine's large-star/small-star is the scale path)."""
    return """verts AS (SELECT DISTINCT src AS id FROM edges),
reach(u, v) AS (
    SELECT id, id FROM verts
    UNION
    SELECT r.u, e.dst FROM reach r JOIN edges e ON r.v = e.src
)
SELECT u AS id, MIN(v) AS component FROM reach GROUP BY u"""


def triangle_count_sql() -> str:
    """Global triangle count via canonical a<b<c ordering."""
    return """pairs AS (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
)
SELECT COUNT(*)::BIGINT AS triangles
FROM pairs p1
JOIN pairs p2 ON p1.b = p2.a
JOIN pairs p3 ON p3.a = p1.a AND p3.b = p2.b"""


def triangle_per_vertex_sql() -> str:
    """(id, tri_count) per vertex, 0 included."""
    return """pairs AS (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
),
tri AS (
    SELECT p1.a AS x, p1.b AS y, p2.b AS z
    FROM pairs p1
    JOIN pairs p2 ON p1.b = p2.a
    JOIN pairs p3 ON p3.a = p1.a AND p3.b = p2.b
),
verts AS (SELECT DISTINCT src AS id FROM edges),
cnt AS (
    SELECT id, COUNT(*)::BIGINT AS c FROM (
        SELECT x AS id FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
    ) GROUP BY id
)
SELECT v.id, COALESCE(cnt.c, 0)::BIGINT AS tri_count
FROM verts v LEFT JOIN cnt ON v.id = cnt.id"""


def modularity_sql(n_labels: int) -> str:
    """Modularity of the label=id%n_labels partition (A4 community form,
    utils/utilities.cpp:25-78): Q = Σ_c [e_in2_c/2m − (deg_c/2m)²]."""
    return f"""labels AS (SELECT DISTINCT src AS id, src % {n_labels} AS label FROM edges),
el AS (
    SELECT e.weight, ls.label AS sl, ld.label AS dl
    FROM edges e
    JOIN labels ls ON e.src = ls.id
    JOIN labels ld ON e.dst = ld.id
),
tot AS (SELECT SUM(weight)::DOUBLE AS two_m FROM edges),
per AS (
    SELECT sl AS label,
           SUM(CASE WHEN sl = dl THEN weight ELSE 0 END)::DOUBLE AS e_in2,
           SUM(weight)::DOUBLE AS deg
    FROM el GROUP BY sl
)
SELECT ROUND(SUM(e_in2 / t.two_m - (deg / t.two_m) * (deg / t.two_m)), 8) AS modularity
FROM per, tot t"""
