"""Weisfeiler–Lehman color refinement — iterated neighborhood hashing,
the structural-fingerprint primitive (graph-isomorphism screening,
structural-role grouping, GNN expressiveness baseline).

The reference engine has no structural-equivalence surface; labels
there always mean communities.  WL colors group vertices by local
structure instead: after r rounds, two vertices share a color iff
their radius-r unfolding trees hash identically.

Classic WL re-hashes the SORTED multiset of neighbor colors — a
collect_list + sort per vertex, which a 10^7-degree hub turns into a
single huge in-memory array (the same failure mode the BP kernel
avoided).  This implementation replaces the sorted concat with a
commutative fold over per-neighbor hash terms:

    term(u→v)  = md5_60(nbr_color ‖ '_' ‖ weight) mod P
    color'(v)  = (31·color(v) + Σ terms + 17·deg(v)) mod P

The Σ is a plain map-side-combinable SUM — hub-safe, one exchange per
round (the LPA plan shape: edges pre-partitioned by dst, the color
vector is the only thing that moves).  Commutative hashing admits more
collisions than sorted-concat in theory; with 60-bit terms reduced mod
P ≈ 2^30 the per-round pair-collision rate is ~n²/2P per color class —
negligible at test scale and documented here for 10^12-vertex runs
(raise P / double-hash if WL colors ever gate a correctness decision
at that scale).

All arithmetic is exact int64 in BOTH engines (terms < P ≈ 1e9; a sum
overflows only past ~9·10^9 neighbors, beyond any real vertex count),
so the DuckDB twin (wl_refinement_sql) matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.iterate import cache_partitioned, unpersist_checkpoint
from ..textops.portable import md5_long, md5_long_sql

WL_P = 1_000_000_007
WL_OWN_MULT = 31
WL_DEG_MULT = 17


def wl_refinement(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int = 3,
) -> DataFrame:
    """(id, color) after `rounds` WL refinement rounds.

    `edges` must be the SYMMETRIZED weighted table (src, dst, weight);
    init color = weighted degree mod P (the standard degree-partition
    start).  Isolated vertices never appear (no edge rows) — callers
    with a vertex table can union singletons with color = 0.
    """
    edges = cache_partitioned(edges.repartition("dst"))
    colors = (
        edges.groupBy(F.col("src").alias("id"))
        .agg((F.sum("weight") % WL_P).cast("long").alias("color"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        lbl = colors.select(F.col("id").alias("dst"), F.col("color").alias("nbr_color"))
        term = (
            md5_long(F.concat_ws("_", F.col("nbr_color"), F.col("weight"))) % WL_P
        )
        agg = (
            edges.join(lbl.hint("SHUFFLE_HASH"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(
                (F.sum(term) % WL_P).cast("long").alias("s"),
                F.count("*").cast("long").alias("cnt"),
            )
        )
        nxt = colors.join(agg, "id", "left").select(
            "id",
            (
                (
                    F.lit(WL_OWN_MULT) * F.col("color")
                    + F.coalesce("s", F.lit(0))
                    + F.lit(WL_DEG_MULT) * F.coalesce("cnt", F.lit(0))
                )
                % WL_P
            ).alias("color"),
        ).localCheckpoint(eager=True)
        unpersist_checkpoint(colors)
        colors = nxt
    unpersist_checkpoint(edges)
    return colors


def wl_color_histogram(colors: DataFrame) -> DataFrame:
    """(color, n) — the graph's WL fingerprint (compare two graphs by
    comparing histograms; unequal ⇒ non-isomorphic)."""
    return colors.groupBy("color").agg(F.count("*").cast("long").alias("n"))


def wl_refinement_sql(rounds: int = 3) -> str:
    """DuckDB twin as a CTE tail over a pre-defined symmetrized `edges`
    CTE (src, dst, weight) — compose as ``edges_cte + ",\\n" + this``,
    the pagerank_unrolled_sql convention."""
    term = md5_long_sql("concat(c.color, '_', e.weight)")
    parts = [
        f"c0 AS (SELECT src AS id, (SUM(weight) % {WL_P})::BIGINT AS color"
        f" FROM edges GROUP BY src)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""a{r} AS (
    SELECT e.src AS id,
           (SUM({term} % {WL_P}) % {WL_P})::BIGINT AS s,
           COUNT(*)::BIGINT AS cnt
    FROM edges e JOIN c{r - 1} c ON e.dst = c.id
    GROUP BY e.src
)"""
        )
        parts.append(
            f"""c{r} AS (
    SELECT c.id,
           (({WL_OWN_MULT} * c.color + COALESCE(a.s, 0)
             + {WL_DEG_MULT} * COALESCE(a.cnt, 0)) % {WL_P})::BIGINT AS color
    FROM c{r - 1} c LEFT JOIN a{r} a USING (id)
)"""
        )
    return ",\n".join(parts) + f"\nSELECT id, color FROM c{rounds}"
