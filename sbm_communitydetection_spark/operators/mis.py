"""Maximal independent set via Luby's algorithm with portable-hash
priorities (Luby, SIAM J. Comput. 1986) — the classic O(log n)-round
parallel MIS, RNG-free here: each round's priority is the 60-bit
portable hash of (round, vertex), so the selected set is deterministic,
partition-independent, and bit-identical in the unrolled DuckDB twin.

Round r over the live subgraph: a vertex enters the MIS iff its
priority is a strict minimum over its live neighborhood (ties broken by
id — impossible for the 60-bit hash in practice, but the tie column
keeps the determinism contract airtight); winners and their neighbors
leave the graph.  Every round is one neighbor-min aggregation + two
semi/anti-joins — the LPA/CC exchange discipline, no new shuffle shapes.

Scale: the live edge set shrinks geometrically (each round removes the
winners' closed neighborhoods); rounds are O(log n) w.h.p. and each is
a single src-keyed aggregate over the remaining pairs.  No reference
analogue (north-star §2.13 scope: standard link-graph algorithm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.iterate import unpersist_checkpoint
from ..textops.portable import md5_long, md5_long_sql


def _priority(round_no: int, col):
    return md5_long(F.concat_ws(":", F.lit("mis"), F.lit(str(round_no)), col.cast("string")))


def maximal_independent_set(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 40,
) -> DataFrame:
    """(id, mis_round) — every vertex of the maximal independent set with
    the round that selected it.  Isolated vertices (self-loop-only) are
    always independent and join in round 1.  Raises if the graph has not
    been exhausted after ``max_rounds`` (silent truncation would return a
    non-maximal set)."""
    sym = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .unionByName(
            edges.filter(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
    )
    all_ids = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    # vertices with at least one non-loop neighbor contend round by round;
    # the rest are independent by vacuity
    contested = sym.select(F.col("src").alias("id")).distinct()
    isolated = all_ids.join(contested, "id", "left_anti").select(
        "id", F.lit(1).alias("mis_round")
    )

    live = sym.localCheckpoint(eager=True)
    winners = [isolated]
    owned = [live]
    for r in range(1, max_rounds + 1):
        if live.limit(1).count() == 0:
            break
        # min neighbor priority per live vertex (every live vertex has ≥1
        # neighbor, by construction of the shrinking edge set)
        nbr_min = live.groupBy("src").agg(
            F.min(F.struct(_priority(r, F.col("dst")).alias("p"), F.col("dst").alias("i"))).alias(
                "nmin"
            )
        )
        win = nbr_min.filter(
            F.struct(_priority(r, F.col("src")).alias("p"), F.col("src").alias("i"))
            < F.col("nmin")
        ).select(F.col("src").alias("id"))
        win = win.localCheckpoint(eager=True)
        owned.append(win)
        winners.append(win.select("id", F.lit(r).alias("mis_round")))
        # drop winners and their neighbors from the live subgraph
        dead = win.unionByName(
            live.join(win.select(F.col("id").alias("src")), "src", "left_semi").select(
                F.col("dst").alias("id")
            )
        ).distinct()
        nxt = (
            live.join(dead.select(F.col("id").alias("src")), "src", "left_anti")
            .join(dead.select(F.col("id").alias("dst")), "dst", "left_anti")
            .select("src", "dst")
        ).localCheckpoint(eager=True)
        owned.append(nxt)
        live = nxt
    else:
        if live.limit(1).count() != 0:
            raise RuntimeError(
                f"maximal_independent_set: live vertices remain after "
                f"max_rounds={max_rounds} — returning would be non-maximal"
            )

    out = winners[0]
    for w in winners[1:]:
        out = out.unionByName(w)
    result = out.select("id", F.col("mis_round").cast("int").alias("mis_round"))
    result = result.localCheckpoint(eager=True)
    for df in owned:
        unpersist_checkpoint(df)
    return result


def maximal_independent_set_sql(rounds: int) -> str:
    """DuckDB twin over the `edges` CTE — same priorities, ``rounds``
    unrolled Luby rounds (the gate graph exhausts well within)."""
    pri = lambda r, col: md5_long_sql(f"'mis:{r}:' || CAST({col} AS VARCHAR)")
    parts = [
        """msym AS MATERIALIZED (
    SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM edges WHERE src <> dst
        UNION ALL SELECT dst, src FROM edges WHERE src <> dst
    )
)""",
        """mall AS (
    SELECT DISTINCT id FROM (
        SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges
    )
)""",
        """live0 AS MATERIALIZED (SELECT src, dst FROM msym)""",
        """iso AS (
    SELECT id, 1 AS mis_round FROM mall
    WHERE id NOT IN (SELECT src FROM msym)
)""",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""nm{r} AS MATERIALIZED (
    SELECT src, MIN(ROW({pri(r, "dst")}, dst)) AS nmin
    FROM live{r - 1} GROUP BY src
),
win{r} AS MATERIALIZED (
    SELECT src AS id FROM nm{r}
    WHERE ROW({pri(r, "src")}, src) < nmin
),
dead{r} AS MATERIALIZED (
    SELECT id FROM win{r}
    UNION
    SELECT l.dst AS id FROM live{r - 1} l JOIN win{r} w ON l.src = w.id
),
live{r} AS MATERIALIZED (
    SELECT src, dst FROM live{r - 1}
    WHERE src NOT IN (SELECT id FROM dead{r})
      AND dst NOT IN (SELECT id FROM dead{r})
)"""
        )
    unions = "\nUNION ALL\n".join(
        [f"SELECT id, {r} AS mis_round FROM win{r}" for r in range(1, rounds + 1)]
        + ["SELECT id, mis_round FROM iso"]
    )
    return ",\n".join(parts) + f"\nSELECT id, mis_round::INT AS mis_round FROM ({unions})"
