"""Time-respecting reachability over the transcript reply graph.

A static edge table answers "who is connected to whom"; transcripts
carry one more constraint the static collapse throws away: information
can only flow FORWARD in time.  Actor B can pass to C at time t only
what B had already received strictly before t.  The right primitive is
temporal reachability over the timestamped contact sequence (Holme &
Saramäki, "Temporal networks", Phys. Rep. 519, 2012 §4): earliest-
arrival times along time-respecting paths.

The reference engine has no temporal notion at all — its stream driver
(scripts/overall_run.cpp:60-120) consumes edges in sequence order but
every query it answers is about the CURRENT static graph.  This
operator is where the engine exceeds that: "if X was compromised /
informed at time T, whom could it have reached by now, and when at the
earliest?" — the provenance / influence-propagation query a transcript
warehouse actually gets asked.

Algorithm — temporal Bellman–Ford on earliest arrival:

    arr_0(seed)  = t0 (default 0)
    arr_{i+1}(v) = min(arr_i(v),
                       min { t(u→v) : contact (u, v, t), t >= arr_i(u) })

Each superstep is ONE join of the (tiny, frontier-sized) arrival vector
against the contact table pre-partitioned by src, plus a min-aggregate:
the SSSP plan shape (operators/sssp.py), with the time-window predicate
pushed into the join filter.  Earliest-arrival is monotone (arrivals
only decrease), so `rounds` upper-bounds the temporal hop count; at
10^12 turns the contact table is the same reply extraction the engine
already shuffles once and the state is 16 bytes per REACHED vertex.

All arithmetic is exact int64 epoch-ms in both engines — the DuckDB
twin (temporal_reachability_sql) unrolls the rounds bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.events_transcripts import transcripts_cte_sql


def temporal_contacts(transcripts: DataFrame) -> DataFrame:
    """(src, dst, t_ms) directed contact sequence — information flows
    from the PREVIOUS turn's actor to the replying actor at the reply's
    timestamp, under stable turn ordering (the extract.reply_edges
    lag window, information-flow direction).  Self-contacts dropped."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        transcripts.withColumn("prev_role", F.lag("role").over(w))
        .filter(F.col("prev_role").isNotNull())
        .filter(F.col("prev_role") != F.col("role"))
        .select(
            F.col("prev_role").alias("src"),
            F.col("role").alias("dst"),
            F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        )
    )


def temporal_reachability(
    transcripts: DataFrame,
    seeds: list[str],
    rounds: int = 4,
    t0: int = 0,
) -> DataFrame:
    """(actor, arrival_ms) — earliest time-respecting arrival from the
    seed actors (arrival t0) within `rounds` temporal hops.  Only
    reached actors appear; seeds appear with arrival_ms = t0."""
    contacts = temporal_contacts(transcripts)
    spark = transcripts.sparkSession
    arr = spark.createDataFrame(
        [(s, int(t0)) for s in seeds], "actor string, arrival_ms long"
    )
    for _ in range(rounds):
        cand = (
            contacts.join(
                arr.withColumnRenamed("actor", "src"),
                "src",
            )
            .filter(F.col("t_ms") >= F.col("arrival_ms"))
            .select(F.col("dst").alias("actor"), F.col("t_ms").alias("arrival_ms"))
        )
        arr = (
            arr.unionByName(cand)
            .groupBy("actor")
            .agg(F.min("arrival_ms").cast("long").alias("arrival_ms"))
        )
    return arr


def temporal_reachability_sql(
    seeds: list[str],
    rounds: int = 4,
    t0: int = 0,
    events_filter: str = "",
) -> str:
    """Full DuckDB twin over the raw `events` table (composes the
    transcripts CTE itself — pass to DuckDB as-is)."""
    seed_rows = ", ".join(f"('{s}', {int(t0)})" for s in seeds)
    parts = [
        "WITH " + transcripts_cte_sql(events_filter),
        """contacts AS (
        SELECT prev_role AS src, role AS dst, epoch_ms(ts)::BIGINT AS t_ms
        FROM (
            SELECT role, ts,
                   LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
            FROM transcripts
        )
        WHERE prev_role IS NOT NULL AND prev_role <> role
    )""",
        f"r0 AS (SELECT * FROM (VALUES {seed_rows}) v(actor, arrival_ms))",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""r{i} AS (
        SELECT actor, MIN(arrival_ms)::BIGINT AS arrival_ms FROM (
            SELECT actor, arrival_ms::BIGINT AS arrival_ms FROM r{i - 1}
            UNION ALL
            SELECT c.dst AS actor, c.t_ms AS arrival_ms
            FROM r{i - 1} a JOIN contacts c
              ON c.src = a.actor AND c.t_ms >= a.arrival_ms
        ) GROUP BY actor
    )"""
        )
    return ",\n".join(parts) + f"\nSELECT actor, arrival_ms FROM r{rounds}"


def temporal_triangles(
    transcripts: DataFrame, delta_ms: int = 3_600_000
) -> DataFrame:
    """One row (n_cyclic, n_ffl) — δ-TEMPORAL triangle motifs over the
    transcript contact sequence (Paranjape, Benson, Leskovec, WSDM'17):
    a static triangle only says three actors are mutually linked; the
    temporal motif says the interaction CYCLED (u→v, then v→w, then
    w→u, all within ``delta_ms`` and in that order) or CASCADED
    (feed-forward u→v, u→w, v→w) — the information-flow signatures the
    static census (directed_triad_census) cannot distinguish from stale
    links.  Counts are over CONTACT EVENTS, not distinct edges: the
    same actor triple counts once per qualifying (t1 < t2 < t3 ≤ t1+δ)
    contact triple, per the paper's definition.

    Shape: two self-joins of the timestamped contact table with the
    time-window predicate INSIDE the join condition — the δ bound is
    the cost guard (each contact only joins contacts in its δ-window;
    at 10^12 turns pre-bucket contacts by ⌊t/δ⌋ and join adjacent
    buckets, the standard temporal-join partitioning).  Exact int64
    epoch-ms arithmetic; counts are exact."""
    c = temporal_contacts(transcripts)
    c1 = c.select(F.col("src").alias("u"), F.col("dst").alias("v"), F.col("t_ms").alias("t1"))
    c2 = c.select(F.col("src").alias("v"), F.col("dst").alias("w"), F.col("t_ms").alias("t2"))
    c3cyc = c.select(F.col("src").alias("w"), F.col("dst").alias("u"), F.col("t_ms").alias("t3"))
    wedges = (
        c1.join(c2, "v")
        .filter(
            (F.col("t2") > F.col("t1"))
            & (F.col("t2") <= F.col("t1") + delta_ms)
            & (F.col("w") != F.col("u"))
        )
    )
    cyc = (
        wedges.join(c3cyc, ["w", "u"])
        .filter(
            (F.col("t3") > F.col("t2"))
            & (F.col("t3") <= F.col("t1") + delta_ms)
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    c3ffl = c.select(F.col("src").alias("u"), F.col("dst").alias("w"), F.col("t_ms").alias("t3"))
    # feed-forward: u→v (t1), v→w (t2), u→w (t3) with t1 < t2 < t3 ≤ t1+δ
    ffl = (
        wedges.join(c3ffl, ["u", "w"])
        .filter(
            (F.col("t3") > F.col("t2"))
            & (F.col("t3") <= F.col("t1") + delta_ms)
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    return cyc.select(F.col("n").alias("n_cyclic")).crossJoin(
        ffl.select(F.col("n").alias("n_ffl"))
    )


def temporal_triangles_sql(
    delta_ms: int = 3_600_000, events_filter: str = ""
) -> str:
    """Full DuckDB twin over the raw `events` table."""
    return (
        "WITH "
        + transcripts_cte_sql(events_filter)
        + f""",
tt_c AS MATERIALIZED (
    SELECT prev_role AS src, role AS dst, epoch_ms(ts)::BIGINT AS t_ms
    FROM (
        SELECT role, ts,
               LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
        FROM transcripts
    )
    WHERE prev_role IS NOT NULL AND prev_role <> role
),
tt_wedge AS MATERIALIZED (
    SELECT a.src AS u, a.dst AS v, b.dst AS w, a.t_ms AS t1, b.t_ms AS t2
    FROM tt_c a JOIN tt_c b
      ON b.src = a.dst
     AND b.t_ms > a.t_ms AND b.t_ms <= a.t_ms + {delta_ms}
     AND b.dst <> a.src
),
tt_cyc AS (
    SELECT COUNT(*)::BIGINT AS n FROM tt_wedge x
    JOIN tt_c d ON d.src = x.w AND d.dst = x.u
    WHERE d.t_ms > x.t2 AND d.t_ms <= x.t1 + {delta_ms}
),
tt_ffl AS (
    SELECT COUNT(*)::BIGINT AS n FROM tt_wedge x
    JOIN tt_c d ON d.src = x.u AND d.dst = x.w
    WHERE d.t_ms > x.t2 AND d.t_ms <= x.t1 + {delta_ms}
)
SELECT (SELECT n FROM tt_cyc) AS n_cyclic, (SELECT n FROM tt_ffl) AS n_ffl"""
    )
