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
