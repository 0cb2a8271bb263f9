"""Event-sequence warehouse analytics: conversion funnels and retention
cohorts over the raw `events` table (axis-B analytics beside the
transcript-derived graph).

Both ops are compositions of keyed filters/joins/aggregates — no window
over the event stream, no per-row Python — so they hold at 10^12 events:
each funnel stage is one filtered scan + one user-keyed join + one
user-keyed min-aggregate (all map-side combinable / co-partitionable on
user_id), and the cohort matrix is two stacked user-keyed aggregates.
All time arithmetic is integer epoch math (identical in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FUNNEL_STEPS = ("view", "click", "purchase")
WEEK_MS = 7 * 86_400_000


def event_funnel(
    events: DataFrame, steps: tuple[str, ...] = FUNNEL_STEPS
) -> DataFrame:
    """(step_idx, step, n_users) — STRICTLY ORDERED conversion funnel:
    a user counts for step k only with an occurrence of steps[k] at a
    strictly later timestamp than their earliest qualifying chain
    through steps[0..k-1] (the classic warehouse funnel, not a bag-of-
    events intersection).

    Per stage: one filtered scan of the event table + one user-keyed
    equi-join against the (tiny, shrinking) qualified-user set + one
    min-aggregate.  Stage outputs are one row per qualified user, so
    the join side collapses monotonically down-funnel.
    """
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    reached: DataFrame | None = None
    out = None
    for i, step in enumerate(steps):
        ev = events.filter(F.col("event_type") == step).select(
            "user_id", ms.alias("ms")
        )
        if reached is None:
            reached = ev.groupBy("user_id").agg(F.min("ms").alias("t"))
        else:
            reached = (
                ev.join(reached.withColumnRenamed("t", "t_prev"), "user_id")
                .filter(F.col("ms") > F.col("t_prev"))
                .groupBy("user_id")
                .agg(F.min("ms").alias("t"))
            )
        row = reached.agg(
            F.lit(i + 1).alias("step_idx"),
            F.lit(step).alias("step"),
            F.count("*").cast("long").alias("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def event_funnel_sql(
    table: str = "events", steps: tuple[str, ...] = FUNNEL_STEPS
) -> str:
    parts = [
        f"""s1 AS (
        SELECT user_id, MIN(epoch_ms(ts)) AS t
        FROM {table} WHERE event_type = '{steps[0]}' GROUP BY user_id
    )"""
    ]
    for i, step in enumerate(steps[1:], start=2):
        parts.append(
            f"""s{i} AS (
        SELECT e.user_id, MIN(epoch_ms(e.ts)) AS t
        FROM {table} e JOIN s{i - 1} p ON e.user_id = p.user_id
        WHERE e.event_type = '{step}' AND epoch_ms(e.ts) > p.t
        GROUP BY e.user_id
    )"""
        )
    selects = [
        f"SELECT {i + 1}::INT AS step_idx, '{s}' AS step,"
        f" COUNT(*)::BIGINT AS n_users FROM s{i + 1}"
        for i, s in enumerate(steps)
    ]
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


def retention_cohorts(events: DataFrame) -> DataFrame:
    """(cohort_week, week_offset, n_users) — weekly retention matrix:
    users bucketed by their first-activity epoch-week, counted once per
    later epoch-week they return.  Integer epoch-week arithmetic (no
    calendar functions) keeps both engines bit-identical.

    Two stacked user-keyed aggregates (first week per user, then
    distinct (user, week)) and one bounded matrix aggregate — the
    classic shape that survives any event volume.
    """
    week = F.floor(F.unix_millis(F.col("ts").cast("timestamp")) / WEEK_MS).cast(
        "long"
    )
    uw = events.select("user_id", week.alias("week")).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        uw.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def retention_cohorts_sql(table: str = "events") -> str:
    return f"""
    WITH uw AS (
        SELECT DISTINCT user_id,
               CAST(FLOOR(epoch_ms(ts) / {WEEK_MS}) AS BIGINT) AS week
        FROM {table}
    ),
    cohort AS (
        SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id
    )
    SELECT c.cohort_week, uw.week - c.cohort_week AS week_offset,
           COUNT(*)::BIGINT AS n_users
    FROM uw JOIN cohort c ON uw.user_id = c.user_id
    GROUP BY 1, 2
    """
