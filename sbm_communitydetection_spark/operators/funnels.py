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

from pyspark.sql import DataFrame, Window
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


def event_transitions(events: DataFrame) -> DataFrame:
    """(prev_type, event_type, n, prob) — the per-user behavioral Markov
    chain: consecutive event-type bigrams under stable (ts, event_id)
    ordering, with row-conditional transition probabilities.  The
    behavioral analogue of the transcript role_transitions op.

    Shape: ONE user-keyed exchange feeds the lag() window, then a
    (prev, cur)-keyed count — type-pair cardinality is tiny, so the
    probability normalization join is broadcast-scale.  prob rounded to
    6 dp in both engines."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id", "ts", "event_id", "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = pairs.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return pairs.join(F.broadcast(tot), "prev_type").select(
        "prev_type",
        "event_type",
        "n",
        F.round(F.col("n") / F.col("tot"), 6).alias("prob"),
    )


def event_transitions_sql(table: str = "events") -> str:
    return f"""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM {table}
    ),
    pairs AS (
        SELECT prev_type, event_type, COUNT(*)::BIGINT AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    ),
    tot AS (SELECT prev_type, SUM(n) AS tot FROM pairs GROUP BY prev_type)
    SELECT p.prev_type, p.event_type, p.n, ROUND(p.n / CAST(t.tot AS DOUBLE), 6) AS prob
    FROM pairs p JOIN tot t USING (prev_type)
    """


def props_field_stats(events: DataFrame, field: str = "k") -> DataFrame:
    """(event_type, n_with_field, avg_field, max_field) — semi-structured
    column handling: extract a numeric field from the JSON ``props``
    string per event and aggregate per type.  get_json_object stays in
    whole-stage codegen (Jackson on the JVM) — the 10^12-row pattern
    for sparse telemetry props is extract-then-aggregate, never
    parse-into-Python.  avg rounded to 6 dp."""
    v = F.get_json_object(F.col("props"), f"$.{field}").cast("double")
    return (
        events.select("event_type", v.alias("v"))
        .groupBy("event_type")
        .agg(
            F.count("v").cast("long").alias("n_with_field"),
            F.round(F.avg("v"), 6).alias("avg_field"),
            F.max("v").alias("max_field"),
        )
    )


def props_field_stats_sql(table: str = "events", field: str = "k") -> str:
    return f"""
    SELECT event_type,
           COUNT(v)::BIGINT AS n_with_field,
           ROUND(AVG(v), 6) AS avg_field,
           MAX(v) AS max_field
    FROM (
        SELECT event_type,
               CAST(json_extract_string(props, '$.{field}') AS DOUBLE) AS v
        FROM {table}
    )
    GROUP BY event_type
    """


HOUR_MS = 3_600_000


def event_anomalies(
    events: DataFrame, z: int = 3, min_windows: int = 5, window_ms: int = HOUR_MS
) -> DataFrame:
    """(user_id, window_start, cnt, n_windows) — per-user activity BURSTS:
    fixed event-time windows where the user's event count exceeds their
    own mean by more than ``z`` standard deviations (abuse / runaway-agent
    / scraper signature; the per-user baseline makes heavy-but-steady
    users quiet).

    The z-test runs in EXACT integer arithmetic so the flag decision is
    engine-deterministic with no float rounding anywhere:

        cnt > μ + z·σ   ⟺   n·cnt − s > 0  AND
                            (n·cnt − s)² > z²·(n·ss − s²)

    with s = Σcnt, ss = Σcnt² over the user's n active windows (population
    σ over active windows — silence is baseline, not signal).

    Scale shape: one (user, window) count aggregate, one user-keyed
    moment aggregate (both map-side combinable), one join back keyed on
    user_id — the same two-aggregate shape as retention_cohorts; no
    windows over the event stream, no Python.
    """
    win = (
        F.floor(F.unix_millis(F.col("ts").cast("timestamp")) / window_ms).cast("long")
        * window_ms
    )
    wc = events.groupBy("user_id", win.alias("window_start")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    stats = wc.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("ss"),
    )
    dev = F.col("n") * F.col("cnt") - F.col("s")
    var_n2 = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    return (
        wc.join(stats, "user_id")
        .filter(
            (F.col("n") >= min_windows)
            & (dev > 0)
            & (dev * dev > F.lit(z * z) * var_n2)
        )
        .select("user_id", "window_start", "cnt", F.col("n").alias("n_windows"))
    )


def event_anomalies_sql(
    table: str = "events", z: int = 3, min_windows: int = 5, window_ms: int = HOUR_MS
) -> str:
    return f"""
    WITH wc AS (
        SELECT user_id,
               CAST(FLOOR(epoch_ms(ts) / {window_ms}) AS BIGINT) * {window_ms}
                   AS window_start,
               COUNT(*)::BIGINT AS cnt
        FROM {table}
        GROUP BY 1, 2
    ),
    stats AS (
        SELECT user_id, COUNT(*)::BIGINT AS n, SUM(cnt)::BIGINT AS s,
               SUM(cnt * cnt)::BIGINT AS ss
        FROM wc GROUP BY user_id
    )
    SELECT w.user_id, w.window_start, w.cnt, st.n AS n_windows
    FROM wc w JOIN stats st ON w.user_id = st.user_id
    WHERE st.n >= {min_windows}
      AND (st.n * w.cnt - st.s) > 0
      AND (st.n * w.cnt - st.s) * (st.n * w.cnt - st.s)
          > {z * z} * (st.n * st.ss - st.s * st.s)
    """
