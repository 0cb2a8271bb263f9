"""Transcript table derived from the driver's `events` testdata.

The synthetic generator (sources/transcripts.py) gives the engine its
PLANTED-ground-truth input, but its xxhash64 actor ids cannot be mirrored
in ANSI SQL, so the extraction pipeline itself had only pytest coverage in
round 1.  This module maps the driver's `events` parquet table — already
conversation-shaped: (event_id, ts, user_id, event_type, value, props) —
onto the BASELINE.json input_hint schema

    transcripts(conv_id, turn_idx, role, text, tool, ts)

identically in Spark and DuckDB SQL:

    conv_id  = 'u' || user_id               (one conversation per user)
    turn_idx = row_number() over (partition by user_id
                                  order by ts, event_id) - 1
                                  -- STABLE turn ordering (event_id
                                  -- tie-break; input_hint invariant)
    role     = event_type                   (small actor domain: the
                                             event types are the
                                             "agents"; hubs arise
                                             naturally from frequency)
    text     = props                        (carried through verbatim —
                                             the per-turn text-equality
                                             invariant is asserted on it)
    tool     = 'tool_' || (event_id % 7)  when event_id % 5 = 0 else NULL

so the full extract pipeline (operators/extract.py: lag-window reply
links + tool-invocation links + symmetrize) gains a DuckDB-checkable
oracle.  Actor ids are mapped back to string actor_keys on output (join
against the extracted vertex table) because DuckDB has no xxhash64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_TOOL_NAMES = 7
TOOL_EVERY = 5


def events_transcripts(
    spark: SparkSession, sf_dir: str, before_ms: int | None = None
) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) from events.

    ``before_ms`` keeps only events with epoch-ms strictly below it —
    the as-of-time snapshot input for temporal drift queries (turn
    indices are recomputed over the surviving events, i.e. the
    transcript exactly as it stood then)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if before_ms is not None:
        ev = ev.filter(F.unix_millis(F.col("ts").cast("timestamp")) < before_ms)
    ev = ev.withColumn(
        "conv_id", F.concat(F.lit("u"), F.col("user_id").cast("string"))
    )
    # Partition the turn-ordering window by the DERIVED conv_id (1:1 with
    # user_id, so semantics are identical): downstream extraction windows
    # partition by conv_id, and keying this window the same way lets them
    # reuse this exchange instead of re-shuffling the whole turn table
    # (measured: 5 → 3 exchanges in the extract_graph physical plan).
    w = Window.partitionBy("conv_id").orderBy("ts", "event_id")
    return ev.select(
        "conv_id",
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.when(
            F.pmod(F.col("event_id"), F.lit(TOOL_EVERY)) == 0,
            F.concat(F.lit("tool_"), F.pmod(F.col("event_id"), F.lit(N_TOOL_NAMES)).cast("string")),
        ).alias("tool"),
        "ts",
    )


def transcripts_cte_sql(events_filter: str = "") -> str:
    """DuckDB-equivalent of events_transcripts as a CTE named
    `transcripts`; ``events_filter`` is an optional WHERE predicate over
    the raw events table (mirrors events_transcripts(before_ms=...))."""
    where = f"WHERE {events_filter}" if events_filter else ""
    return f"""
    transcripts AS (
        SELECT
            'u' || CAST(user_id AS VARCHAR) AS conv_id,
            (ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1)::INT
                AS turn_idx,
            event_type AS role,
            props AS text,
            CASE WHEN event_id % {TOOL_EVERY} = 0
                 THEN 'tool_' || CAST(event_id % {N_TOOL_NAMES} AS VARCHAR)
            END AS tool,
            ts
        FROM events {where}
    )
    """


def actor_edges_cte_sql(events_filter: str = "") -> str:
    """The extracted transcript link graph as a CTE chain ending in
    `edges(src, dst, weight)` over STRING actor keys — the composition
    point for graph algorithms over the transcript graph (mirrors
    extract.extract_edges exactly)."""
    return (
        transcripts_cte_sql(events_filter)
        + """,
    lagged AS (
        SELECT role,
               LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role,
               tool
        FROM transcripts
    ),
    raw AS (
        SELECT role AS src_key, prev_role AS dst_key, 1::BIGINT AS weight
        FROM lagged WHERE prev_role IS NOT NULL
        UNION ALL
        SELECT role AS src_key, 'tool:' || tool AS dst_key, 1::BIGINT AS weight
        FROM transcripts WHERE tool IS NOT NULL
    ),
    sym AS (
        SELECT src_key, dst_key, weight FROM raw
        UNION ALL
        SELECT dst_key AS src_key, src_key AS dst_key, weight FROM raw
    ),
    edges AS (
        SELECT src_key AS src, dst_key AS dst, SUM(weight)::BIGINT AS weight
        FROM sym WHERE src_key <> dst_key
        GROUP BY src_key, dst_key
        HAVING SUM(weight) <> 0
    )
    """
    )


def conv_structure_docs_cte_sql(name: str = "conv_docs") -> str:
    """CTE twin of operators/extract.conv_structure_docs: each
    conversation as its turn-ordered `role[:tool]` token sequence,
    shaped (doc_id, text) so the textops dedup SQL builders can run on
    it verbatim (pass table=<name>)."""
    return f"""
    {name} AS (
        SELECT conv_id AS doc_id,
               string_agg(role || COALESCE(':' || tool, ''), ' ' ORDER BY turn_idx)
                   AS text
        FROM transcripts GROUP BY conv_id
    )
    """


def reply_edges_oracle_sql() -> str:
    """Full extraction oracle: transcript reply + tool links, symmetrized
    on STRING actor keys (the engine's xxhash64 ids are joined back to
    keys on the Spark side)."""
    return (
        "WITH "
        + actor_edges_cte_sql()
        + "SELECT src AS src_key, dst AS dst_key, weight FROM edges"
    )


def turn_text_oracle_sql() -> str:
    """Per-turn text-equality oracle (input_hint invariant): every
    (conv_id, turn_idx, text) must survive the actor-annotation step of
    the extraction pipeline byte-identical, under stable turn ordering."""
    return (
        "WITH "
        + transcripts_cte_sql()
        + "SELECT conv_id, turn_idx, text FROM transcripts"
    )


def conv_stats_oracle_sql() -> str:
    """Mirror of operators/extract.conv_stats over the transcripts CTE."""
    return (
        "WITH "
        + transcripts_cte_sql()
        + """
    SELECT conv_id,
           COUNT(*)::BIGINT AS n_turns,
           COUNT(DISTINCT role)::BIGINT AS n_actors,
           COUNT(tool)::BIGINT AS n_tool_calls,
           (epoch_ms(MAX(ts)) - epoch_ms(MIN(ts)))::BIGINT AS duration_ms
    FROM transcripts GROUP BY conv_id
    """
    )


def role_transitions_oracle_sql() -> str:
    """Mirror of operators/extract.role_transitions."""
    return (
        "WITH "
        + transcripts_cte_sql()
        + """,
    lagged AS (
        SELECT LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS role_from,
               role AS role_to
        FROM transcripts
    )
    SELECT role_from, role_to, COUNT(*)::BIGINT AS n
    FROM lagged WHERE role_from IS NOT NULL
    GROUP BY role_from, role_to
    """
    )


def reply_latency_stats_oracle_sql() -> str:
    """Mirror of operators/extract.reply_latency_stats (per directed
    role pair: reply count + exact-integer-sum average / max gap)."""
    return (
        "WITH "
        + transcripts_cte_sql()
        + """,
    lagged AS (
        SELECT LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS role_from,
               role AS role_to,
               epoch_ms(ts) - LAG(epoch_ms(ts))
                   OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap_ms
        FROM transcripts
    )
    SELECT role_from, role_to, COUNT(*)::BIGINT AS n,
           ROUND(SUM(gap_ms) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_gap_ms,
           MAX(gap_ms)::BIGINT AS max_gap_ms
    FROM lagged WHERE role_from IS NOT NULL
    GROUP BY role_from, role_to
    """
    )


def tool_cooccurrence_oracle_sql() -> str:
    """Mirror of operators/extract.tool_cooccurrence (conversations
    invoking both tools, per unordered tool pair)."""
    return (
        "WITH "
        + transcripts_cte_sql()
        + """,
    ct AS (SELECT DISTINCT conv_id, tool FROM transcripts WHERE tool IS NOT NULL)
    SELECT a.tool AS tool_a, b.tool AS tool_b, COUNT(*)::BIGINT AS n_convs
    FROM ct a JOIN ct b ON a.conv_id = b.conv_id AND a.tool < b.tool
    GROUP BY a.tool, b.tool
    """
    )


def reply_reciprocity_oracle_sql() -> str:
    """Mirror of operators/extract.reply_reciprocity (weighted
    reciprocity over the directed role-transition aggregate)."""
    return (
        "WITH "
        + transcripts_cte_sql()
        + """,
    lagged AS (
        SELECT LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS role_from,
               role AS role_to
        FROM transcripts
    ),
    t AS (
        SELECT role_from, role_to, COUNT(*)::BIGINT AS n
        FROM lagged WHERE role_from IS NOT NULL AND role_from <> role_to
        GROUP BY role_from, role_to
    )
    SELECT ROUND(SUM(LEAST(a.n, COALESCE(b.n, 0))) / CAST(SUM(a.n) AS DOUBLE), 6)
               AS reciprocity
    FROM t a LEFT JOIN t b ON a.role_from = b.role_to AND a.role_to = b.role_from
    """
    )


def sessionize_oracle_sql(gap_ms: int) -> str:
    """Per-turn session index (streaming stateful sessionizer's oracle):
    the same lag/running-sum formulation as session_stats, emitted
    per (conv_id, turn_idx) instead of rolled up."""
    return (
        "WITH "
        + transcripts_cte_sql()
        + f""",
    lagged AS (
        SELECT conv_id, turn_idx, epoch_ms(ts) AS ms,
               LAG(epoch_ms(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_ms
        FROM transcripts
    )
    SELECT conv_id, turn_idx,
           SUM(CASE WHEN prev_ms IS NOT NULL AND ms - prev_ms > {gap_ms}
                    THEN 1 ELSE 0 END)
               OVER (PARTITION BY conv_id ORDER BY turn_idx
                     ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx
    FROM lagged
    """
    )


def session_stats_oracle_sql(gap_ms: int) -> str:
    """Mirror of operators/extract.session_stats: running-sum-of-boundaries
    sessionization + per-session rollup."""
    return (
        "WITH "
        + transcripts_cte_sql()
        + f""",
    lagged AS (
        SELECT conv_id, turn_idx, epoch_ms(ts) AS ms,
               LAG(epoch_ms(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_ms
        FROM transcripts
    ),
    flagged AS (
        SELECT conv_id, ms,
               SUM(CASE WHEN prev_ms IS NOT NULL AND ms - prev_ms > {gap_ms}
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY conv_id ORDER BY turn_idx
                         ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx
        FROM lagged
    )
    SELECT conv_id, session_idx, COUNT(*)::BIGINT AS n_turns,
           (MAX(ms) - MIN(ms))::BIGINT AS duration_ms
    FROM flagged GROUP BY conv_id, session_idx
    """
    )


def decayed_reply_edges_oracle_sql(half_life_ms: float, round_to: int = 6) -> str:
    """Oracle twin of extract.decayed_reply_edges over the events-derived
    transcripts (identical expression association: 2^(-((t_max - t)/hl)))."""
    return (
        "WITH "
        + transcripts_cte_sql()
        + f""",
    tmax AS (SELECT MAX(epoch_ms(ts)) AS t FROM transcripts),
    lagged AS (
        SELECT role,
               LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role,
               ts
        FROM transcripts
    ),
    raw AS (
        SELECT role AS src_key, prev_role AS dst_key,
               POWER(2.0, -(((SELECT t FROM tmax) - epoch_ms(ts)) / {float(half_life_ms)})) AS weight
        FROM lagged WHERE prev_role IS NOT NULL
    ),
    sym AS (
        SELECT src_key, dst_key, weight FROM raw
        UNION ALL
        SELECT dst_key AS src_key, src_key AS dst_key, weight FROM raw
    )
    SELECT src_key, dst_key, ROUND(SUM(weight), {round_to}) AS weight
    FROM sym WHERE src_key <> dst_key
    GROUP BY src_key, dst_key
    """
    )


def prompt_response_pairs_oracle_sql() -> str:
    """Mirror of operators/extract.prompt_response_pairs."""
    return f"""
    WITH {transcripts_cte_sql()},
    lagged AS (
        SELECT conv_id, turn_idx,
               LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prompt_role,
               role AS response_role,
               LAG(text) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prompt_text,
               text AS response_text
        FROM transcripts
    )
    SELECT conv_id, turn_idx, prompt_role, response_role, prompt_text, response_text
    FROM lagged
    WHERE prompt_role IS NOT NULL AND prompt_role != response_role
    """


def dpo_pairs_oracle_sql(k_per_prompt: int = 3) -> str:
    """Mirror of operators/extract.dpo_pair_candidates."""
    return f"""
    WITH {transcripts_cte_sql()},
    lagged AS (
        SELECT conv_id, turn_idx,
               LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prompt_role,
               role AS response_role,
               LAG(text) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prompt_text,
               text AS response_text
        FROM transcripts
    ),
    pairs AS (
        SELECT conv_id, turn_idx, prompt_text, response_text
        FROM lagged
        WHERE prompt_role IS NOT NULL AND prompt_role != response_role
    ),
    reps AS (
        SELECT prompt_text, conv_id, turn_idx, response_text,
               ROW_NUMBER() OVER (PARTITION BY prompt_text
                                  ORDER BY conv_id, turn_idx) AS rk
        FROM pairs
        QUALIFY rk <= {k_per_prompt}
    )
    SELECT a.prompt_text,
           a.conv_id AS conv_a, a.turn_idx AS turn_a, a.response_text AS response_a,
           b.conv_id AS conv_b, b.turn_idx AS turn_b, b.response_text AS response_b
    FROM reps a JOIN reps b ON a.prompt_text = b.prompt_text AND a.rk < b.rk
    WHERE a.response_text != b.response_text
    """


def context_windows_oracle_sql(k: int = 3) -> str:
    """Mirror of operators/extract.context_windows."""
    return f"""
    WITH {transcripts_cte_sql()},
    framed AS (
        SELECT conv_id, turn_idx, role AS response_role,
               string_agg(role || ': ' || text, chr(10)) OVER (
                   PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN {k} PRECEDING AND 1 PRECEDING
               ) AS context,
               text AS response
        FROM transcripts
    )
    SELECT conv_id, turn_idx, response_role, context, response
    FROM framed WHERE context IS NOT NULL
    """


def conv_novelty_oracle_sql() -> str:
    """Mirror of operators/extract.conv_novelty (first-occurrence
    ownership via ROW_NUMBER over the same (start_ms, conv_id) order)."""
    from ..textops.portable import shingles_sql

    return f"""
    WITH {transcripts_cte_sql()},
    bg AS (
        SELECT DISTINCT conv_id, g FROM (
            SELECT conv_id, unnest({shingles_sql("text", 2)}) AS g FROM transcripts
        )
    ),
    cstart AS (
        SELECT conv_id, epoch_ms(MIN(ts))::BIGINT AS start_ms
        FROM transcripts GROUP BY conv_id
    ),
    stamped AS (
        SELECT bg.conv_id, bg.g, s.start_ms FROM bg JOIN cstart s USING (conv_id)
    ),
    owner AS (
        SELECT g, conv_id AS owner_conv FROM (
            SELECT g, conv_id,
                   ROW_NUMBER() OVER (PARTITION BY g ORDER BY start_ms, conv_id) AS rn
            FROM stamped
        ) WHERE rn = 1
    )
    SELECT st.conv_id,
           COUNT(*)::BIGINT AS n_bigrams,
           SUM(CASE WHEN o.owner_conv = st.conv_id THEN 1 ELSE 0 END)::BIGINT AS n_novel,
           ROUND(SUM(CASE WHEN o.owner_conv = st.conv_id THEN 1 ELSE 0 END) / COUNT(*), 6)
               AS novelty
    FROM stamped st JOIN owner o USING (g)
    GROUP BY st.conv_id
    """


def conv_entropy_oracle_sql() -> str:
    """DuckDB twin of operators.extract.conv_entropy (same H-form:
    ln(n) - Σ c·ln(c)/n, rounded once)."""
    return (
        "WITH "
        + transcripts_cte_sql()
        + """,
    per_role AS (
        SELECT conv_id, role, COUNT(*)::BIGINT AS c
        FROM transcripts GROUP BY conv_id, role
    )
    SELECT conv_id, SUM(c)::BIGINT AS n_turns,
           ROUND(ln(SUM(c)::DOUBLE) - SUM(c * ln(c::DOUBLE)) / SUM(c), 6)
               AS role_entropy
    FROM per_role GROUP BY conv_id
    """
    )


def turn_segments_oracle_sql(threshold: float = 0.1) -> str:
    """DuckDB twin of operators.extract.turn_segments — same lag-window
    Jaccard and running boundary sum; the int/int Jaccard division makes
    the threshold compare engine-deterministic."""
    return (
        "WITH "
        + transcripts_cte_sql()
        + f""",
    tk AS (
        SELECT conv_id, turn_idx,
               list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS toks
        FROM transcripts
    ),
    lagged AS (
        SELECT conv_id, turn_idx, toks,
               LAG(toks) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
        FROM tk
    ),
    flags AS (
        SELECT conv_id, turn_idx,
               CASE
                   WHEN prev IS NULL THEN 0
                   WHEN len(list_distinct(list_concat(toks, prev))) = 0 THEN 0
                   WHEN len(list_intersect(toks, prev))::DOUBLE
                        / len(list_distinct(list_concat(toks, prev)))
                        < {threshold} THEN 1
                   ELSE 0
               END AS b
        FROM lagged
    ),
    seg AS (
        SELECT conv_id,
               (SUM(b) OVER (PARTITION BY conv_id ORDER BY turn_idx
                             ROWS UNBOUNDED PRECEDING))::BIGINT AS segment,
               turn_idx
        FROM flags
    )
    SELECT conv_id, segment,
           COUNT(*)::BIGINT AS n_turns,
           MIN(turn_idx)::INT AS start_idx,
           MAX(turn_idx)::INT AS end_idx
    FROM seg
    GROUP BY conv_id, segment
    """
    )


def latency_quantiles_oracle_sql(qs: tuple[float, ...] = (0.5, 0.9, 0.99)) -> str:
    """DuckDB twin of operators.extract.latency_quantiles."""
    qvals = ", ".join(f"({q})" for q in qs)
    return (
        "WITH "
        + transcripts_cte_sql()
        + f""",
    gaps AS (
        SELECT epoch_ms(ts) - LAG(epoch_ms(ts))
                   OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap_ms
        FROM transcripts
    ),
    g AS (SELECT gap_ms FROM gaps WHERE gap_ms IS NOT NULL),
    hist AS (SELECT gap_ms, COUNT(*)::BIGINT AS c FROM g GROUP BY gap_ms),
    cdf AS (
        SELECT gap_ms,
               SUM(c) OVER (ORDER BY gap_ms
                            ROWS UNBOUNDED PRECEDING) AS cum,
               (SELECT COUNT(*) FROM g) AS n
        FROM hist
    ),
    qs(q) AS (VALUES {qvals})
    SELECT q, MIN(gap_ms)::BIGINT AS gap_ms
    FROM cdf CROSS JOIN qs
    WHERE cum >= CEIL(q * n)
    GROUP BY q
    """
    )


def conv_prefix_dups_oracle_sql() -> str:
    """DuckDB twin of extract.conv_prefix_dups — the rolling prefix
    chain as a recursive CTE over the derived transcripts table.
    Self-contained (includes WITH RECURSIVE), unlike the *_cte_sql
    helpers, because the recursive member must be declared at the top
    of the WITH clause."""
    from ..textops.portable import md5_long_sql

    t0 = md5_long_sql("concat('p', ':', th)")
    tn = md5_long_sql("concat(p.ph, ':', t.th)")
    th = md5_long_sql(
        "concat(role, chr(31), COALESCE(text, ''), chr(31), COALESCE(tool, ''))"
    )
    return f"""
    WITH RECURSIVE
    transcripts AS (
        SELECT
            'u' || CAST(user_id AS VARCHAR) AS conv_id,
            (ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1)::INT
                AS turn_idx,
            event_type AS role,
            props AS text,
            CASE WHEN event_id % {TOOL_EVERY} = 0
                 THEN 'tool_' || CAST(event_id % {N_TOOL_NAMES} AS VARCHAR)
            END AS tool,
            ts
        FROM events
    ),
    cpd_th AS (SELECT conv_id, turn_idx, {th} AS th FROM transcripts),
    cpd_p AS (
        SELECT conv_id, 0 AS d, {t0} AS ph FROM cpd_th WHERE turn_idx = 0
        UNION ALL
        SELECT t.conv_id, p.d + 1 AS d, {tn} AS ph
        FROM cpd_p p JOIN cpd_th t
          ON t.conv_id = p.conv_id AND t.turn_idx = p.d + 1
    ),
    cpd_g AS (
        SELECT d, ph, COUNT(*)::BIGINT AS n
        FROM cpd_p GROUP BY d, ph HAVING COUNT(*) >= 2
    ),
    cpd_j AS (
        SELECT p.conv_id, g.d, g.n
        FROM cpd_p p JOIN cpd_g g ON p.d = g.d AND p.ph = g.ph
    )
    SELECT conv_id, (MAX(d) + 1)::INT AS shared_turns, arg_max(n, d) AS n_convs
    FROM cpd_j GROUP BY conv_id
    """


def actor_coparticipation_oracle_sql(max_conv_actors: int = 1000) -> str:
    """DuckDB twin of extract.actor_coparticipation over the events-derived
    transcripts."""
    return (
        "WITH "
        + transcripts_cte_sql()
        + f""",
    cp_pa AS (SELECT DISTINCT conv_id, role FROM transcripts),
    cp_keep AS (
        SELECT conv_id FROM cp_pa GROUP BY conv_id
        HAVING COUNT(*) <= {max_conv_actors}
    )
    SELECT a.role AS actor_a, b.role AS actor_b, COUNT(*)::BIGINT AS n_convs
    FROM cp_pa a
    JOIN cp_pa b ON a.conv_id = b.conv_id AND a.role < b.role
    JOIN cp_keep k ON k.conv_id = a.conv_id
    GROUP BY a.role, b.role
    """
    )


def tool_latency_attribution(transcripts: DataFrame) -> DataFrame:
    """(after_tool, n_replies, mean_latency_ms, max_latency_ms) — does a
    tool invocation slow the NEXT reply?  Replies are bucketed by
    whether the PREVIOUS turn carried a tool call, under stable turn
    ordering; the operational attribution query behind "which tools
    stall conversations" (pair with tool_cooccurrence for which tools
    co-fire, reply_latency_stats for the unconditional distribution).

    One conv-keyed window (reused for both lags), one 2-row aggregate;
    exact epoch-ms int arithmetic until the final mean."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    lagged = transcripts.select(
        (ms - F.lag(ms).over(w)).alias("latency_ms"),
        F.lag("tool").over(w).isNotNull().alias("after_tool"),
    ).filter(F.col("latency_ms").isNotNull())
    return lagged.groupBy("after_tool").agg(
        F.count("*").cast("long").alias("n_replies"),
        F.round(F.avg("latency_ms"), 6).alias("mean_latency_ms"),
        F.max("latency_ms").cast("long").alias("max_latency_ms"),
    )


def tool_latency_attribution_sql() -> str:
    return (
        "WITH "
        + transcripts_cte_sql()
        + """
    , tla AS (
        SELECT epoch_ms(ts) - LAG(epoch_ms(ts))
                   OVER (PARTITION BY conv_id ORDER BY turn_idx) AS latency_ms,
               LAG(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                   IS NOT NULL AS after_tool
        FROM transcripts
    )
    SELECT after_tool, COUNT(*)::BIGINT AS n_replies,
           ROUND(AVG(latency_ms), 6) AS mean_latency_ms,
           MAX(latency_ms)::BIGINT AS max_latency_ms
    FROM tla WHERE latency_ms IS NOT NULL
    GROUP BY after_tool
    """
    )
