"""Edge-extraction pipeline: planted-edge recovery + per-turn text equality."""

from __future__ import annotations

import pyspark.sql.functions as F

from sbm_communitydetection_spark.operators.extract import (
    assert_no_id_collisions,
    extract_edges,
    extract_graph,
    extract_turn_actors,
    extract_vertices,
)
from sbm_communitydetection_spark.operators.graph_ops import total_edges, weighted_degree
from sbm_communitydetection_spark.sources.transcripts import generate_transcripts


def _agent_id_map(spark_vertices):
    """actor_key 'agent_%06d' → planted integer id."""
    return {
        r.actor_key: int(r.actor_key.split("_")[1])
        for r in spark_vertices.filter(F.col("kind") == "participant").collect()
    }


def test_reply_edges_recover_planted_sbm_edges(spark):
    t, truth, planted = generate_transcripts(spark, n=30, k=5, m=60, seed=42)
    edges = extract_edges(t, include_tool_edges=False)
    vertices = extract_vertices(t)
    assert_no_id_collisions(vertices)

    # map hashed actor ids back to planted agent ids
    key_of = {r.id: int(r.actor_key.split("_")[1]) for r in vertices.collect() if r.actor_key.startswith("agent_")}
    got = {}
    for r in edges.collect():
        a, b = key_of[r.src], key_of[r.dst]
        got[(a, b)] = got.get((a, b), 0) + r.weight

    # expected: each planted edge (u,v) appears with weight = total exchanges
    # across its conversations, symmetrized
    exp = {}
    planted_rows = planted.collect()
    conv_sizes = {
        r.conv_id: r["cnt"]
        for r in t.groupBy("conv_id").agg(F.count("*").alias("cnt")).collect()
    }
    for r in planted_rows:
        w = conv_sizes[f"c{r.edge_seq:09d}"] - 1  # n_turns-1 reply links per conv
        for pair in [(r.src, r.dst), (r.dst, r.src)]:
            exp[pair] = exp.get(pair, 0) + w
    # symmetrize expected accumulation (u,v) and (v,u) merged by extractor
    assert got == exp


def test_per_turn_text_equality_invariant(spark):
    """BASELINE.json input_hint: per-turn text equality under stable turn
    ordering must survive the extraction pipeline byte-exact."""
    t, _, _ = generate_transcripts(spark, n=20, k=4, m=40, seed=42)
    annotated = extract_turn_actors(t)
    back = annotated.select("conv_id", "turn_idx", F.col("text").alias("text_out"))
    joined = t.join(back, ["conv_id", "turn_idx"], "full")
    mismatches = joined.filter(
        F.col("text").isNull() | F.col("text_out").isNull() | (F.col("text") != F.col("text_out"))
    ).count()
    assert mismatches == 0
    assert annotated.count() == t.count()


def test_tool_edges_and_degree(spark):
    t, _, _ = generate_transcripts(spark, n=30, k=5, m=100, seed=42)
    vertices, edges = extract_graph(t, include_tool_edges=True)
    # symmetrized invariants
    flipped = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    assert edges.exceptAll(flipped).count() == 0
    assert edges.filter(F.col("src") == F.col("dst")).count() == 0
    # total_edges = sum(weight)/2 equals number of directed reply+tool links
    n_links = t.count() - t.select("conv_id").distinct().count() + t.filter(F.col("tool").isNotNull()).count()
    assert total_edges(edges).collect()[0].total_edges == float(n_links)
    # hub tool has the max degree among tool vertices
    deg = weighted_degree(edges)
    tool_deg = (
        vertices.filter(F.col("kind") == "tool").join(deg, "id").orderBy(F.desc("degree")).collect()
    )
    assert tool_deg[0].actor_key == "tool:tool_00"


def test_events_transcripts_mapping(spark):
    """The events→transcripts mapping (sources/events_transcripts.py) must
    produce the exact input_hint schema with a stable, gapless per-
    conversation turn ordering, and the extraction must run end-to-end on
    it (driver gate: transcript_reply_edges / transcript_turn_text)."""
    import os

    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
    t = events_transcripts(spark, sf_dir)
    assert [f.name for f in t.schema.fields] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert dict(t.dtypes)["turn_idx"] == "int"

    # gapless 0..n-1 turn ordering per conversation
    bad = (
        t.groupBy("conv_id")
        .agg(F.min("turn_idx").alias("lo"), F.max("turn_idx").alias("hi"), F.count("*").alias("n"))
        .filter((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1))
    )
    assert bad.limit(1).count() == 0

    edges = extract_edges(t)
    verts = extract_vertices(t)
    assert_no_id_collisions(verts)
    # symmetrized: every (src,dst) has its mirror with equal weight
    e2 = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("weight").alias("w2"))
    joined = edges.join(e2, ["src", "dst"])
    assert joined.count() == edges.count()
    assert joined.filter(F.col("weight") != F.col("w2")).count() == 0


def test_conv_stats_and_role_transitions_semantics(spark):
    from datetime import datetime

    from sbm_communitydetection_spark.operators.extract import conv_stats, role_transitions

    rows = [
        # conv c1: a -> b -> a, one tool call, 90s span
        ("c1", 0, "a", "t0", None, datetime(2026, 1, 1, 0, 0, 0)),
        ("c1", 1, "b", "t1", "tool_0", datetime(2026, 1, 1, 0, 0, 30)),
        ("c1", 2, "a", "t2", None, datetime(2026, 1, 1, 0, 1, 30)),
        # conv c2: single turn — no transitions, zero duration
        ("c2", 0, "b", "t3", None, datetime(2026, 1, 1, 1, 0, 0)),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    stats = {r.conv_id: r for r in conv_stats(t).collect()}
    assert stats["c1"].n_turns == 3 and stats["c1"].n_actors == 2
    assert stats["c1"].n_tool_calls == 1 and stats["c1"].duration_ms == 90_000
    assert stats["c2"].n_turns == 1 and stats["c2"].duration_ms == 0

    trans = {(r.role_from, r.role_to): r.n for r in role_transitions(t).collect()}
    assert trans == {("a", "b"): 1, ("b", "a"): 1}  # directed, turn-ordered


def test_decayed_reply_edges_halves_per_half_life(spark):
    from datetime import datetime

    from sbm_communitydetection_spark.operators.extract import decayed_reply_edges

    hl = 3600_000.0  # 1 hour
    # conv c0: a->b reply at t_max - 1h (one half-life old)
    # conv c1: a->b reply at t_max (fresh)
    t = spark.createDataFrame(
        [
            ("c0", 0, "b", "x", None, datetime(2026, 1, 1, 10, 0, 0)),
            ("c0", 1, "a", "x", None, datetime(2026, 1, 1, 11, 0, 0)),
            ("c1", 0, "b", "x", None, datetime(2026, 1, 1, 11, 0, 0)),
            ("c1", 1, "a", "x", None, datetime(2026, 1, 1, 12, 0, 0)),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = {(r.src_key, r.dst_key): r.weight for r in decayed_reply_edges(t, hl).collect()}
    # fresh link weighs 1.0, the hour-old one 0.5; symmetrized sum = 1.5
    assert abs(out[("a", "b")] - 1.5) < 1e-9
    assert out[("a", "b")] == out[("b", "a")]


def test_pack_conversations_fixed_quota(spark):
    """Packing = floor(exclusive prefix sum / budget) in conv_id order;
    the two-phase distributed scan must equal the simple formulation."""
    from sbm_communitydetection_spark.operators.extract import pack_conversations

    t = spark.createDataFrame(
        [(f"c{i}", 0, "user", " ".join(["w"] * n), None, None)
         for i, n in enumerate([4, 4, 4, 2, 6, 1])],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {r.conv_id: (r.conv_tokens, r.pack_id) for r in pack_conversations(t, 8).collect()}
    # cum(exclusive): c0=0, c1=4, c2=8, c3=12, c4=14, c5=20
    assert got == {
        "c0": (4, 0), "c1": (4, 0), "c2": (4, 1),
        "c3": (2, 1), "c4": (6, 1), "c5": (1, 2),
    }


def test_holdout_split_conversation_granularity(spark):
    from sbm_communitydetection_spark.operators.extract import holdout_split

    rows = [(f"c{i}", j, "user", "x", None, None) for i in range(200) for j in range(2)]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    res = holdout_split(t, val_permille=100, test_permille=100)
    got = {r.conv_id: r.split for r in res.collect()}
    assert len(got) == 200  # one decision per conversation, not per turn
    counts = {s: list(got.values()).count(s) for s in ("train", "val", "test")}
    assert counts["train"] > counts["val"] > 0 and counts["test"] > 0
    # deterministic across invocations
    again = {r.conv_id: r.split for r in holdout_split(t, 100, 100).collect()}
    assert got == again


def test_prompt_response_pairs_adjacent_cross_role(spark):
    from datetime import datetime

    from sbm_communitydetection_spark.operators.extract import prompt_response_pairs

    ts = datetime(2026, 1, 1)
    rows = [
        ("c1", 0, "user", "q1", None, ts),
        ("c1", 1, "user", "q1b", None, ts),  # same-role continuation: no pair
        ("c1", 2, "asst", "a1", None, ts),  # pair (q1b -> a1)
        ("c1", 3, "user", "q2", None, ts),  # pair (a1 -> q2)
        ("c2", 0, "asst", "solo", None, ts),  # first turn: no predecessor
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    got = {(r.conv_id, r.turn_idx): r for r in prompt_response_pairs(t).collect()}
    assert set(got) == {("c1", 2), ("c1", 3)}
    assert got[("c1", 2)].prompt_text == "q1b" and got[("c1", 2)].response_text == "a1"
    assert got[("c1", 3)].prompt_role == "asst" and got[("c1", 3)].response_role == "user"


def test_context_windows_frame_contents(spark):
    """Context is exactly the previous ≤k turns as 'role: text' lines in
    turn order; the first turn of each conversation emits no row."""
    from sbm_communitydetection_spark.operators.extract import context_windows

    rows = [
        ("c1", 0, "user", "hi", None, 0),
        ("c1", 1, "assistant", "hello", None, 1),
        ("c1", 2, "user", "help", None, 2),
        ("c1", 3, "assistant", "sure", None, 3),
        ("c2", 0, "user", "solo", None, 0),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts long"
    )
    got = {
        (r.conv_id, r.turn_idx): r
        for r in context_windows(t, k=2).collect()
    }
    assert set(got) == {("c1", 1), ("c1", 2), ("c1", 3)}  # no context → no row
    assert got[("c1", 1)].context == "user: hi"
    assert got[("c1", 2)].context == "user: hi\nassistant: hello"
    assert got[("c1", 3)].context == "assistant: hello\nuser: help"  # k=2 window slides
    assert got[("c1", 3)].response == "sure" and got[("c1", 3)].response_role == "assistant"


def test_conv_novelty_ownership_by_start_time(spark):
    """The earlier conversation owns shared bigrams; later copies score 0;
    unique content scores 1; ties break by conv_id."""
    from sbm_communitydetection_spark.operators.extract import conv_novelty

    rows = [
        ("a", 0, "user", "red green blue", None, 1000),
        ("b", 0, "user", "red green blue", None, 2000),   # later copy of a
        ("c", 0, "user", "totally fresh words", None, 1500),
        ("d", 0, "user", "red green yellow", None, 3000),  # shares 'red green'
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ms long",
    ).select(
        "conv_id", "turn_idx", "role", "text", "tool", F.timestamp_millis("ms").alias("ts")
    )
    got = {r.conv_id: r for r in conv_novelty(t).collect()}
    assert got["a"].n_bigrams == 2 and got["a"].n_novel == 2  # owns both
    assert got["b"].n_novel == 0 and got["b"].novelty == 0.0
    assert got["c"].novelty == 1.0
    assert got["d"].n_bigrams == 2 and got["d"].n_novel == 1  # 'green yellow' only


def test_dpo_pairs_same_prompt_different_responses(spark):
    """Identical prompts across conversations pair up; identical
    responses never pair; the k-cap bounds representatives per prompt."""
    from sbm_communitydetection_spark.operators.extract import dpo_pair_candidates

    rows = []
    for i, resp in enumerate(["yes", "no", "maybe", "yes"]):  # c3 repeats c0's resp
        rows += [(f"c{i}", 0, "user", "how", None, 1000 * (i + 1)),
                 (f"c{i}", 1, "assistant", resp, None, 1000 * (i + 1) + 1)]
    rows += [("c9", 0, "user", "unique prompt", None, 9000),
             ("c9", 1, "assistant", "solo", None, 9001)]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ms long",
    ).select(
        "conv_id", "turn_idx", "role", "text", "tool", F.timestamp_millis("ms").alias("ts")
    )
    got = {(r.conv_a, r.conv_b) for r in dpo_pair_candidates(t, k_per_prompt=3).collect()}
    # reps capped at c0,c1,c2 (conv order); c3 beyond cap, c9 has no pair
    assert got == {("c0", "c1"), ("c0", "c2"), ("c1", "c2")}
    full = {(r.conv_a, r.conv_b) for r in dpo_pair_candidates(t, k_per_prompt=10).collect()}
    # with the cap lifted, c3 pairs with c1/c2 but NOT c0 (same response)
    assert ("c0", "c3") not in full and ("c1", "c3") in full and ("c2", "c3") in full


def test_conv_entropy_uniform_vs_monologue(spark):
    """Uniform 2-role conv → ln 2; monologue → 0."""
    import math

    from sbm_communitydetection_spark.operators.extract import conv_entropy

    rows = [
        ("c0", 0, "a", "t", None, None), ("c0", 1, "b", "t", None, None),
        ("c0", 2, "a", "t", None, None), ("c0", 3, "b", "t", None, None),
        ("c1", 0, "a", "t", None, None), ("c1", 1, "a", "t", None, None),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {r.conv_id: (r.n_turns, r.role_entropy) for r in conv_entropy(t).collect()}
    assert got["c0"] == (4, round(math.log(2), 6))
    assert got["c1"] == (2, 0.0)


def test_latency_quantiles_exact_disc_semantics(spark):
    """Gaps 10..100 by 10 (n=10): p50 = 5th value = 50, p90 = 9th = 90,
    p99 = ceil(9.9) = 10th = 100."""
    from datetime import datetime, timedelta

    from sbm_communitydetection_spark.operators.extract import latency_quantiles

    t0 = datetime(2024, 1, 1)
    rows, ts = [], t0
    for i in range(11):  # 11 turns -> 10 gaps of 10,20,...,100 ms
        rows.append(("c0", i, "a", "t", None, ts))
        ts = ts + timedelta(milliseconds=10 * (i + 1))
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = {r.q: r.gap_ms for r in latency_quantiles(t).collect()}
    assert got == {0.5: 50, 0.9: 90, 0.99: 100}


def test_event_funnel_strict_ordering(spark):
    """User 1 converts in order; user 2 has all events but purchase
    precedes click, so it must NOT count for the purchase step."""
    from datetime import datetime

    from sbm_communitydetection_spark.operators.funnels import event_funnel

    def ev(uid, etype, sec):
        return (uid, etype, datetime(2024, 1, 1, 0, 0, sec))

    rows = [
        ev(1, "view", 1), ev(1, "click", 2), ev(1, "purchase", 3),
        ev(2, "view", 1), ev(2, "purchase", 2), ev(2, "click", 3),
        ev(3, "view", 5),
    ]
    events = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {r.step: r.n_users for r in event_funnel(events).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_retention_cohorts_week_offsets(spark):
    """One user active in epoch-weeks w and w+2 yields offsets 0 and 2."""
    from datetime import datetime, timedelta

    from sbm_communitydetection_spark.operators.funnels import retention_cohorts

    base = datetime(2024, 1, 4)
    rows = [
        (1, "view", base),
        (1, "view", base + timedelta(days=14)),
        (2, "view", base),
    ]
    events = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {(r.cohort_week, r.week_offset): r.n_users
           for r in retention_cohorts(events).collect()}
    (w,) = {k[0] for k in out}
    assert out == {(w, 0): 2, (w, 2): 1}


def test_turn_segments_cuts_on_lexical_shift(spark):
    """Turns 0-1 share tokens (jac 1/3 ≥ 0.1 threshold → same segment);
    turn 2 is disjoint (jac 0 → new segment). Singleton conv stays one
    segment."""
    from sbm_communitydetection_spark.operators.extract import turn_segments

    rows = [
        ("c1", 0, "user", "alpha beta", None, 0),
        ("c1", 1, "agent", "beta gamma", None, 1),
        ("c1", 2, "user", "delta epsilon", None, 2),
        ("c2", 0, "user", "solo", None, 0),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts long"
    ).withColumn("ts", F.timestamp_millis(F.col("ts")))
    out = {
        (r.conv_id, r.segment): (r.n_turns, r.start_idx, r.end_idx)
        for r in turn_segments(t, threshold=0.1).collect()
    }
    assert out == {
        ("c1", 0): (2, 0, 1),
        ("c1", 1): (1, 2, 2),
        ("c2", 0): (1, 0, 0),
    }
