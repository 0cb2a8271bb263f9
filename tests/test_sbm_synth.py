"""SBM generator + transcript synth correctness (SURVEY.md §2.3, FIXTURES.md §1)."""

from __future__ import annotations

from math import comb

import pyspark.sql.functions as F

from sbm_communitydetection_spark.sources.sbm import block_assignment, generate_sbm, intra_threshold
from sbm_communitydetection_spark.sources.transcripts import generate_transcripts


def test_intra_threshold_matches_reference_formula():
    # default.json config: n=20, m=50, k=5, p_in=0.9, p_out=0.1
    n, k, p_in, p_out = 20, 5, 0.9, 0.1
    b = n // k
    intra_pairs = k * comb(b, 2)
    inter_pairs = comb(n, 2) - intra_pairs
    expected = (p_in * intra_pairs) / (p_in * intra_pairs + p_out * inter_pairs)
    assert abs(intra_threshold(n, k, p_in, p_out) - expected) < 1e-12
    assert 0.0 < intra_threshold(1000, 5, 0.99, 0.01) < 1.0


def test_block_assignment_equal_blocks(spark):
    v = block_assignment(spark, 20, 5, seed=42).collect()
    assert len(v) == 20
    assert sorted(r.id for r in v) == list(range(20))
    by_label: dict[int, list[int]] = {}
    for r in v:
        by_label.setdefault(r.label, []).append(r.offset)
    assert sorted(by_label) == [0, 1, 2, 3, 4]
    for offs in by_label.values():
        assert sorted(offs) == [0, 1, 2, 3]


def test_block_assignment_uneven(spark):
    """uneven_node_distribution (utils/sequence_generator.cpp:56-58, :82-84):
    n % k != 0 allowed; the n mod k leftover vertices keep Graph-ctor
    defaults (label=id, src/graph.cpp:33-40) and never receive edges."""
    import pytest

    with pytest.raises(ValueError):
        block_assignment(spark, 22, 5, seed=42)
    v = block_assignment(spark, 22, 5, seed=42, uneven=True).collect()
    assert len(v) == 22
    leftovers = [r for r in v if r.offset == -1]
    assert len(leftovers) == 2
    assert all(r.label == r.id for r in leftovers)
    assigned = [r for r in v if r.offset >= 0]
    by_label: dict[int, list[int]] = {}
    for r in assigned:
        by_label.setdefault(r.label, []).append(r.offset)
    assert sorted(by_label) == [0, 1, 2, 3, 4]
    assert all(sorted(o) == [0, 1, 2, 3] for o in by_label.values())
    # leftover vertices are unreachable by the edge generator
    vertices, stream = generate_sbm(spark, n=22, k=5, m=200, p_in=0.9, p_out=0.1, uneven=True)
    left_ids = {r.id for r in leftovers}
    touched = {r.src for r in stream.collect()} | {r.dst for r in stream.collect()}
    assert not (left_ids & touched)


def test_block_assignment_deterministic(spark):
    a = sorted(map(tuple, block_assignment(spark, 40, 4, seed=7).collect()))
    b = sorted(map(tuple, block_assignment(spark, 40, 4, seed=7).collect()))
    c = sorted(map(tuple, block_assignment(spark, 40, 4, seed=8).collect()))
    assert a == b
    assert a != c


def test_sbm_edges_no_self_loops_and_intra_rate(spark):
    n, k, m = 100, 5, 2000
    vertices, edges = generate_sbm(spark, n, k, m, p_in=0.9, p_out=0.1, seed=42)
    lab = {r.id: r.label for r in vertices.collect()}
    rows = edges.collect()
    assert len(rows) == m
    assert sorted(r.edge_seq for r in rows) == list(range(m))
    assert all(r.src != r.dst for r in rows)
    intra = sum(1 for r in rows if lab[r.src] == lab[r.dst])
    expected = intra_threshold(n, k, 0.9, 0.1)
    assert abs(intra / m - expected) < 0.05  # 2000 draws, ~3 sigma


def test_transcripts_schema_and_determinism(spark):
    t, truth, edges = generate_transcripts(spark, n=20, k=5, m=30, seed=42)
    assert [f.name for f in t.schema.fields] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    rows = t.orderBy("conv_id", "turn_idx").collect()
    rows2 = generate_transcripts(spark, n=20, k=5, m=30, seed=42)[0].orderBy("conv_id", "turn_idx").collect()
    assert rows == rows2
    # dense turn_idx per conversation, ts monotone within conversation
    by_conv: dict[str, list] = {}
    for r in rows:
        by_conv.setdefault(r.conv_id, []).append(r)
    assert len(by_conv) == 30
    for conv_rows in by_conv.values():
        idxs = [r.turn_idx for r in conv_rows]
        assert idxs == list(range(len(idxs)))
        assert len(idxs) % 2 == 0 and 2 <= len(idxs) <= 8
        ts = [r.ts for r in conv_rows]
        assert ts == sorted(ts)
        roles = {r.role for r in conv_rows}
        assert len(roles) == 2  # alternating two distinct agents


def test_transcripts_tool_hub_skew(spark):
    t, _, _ = generate_transcripts(spark, n=50, k=5, m=500, seed=42)
    tools = (
        t.filter(F.col("tool").isNotNull()).groupBy("tool").count().orderBy(F.desc("count")).collect()
    )
    assert tools, "some turns must carry tools"
    assert tools[0].tool == "tool_00"  # planted hub
    assert tools[0]["count"] > tools[-1]["count"]
