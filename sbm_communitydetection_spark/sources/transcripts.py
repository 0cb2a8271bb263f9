"""Deterministic synthetic multi-turn transcript generator (input_hint schema).

Produces the engine's primary input table

    transcripts(conv_id: string, turn_idx: int, role: string,
                text: string, tool: string, ts: timestamp)

with a PLANTED SBM community structure over agent actors, so community
recovery has ground truth (FIXTURES.md §1):

* n agents are assigned to k blocks (sources/sbm.py, reference
  src/sbm.cpp:111-142).
* Each of the m SBM edges (u, v) becomes one conversation: a seeded
  number of alternating exchanges u, v, u, v, ... — every consecutive
  turn pair is a reply link between the same two agents, so the
  extracted reply-edge table equals the planted SBM edge multiset with
  weight = number of exchanges per conversation (weight accumulation,
  reference src/graph.cpp:24-26).
* A seeded subset of turns carries a non-null `tool` drawn from a small,
  deliberately skewed set (min of two uniforms → tool_0 is a hub) to
  exercise hub-vertex skew handling.

Everything is column expressions over the edge stream — zero per-row
Python, fully deterministic under (seed, n, k, m, p_in, p_out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sbm import generate_sbm

BASE_TS = "2026-01-01 00:00:00"


def transcripts_from_edges(
    edges: DataFrame,
    seed: int = 42,
    max_exchanges: int = 4,
    n_tools: int = 8,
    tool_every: int = 5,
) -> DataFrame:
    """Expand an SBM edge stream (edge_seq, src, dst) into transcript turns."""
    n_ex = (F.pmod(F.xxhash64(F.col("edge_seq"), F.lit(seed)), F.lit(max_exchanges)) + 1).alias("n_ex")
    convs = edges.select(
        F.format_string("c%09d", F.col("edge_seq")).alias("conv_id"),
        "edge_seq",
        "src",
        "dst",
        n_ex,
    )
    turns = convs.select(
        "conv_id",
        "edge_seq",
        "src",
        "dst",
        F.explode(F.sequence(F.lit(0), F.col("n_ex") * 2 - 1)).alias("turn_idx"),
    )
    role = F.when(F.col("turn_idx") % 2 == 0, F.col("src")).otherwise(F.col("dst"))
    turn_hash = F.xxhash64(F.col("conv_id"), F.col("turn_idx"), F.lit(seed))
    # min of two uniforms → skewed toward tool_0 (planted hub vertex)
    tool_id = F.least(
        F.pmod(F.xxhash64(turn_hash, F.lit(1)), F.lit(n_tools)),
        F.pmod(F.xxhash64(turn_hash, F.lit(2)), F.lit(n_tools)),
    )
    has_tool = F.pmod(turn_hash, F.lit(tool_every)) == 0
    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.format_string("agent_%06d", role).alias("role"),
        F.format_string(
            "turn %d of %s by agent_%06d :: payload=%s",
            F.col("turn_idx"),
            F.col("conv_id"),
            role,
            F.md5(F.concat_ws("|", F.col("conv_id"), F.col("turn_idx"), F.lit(seed))),
        ).alias("text"),
        F.when(has_tool, F.format_string("tool_%02d", tool_id)).alias("tool"),
        (
            F.to_timestamp(F.lit(BASE_TS))
            + F.make_interval(secs=(F.col("edge_seq") * 3600 + F.col("turn_idx")).cast("double"))
        ).alias("ts"),
    )


def generate_transcripts(
    spark: SparkSession,
    n: int = 100,
    k: int = 5,
    m: int = 400,
    p_in: float = 0.9,
    p_out: float = 0.1,
    seed: int = 42,
    max_exchanges: int = 4,
    n_tools: int = 8,
    tool_every: int = 5,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(transcripts, agent_truth, edge_stream).

    agent_truth(id, label, offset) is the planted partition over agents —
    the analogue of the reference's labels.txt ground truth
    (scripts/overall_run.cpp:36-43).
    """
    vertices, edges = generate_sbm(spark, n, k, m, p_in, p_out, seed)
    t = transcripts_from_edges(
        edges, seed=seed, max_exchanges=max_exchanges, n_tools=n_tools, tool_every=tool_every
    )
    return t, vertices, edges
