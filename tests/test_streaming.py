"""Edge-stream batched driver (§2.10) + Structured Streaming ingestion."""

from __future__ import annotations

import pyspark.sql.functions as F

from sbm_communitydetection_spark.operators.graph_ops import symmetrize, total_edges
from sbm_communitydetection_spark.sources.sbm import generate_sbm
from sbm_communitydetection_spark.streaming.stream_driver import stream_community_detection
from sbm_communitydetection_spark.streaming.structured import (
    read_edge_state,
    start_edge_ingest,
)


def test_stream_driver_tracks_planted_sbm(spark, tmp_path):
    vertices, stream = generate_sbm(spark, n=40, k=2, m=300, p_in=0.9, p_out=0.05, seed=5)
    edge_stream = stream.select(
        "src", "dst", F.lit(1).cast("long").alias("weight"), F.col("edge_seq")
    )
    truth = vertices.select("id", "label")
    mp = str(tmp_path / "stream_metrics.jsonl")
    res = stream_community_detection(
        spark, edge_stream, n_batches=4, supersteps_per_batch=6, truth=truth, metrics_path=mp
    )
    assert res.batches == 4
    assert len(res.metrics) == 4
    # S6 sink written, one row per batch, monotone edges_seen
    seen = [m["edges_seen"] for m in res.metrics]
    assert seen == sorted(seen)
    # final quality: on a well-separated SBM the tracked partition must be
    # strongly intra-community (edge classification accuracy vs truth)
    assert res.metrics[-1]["edge_cls_acc"] > 0.9, res.metrics[-1]
    # final edge table equals the full symmetrized stream
    full = symmetrize(edge_stream.select("src", "dst", "weight"))
    assert total_edges(res.edges).collect()[0][0] == total_edges(full).collect()[0][0]
    with open(mp) as f:
        assert len(f.readlines()) == 4


def _land_file(df, staging: str, feed: str, name: str) -> None:
    """Land one flat parquet file in the feed dir (file-source semantics:
    the stream lists files directly in the source directory)."""
    import glob
    import os
    import shutil

    df.coalesce(1).write.mode("overwrite").parquet(staging)
    os.makedirs(feed, exist_ok=True)
    shutil.copy(glob.glob(f"{staging}/part-*.parquet")[0], f"{feed}/{name}.parquet")


def test_structured_ingest_accumulates_weights(spark, tmp_path):
    src_dir = str(tmp_path / "feed")
    staging = str(tmp_path / "staging")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    b1 = spark.createDataFrame(
        [(0, 1, 1, 0), (1, 2, 1, 1)], "src long, dst long, weight long, edge_seq long"
    )
    b2 = spark.createDataFrame(
        [(0, 1, 2, 2), (2, 3, 1, 3)], "src long, dst long, weight long, edge_seq long"
    )
    _land_file(b1, staging, src_dir, "b1")
    q = start_edge_ingest(spark, src_dir, state_dir, ckpt)
    q.awaitTermination(120)
    _land_file(b2, staging, src_dir, "b2")
    q2 = start_edge_ingest(spark, src_dir, state_dir, ckpt)
    q2.awaitTermination(120)

    state = {(r.src, r.dst): r.weight for r in read_edge_state(spark, state_dir).collect()}
    # G2 accumulate semantics: (0,1) seen with weight 1 then 2 → 3, both directions
    assert state[(0, 1)] == 3 and state[(1, 0)] == 3
    assert state[(1, 2)] == 1 and state[(2, 1)] == 1
    assert state[(2, 3)] == 1 and state[(3, 2)] == 1
    assert len(state) == 6


def test_stream_resume_from_durable_checkpoint(spark, tmp_path):
    """north_rule: a killed streaming run resumes from the latest complete
    per-batch snapshot and ends bit-identical to an uninterrupted run."""
    import shutil

    vertices, stream = generate_sbm(spark, n=40, k=2, m=300, p_in=0.9, p_out=0.05, seed=5)
    edge_stream = stream.select(
        "src", "dst", F.lit(1).cast("long").alias("weight"), F.col("edge_seq")
    )

    full = stream_community_detection(
        spark, edge_stream, n_batches=4, supersteps_per_batch=4,
        checkpoint_dir=str(tmp_path), run_id="full",
    )
    want = sorted(map(tuple, full.labels.collect()))
    # durable per-batch lineage rows present
    assert all(m["partition_lineage"]["labels"] for m in full.metrics)

    # same run under run_id="crash", then simulate a crash after batch 1
    stream_community_detection(
        spark, edge_stream, n_batches=4, supersteps_per_batch=4,
        checkpoint_dir=str(tmp_path), run_id="crash",
    )
    for b in (2, 3):
        shutil.rmtree(tmp_path / "crash" / f"batch={b}")

    res = stream_community_detection(
        spark, edge_stream, n_batches=4, supersteps_per_batch=4,
        checkpoint_dir=str(tmp_path), run_id="crash", resume=True,
    )
    assert [m["batch"] for m in res.metrics] == [2, 3]  # only the re-run batches
    assert sorted(map(tuple, res.labels.collect())) == want


def test_locality_radius_stream_matches_planted(spark):
    """C2-style locality: bounding each batch's repair to the r-hop ball
    around affected vertices must still track the planted partition on a
    well-separated SBM (frozen labels outside the ball; full neighbor
    visibility inside)."""
    vertices, stream = generate_sbm(spark, n=40, k=2, m=300, p_in=0.9, p_out=0.05, seed=5)
    edge_stream = stream.select(
        "src", "dst", F.lit(1).cast("long").alias("weight"), F.col("edge_seq")
    )
    truth = vertices.select("id", "label")
    res = stream_community_detection(
        spark,
        edge_stream,
        n_batches=4,
        supersteps_per_batch=6,
        truth=truth,
        locality_radius=2,
    )
    assert res.metrics[-1]["edge_cls_acc"] > 0.9, res.metrics[-1]
