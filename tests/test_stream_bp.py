"""Streamed radius-bounded BP (D2 streaming schedule): SBM recovery."""

from __future__ import annotations

import pyspark.sql.functions as F

from sbm_communitydetection_spark.operators.belief_propagation import noisy_priors
from sbm_communitydetection_spark.sources.sbm import generate_sbm
from sbm_communitydetection_spark.streaming.stream_bp import stream_belief_propagation


def test_stream_bp_recovers_planted_sbm(spark):
    vertices, stream = generate_sbm(spark, n=30, k=2, m=240, p_in=0.9, p_out=0.05, seed=9)
    edge_stream = stream.select(
        "src", "dst", F.lit(1).cast("long").alias("weight"), "edge_seq"
    ).localCheckpoint(eager=True)
    truth = vertices.select("id", "label")
    priors = noisy_priors(truth, 2, noise=0.5)
    res = stream_belief_propagation(
        spark,
        edge_stream,
        priors,
        k=2,
        p_in=0.9,
        p_out=0.05,
        radius=2,
        n_batches=3,
        iters_per_batch=2,
    )
    joined = res.join(truth.withColumnRenamed("label", "t"), "id")
    n = joined.count()
    mism = joined.filter(F.col("label") != F.col("t")).count()
    assert n == 30
    assert mism == 0, f"{mism}/{n} mislabeled"
    # beliefs are normalized distributions
    sums = res.select(F.aggregate("belief", F.lit(0.0), lambda a, x: a + x).alias("s")).collect()
    assert all(abs(r.s - 1.0) < 1e-9 for r in sums)
