"""Synchronous BP (D2 engine form) vs pure-python oracle + SBM recovery."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sbm_communitydetection_spark.operators.belief_propagation import (
    belief_propagation,
    bp_oracle,
    noisy_priors,
)
from sbm_communitydetection_spark.operators.graph_ops import symmetrize
from sbm_communitydetection_spark.sources.sbm import generate_sbm

K = 3
P_IN, P_OUT = 0.8, 0.05
NOISE = 0.3


def _sym_edges(spark, pairs):
    return symmetrize(
        spark.createDataFrame(
            [(s, d, 1) for s, d in pairs], "src long, dst long, weight long"
        )
    )


def test_bp_matches_python_oracle(spark):
    # two triangles joined by one bridge edge
    pairs = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    edges = _sym_edges(spark, pairs)
    obs = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 1), (4, 1), (5, 2)], "id long, label long"
    )
    priors = noisy_priors(obs, K, NOISE)
    res = belief_propagation(
        spark, edges, priors, k=K, p_in=P_IN, p_out=P_OUT, max_iterations=3, tolerance=-1.0
    ).collect()

    prior_map = {r.id: list(r.prior) for r in priors.collect()}
    etup = [(r.src, r.dst, r.weight) for r in edges.collect()]
    oracle = bp_oracle(etup, prior_map, K, P_IN, P_OUT, n_iterations=3)

    assert len(res) == 6
    for r in res:
        olabel, obelief = oracle[r.id]
        assert r.label == olabel
        for a, b in zip(r.belief, obelief):
            assert abs(a - b) < 1e-9, f"vertex {r.id}: {list(r.belief)} vs {obelief}"


def test_bp_prior_rows_sum_to_one(spark):
    obs = spark.createDataFrame([(0, 0), (1, 2)], "id long, label long")
    rows = noisy_priors(obs, 4, 0.2).collect()
    for r in rows:
        assert abs(sum(r.prior) - 1.0) < 1e-12
        assert max(r.prior) == pytest.approx(0.85)


def test_bp_recovers_planted_sbm(spark):
    """Well-separated SBM + weak side info: BP labels must equal truth."""
    vertices, stream = generate_sbm(spark, n=45, k=3, m=500, p_in=0.9, p_out=0.05, seed=7)
    edges = symmetrize(
        stream.select("src", "dst", F.lit(1).cast("long").alias("weight"))
    ).localCheckpoint(eager=True)
    truth = vertices.select("id", "label")
    priors = noisy_priors(truth, 3, noise=0.5)
    res = belief_propagation(
        spark, edges, priors, k=3, p_in=0.9, p_out=0.05, max_iterations=8, tolerance=1e-8
    )
    joined = res.join(truth.withColumnRenamed("label", "t"), "id")
    mismatches = joined.filter(F.col("label") != F.col("t")).count()
    n = joined.count()
    assert n == 45
    assert mismatches == 0, f"{mismatches}/{n} vertices mislabeled"


def test_bp_agg_equals_kernel(spark):
    """The pure-Catalyst superstep (impl='agg', the 100 TB path) must
    reproduce the grouped Arrow kernel exactly (same math, different
    execution shape)."""
    pairs = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    edges = _sym_edges(spark, pairs)
    obs = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 1), (4, 1), (5, 2)], "id long, label long"
    )
    priors = noisy_priors(obs, K, NOISE)
    kw = dict(k=K, p_in=P_IN, p_out=P_OUT, max_iterations=3, tolerance=-1.0)
    agg = {r.id: (r.label, list(r.belief)) for r in
           belief_propagation(spark, edges, priors, impl="agg", **kw).collect()}
    ker = {r.id: (r.label, list(r.belief)) for r in
           belief_propagation(spark, edges, priors, impl="kernel", **kw).collect()}
    assert agg.keys() == ker.keys()
    for i in agg:
        assert agg[i][0] == ker[i][0]
        for a, b in zip(agg[i][1], ker[i][1]):
            assert abs(a - b) < 1e-9


def test_bp_hub_bounded_group(spark):
    """A high-degree hub (star graph) through the agg path: no Arrow group
    ever holds the hub's whole neighborhood — the partial aggregation
    combiner bounds memory — and the result still matches the python
    oracle (VERDICT r1 #5 / docs/SCALE.md Skew)."""
    hub_deg = 2000
    pairs = [(0, i) for i in range(1, hub_deg + 1)]
    edges = _sym_edges(spark, pairs).repartition(8).localCheckpoint(eager=True)
    obs = spark.createDataFrame(
        [(i, i % K) for i in range(hub_deg + 1)], "id long, label long"
    )
    priors = noisy_priors(obs, K, NOISE)
    res = belief_propagation(
        spark, edges, priors, k=K, p_in=P_IN, p_out=P_OUT,
        max_iterations=2, tolerance=-1.0, impl="agg",
    ).collect()
    prior_map = {r.id: list(r.prior) for r in priors.collect()}
    etup = [(r.src, r.dst, r.weight) for r in edges.collect()]
    oracle = bp_oracle(etup, prior_map, K, P_IN, P_OUT, n_iterations=2)
    assert len(res) == hub_deg + 1
    for r in res:
        olabel, obelief = oracle[r.id]
        assert r.label == olabel
        for a, b in zip(r.belief, obelief):
            assert abs(a - b) < 1e-9
