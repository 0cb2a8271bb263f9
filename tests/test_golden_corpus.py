"""Golden-corpus EP2 analogue + exact-modularity (D4) oracle validation.

The reference's overall_run consumes 16 seeded test_data dirs
({n}_{m}_{k}_{radius}_{inter%}_{intra%}, all n=20) and writes per-metric
algorithm rankings; its gtest suite asserts metric RANGES. Here: the same
configs are regenerated with the seeded SBM source, all engine algorithms
run, metrics must be in-range, and on the well-separated configs LPA must
recover the planted partition exactly; Louvain's modularity is validated
against the exhaustive exact oracle on a 10-vertex graph.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sbm_communitydetection_spark.functions.exact_oracle import (
    exact_max_modularity,
    exact_max_modularity_py,
)
from sbm_communitydetection_spark.functions.metrics import all_metrics
from sbm_communitydetection_spark.operators.graph_ops import canonical_relabel, symmetrize
from sbm_communitydetection_spark.operators.label_propagation import label_propagation
from sbm_communitydetection_spark.operators.louvain import louvain
from sbm_communitydetection_spark.sources.sbm import generate_sbm

# representative slice of the 16-dir corpus (n=20; m, k, p_out, p_in)
CONFIGS = [
    (20, 80, 2, 0.10, 0.90),  # densest, well-separated → exact recovery
    (20, 60, 5, 0.25, 0.75),  # noisier, 5 blocks → range sanity only
]


@pytest.mark.parametrize("n,m,k,p_out,p_in", CONFIGS)
def test_corpus_metric_ranges(spark, n, m, k, p_out, p_in):
    vertices, stream = generate_sbm(spark, n=n, k=k, m=m, p_in=p_in, p_out=p_out, seed=13)
    edges = symmetrize(
        stream.select("src", "dst", F.lit(1).cast("long").alias("weight"))
    ).localCheckpoint(eager=True)
    truth = vertices.select("id", "label")
    pred = label_propagation(
        spark, edges, vertices=vertices, max_iterations=20, variant="keep_own"
    ).state
    metrics = all_metrics(edges, pred, truth)
    # the reference's gtest range asserts (tests/test_algorithms.cpp:182-354)
    for key in (
        "f1_score",
        "node_overlap_accuracy",
        "max_jaccard_sum",
        "edge_classification_accuracy",
        "maximal_matching_accuracy",
        "symmetric_difference",
    ):
        assert 0.0 <= metrics[key] <= 1.0, (key, metrics[key])
    assert -1.0 <= metrics["modularity"] <= 1.0
    assert metrics["log_likelihood"] <= 0.0


def test_corpus_strong_config_exact_recovery(spark):
    n, m, k, p_out, p_in = CONFIGS[0]
    vertices, stream = generate_sbm(spark, n=n, k=k, m=m, p_in=p_in, p_out=p_out, seed=13)
    edges = symmetrize(
        stream.select("src", "dst", F.lit(1).cast("long").alias("weight"))
    ).localCheckpoint(eager=True)
    pred = label_propagation(
        spark, edges, vertices=vertices, max_iterations=20, variant="keep_own"
    ).state
    got = {r.id: r.label for r in canonical_relabel(pred).collect()}
    want = {r.id: r.label for r in canonical_relabel(vertices.select("id", "label")).collect()}
    assert got == want


def test_exact_oracle_tiny_known():
    # two triangles + bridge: optimum = the two triangles
    e = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    sym = [(a, b, 1) for a, b in e] + [(b, a, 1) for a, b in e]
    q, labels = exact_max_modularity_py(sym)
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4] == labels[5]
    assert labels[0] != labels[3]
    # Q = 2·[6/14 − (7/14)²] = 5/14 for the two-triangle partition
    assert q == pytest.approx(5.0 / 14.0, abs=1e-9)


def test_louvain_matches_exact_oracle(spark):
    """D4's role: Louvain must reach the EXACT optimum on a tiny graph."""
    e = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3), (6, 7), (7, 8), (6, 8), (5, 6)]
    edges = symmetrize(
        spark.createDataFrame([(s, d, 1) for s, d in e], "src long, dst long, weight long")
    ).localCheckpoint(eager=True)
    q_exact, _ = exact_max_modularity(edges)
    res = louvain(spark, edges, max_levels=3, max_sweeps=10)
    assert res.modularity == pytest.approx(q_exact, abs=1e-9)
