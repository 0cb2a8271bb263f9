"""Quality metrics Q1-Q9 vs hand-computed values + pure-python oracles."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from sbm_communitydetection_spark.functions.hungarian import (
    linear_sum_assignment_min,
    max_assignment_value,
)
from sbm_communitydetection_spark.functions.metrics import (
    all_metrics,
    edge_classification_accuracy,
    embeddedness,
    log_likelihood,
    max_jaccard_sum,
    maximal_matching_accuracy,
    modularity,
    node_overlap_accuracy,
    pairwise_f1,
    symmetric_difference,
)
from sbm_communitydetection_spark.operators.graph_ops import symmetrize
from sbm_communitydetection_spark.sources.sbm import generate_sbm

from oracles import modularity_oracle


def _labels_df(spark, d):
    return spark.createDataFrame(list(d.items()), "id long, label long")


@pytest.fixture(scope="module")
def two_triangles(spark):
    """Two triangles joined by one edge — known modularity structure."""
    e = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    edges = symmetrize(spark.createDataFrame([(s, d, 1) for s, d in e], "src long, dst long, weight long"))
    return edges.localCheckpoint(eager=True)


def test_hungarian_known_cases():
    assert linear_sum_assignment_min([[4.0]]) == [(0, 0)]
    # classic 3x3
    cost = [[4, 1, 3], [2, 0, 5], [3, 2, 2]]
    pairs = dict(linear_sum_assignment_min([[float(x) for x in r] for r in cost]))
    assert sum(cost[i][j] for i, j in pairs.items()) == 5
    assert max_assignment_value([[1, 2], [3, 4]]) == 5  # 2+3
    assert max_assignment_value([[10, 0, 0], [0, 10, 0]]) == 20  # rectangular


def test_modularity_matches_oracle(spark, two_triangles):
    labels = _labels_df(spark, {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1})
    got = modularity(two_triangles, labels).collect()[0][0]
    et = [(r.src, r.dst, r.weight) for r in two_triangles.collect()]
    exp = modularity_oracle(et, {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1})
    assert abs(got - exp) < 1e-12
    # hand value: m=7, intra=6, deg communities = 7 each
    assert abs(exp - (6 / 7 - 2 * (7 / 14) ** 2)) < 1e-12


def test_modularity_on_sbm(spark):
    vertices, stream = generate_sbm(spark, n=40, k=4, m=200, p_in=0.9, p_out=0.1, seed=42)
    edges = symmetrize(stream.select("src", "dst", F.lit(1).cast("long").alias("weight")))
    truth = vertices.select("id", "label")
    got = modularity(edges, truth).collect()[0][0]
    et = [(r.src, r.dst, r.weight) for r in edges.collect()]
    exp = modularity_oracle(et, {r.id: r.label for r in truth.collect()})
    assert abs(got - exp) < 1e-12
    assert got > 0.3  # well-separated SBM has high planted modularity


def test_pairwise_f1_perfect_and_known(spark):
    truth = _labels_df(spark, {0: 0, 1: 0, 2: 1, 3: 1})
    assert pairwise_f1(truth, truth) == 1.0
    # pred merges everything: TP=2 (both same-pairs), FP=4, FN=0
    pred = _labels_df(spark, {0: 5, 1: 5, 2: 5, 3: 5})
    p, r = 2 / 6, 2 / 2
    assert abs(pairwise_f1(pred, truth) - 2 * p * r / (p + r)) < 1e-12


def test_greedy_matching_metrics_known(spark):
    truth = _labels_df(spark, {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1})
    pred = _labels_df(spark, {0: 7, 1: 7, 2: 9, 3: 9, 4: 9, 5: 9})
    # overlap: best pairs (truth1,pred9)=3, then (truth0,pred7)=2 → 5/6
    assert abs(node_overlap_accuracy(pred, truth) - 5 / 6) < 1e-12
    # symmetric difference: pred9 vs truth1 diff=1; pred7 vs truth0 diff=0 → 1/6
    assert abs(symmetric_difference(pred, truth) - 1 / 6) < 1e-12
    # jaccard: (t1,p9): 3/4; (t0,p7): 2/3 → mean over max(2,2)
    assert abs(max_jaccard_sum(pred, truth) - (3 / 4 + 2 / 3) / 2) < 1e-12
    # hungarian matching: same pairing → (3+2)/6
    assert abs(maximal_matching_accuracy(pred, truth) - 5 / 6) < 1e-12
    # perfect prediction up to relabel
    perfect = _labels_df(spark, {0: 4, 1: 4, 2: 4, 3: 2, 4: 2, 5: 2})
    assert maximal_matching_accuracy(perfect, truth) == 1.0
    assert node_overlap_accuracy(perfect, truth) == 1.0
    assert symmetric_difference(perfect, truth) == 0.0
    assert max_jaccard_sum(perfect, truth) == 1.0


def test_edge_classification_accuracy(spark, two_triangles):
    truth = _labels_df(spark, {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1})
    assert abs(edge_classification_accuracy(two_triangles, truth, truth).collect()[0][0] - 1.0) < 1e-12
    # flip node 2 into community 1: edges (0,2),(1,2) become inter (wrong),
    # edge (2,3) becomes intra (wrong) -> 3 of 7 undirected edges wrong
    pred = _labels_df(spark, {0: 0, 1: 0, 2: 1, 3: 1, 4: 1, 5: 1})
    got = edge_classification_accuracy(two_triangles, pred, truth).collect()[0][0]
    assert abs(got - 4 / 7) < 1e-12


def test_embeddedness_known(spark, two_triangles):
    labels = _labels_df(spark, {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1})
    # nodes 0,1,4,5: 2/2 intra; nodes 2,3: 2/3 intra
    got = embeddedness(two_triangles, labels).collect()[0][0]
    assert abs(got - (4 * 1.0 + 2 * (2 / 3))) < 1e-12


def test_log_likelihood_finite_and_signed(spark, two_triangles):
    labels = _labels_df(spark, {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1})
    ll = log_likelihood(two_triangles, labels)
    # intra_e=6, intra_pairs=6 (p_in=1 → contributes 0); inter_e=1, inter_pairs=9
    p_out = 1 / 9
    exp = 1 * math.log(p_out) + 8 * math.log(1 - p_out)
    assert abs(ll - exp) < 1e-12


def test_all_metrics_report(spark):
    vertices, stream = generate_sbm(spark, n=30, k=3, m=150, p_in=0.9, p_out=0.1, seed=42)
    edges = symmetrize(stream.select("src", "dst", F.lit(1).cast("long").alias("weight")))
    truth = vertices.select("id", "label")
    report = all_metrics(edges, truth, truth)
    # self-comparison sanity (reference tests assert ranges; we can be exact)
    assert report["maximal_matching_accuracy"] == 1.0
    assert report["node_overlap_accuracy"] == 1.0
    assert report["f1_score"] == 1.0
    assert report["symmetric_difference"] == 0.0
    assert report["max_jaccard_sum"] == 1.0
    assert abs(report["edge_classification_accuracy"] - 1.0) < 1e-12
    assert 0.0 <= report["modularity"] <= 1.0
    assert report["log_likelihood"] <= 0.0


def test_conductance_two_triangles_with_bridge(spark):
    from sbm_communitydetection_spark.operators.graph_ops import conductance, symmetrize

    raw = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (0, 2, 1), (3, 4, 1), (4, 5, 1), (3, 5, 1), (2, 3, 1)],
        "src long, dst long, weight long",
    )
    labels = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "id long, label long"
    )
    out = {r.label: r.conductance for r in conductance(symmetrize(raw), labels).collect()}
    # each triangle: e_in = 3, e_out = 1 (the bridge) -> 1 / (2*3 + 1)
    assert abs(out[0] - 1 / 7) < 1e-12 and abs(out[1] - 1 / 7) < 1e-12
