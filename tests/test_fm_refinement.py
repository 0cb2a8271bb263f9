"""ACD 2-way FM refinement (D3): swap-back recovery, monotone Q, balance."""

from __future__ import annotations

import pyspark.sql.functions as F

from sbm_communitydetection_spark.operators.fm_refinement import (
    fm_refine,
    random_balanced_partition,
)
from sbm_communitydetection_spark.operators.graph_ops import symmetrize

from oracles import modularity_oracle


def _two_cliques(spark, size=8):
    pairs = []
    for base in (0, size):
        for i in range(size):
            for j in range(i + 1, size):
                pairs.append((base + i, base + j))
    pairs.append((0, size))  # bridge
    return symmetrize(
        spark.createDataFrame([(s, d, 1) for s, d in pairs], "src long, dst long, weight long")
    )


def test_fm_swaps_misassigned_nodes_back(spark):
    size = 8
    edges = _two_cliques(spark, size).localCheckpoint(eager=True)
    # plant 2 mis-assignments per side
    labels = spark.createDataFrame(
        [(i, 1 if i in (0, 1) else (0 if i in (8, 9) else (0 if i < size else 1)))
         for i in range(2 * size)],
        "id long, label long",
    )
    pairs = spark.createDataFrame([(0, 1)], "label_a long, label_b long")
    refined = {r.id: r.label for r in fm_refine(spark, edges, labels, pairs).collect()}
    assert all(refined[i] == 0 for i in range(size)), refined
    assert all(refined[i] == 1 for i in range(size, 2 * size)), refined


def test_fm_never_decreases_modularity(spark):
    edges = _two_cliques(spark, 6).localCheckpoint(eager=True)
    verts = edges.select(F.col("src").alias("id")).distinct()
    init = random_balanced_partition(verts, k=2, seed=3)
    pairs = spark.createDataFrame([(0, 1)], "label_a long, label_b long")
    refined = fm_refine(spark, edges, init, pairs)
    etup = [(r.src, r.dst, r.weight) for r in edges.collect()]
    q0 = modularity_oracle(etup, {r.id: r.label for r in init.collect()})
    q1 = modularity_oracle(etup, {r.id: r.label for r in refined.collect()})
    assert q1 >= q0 - 1e-12, (q0, q1)


def test_fm_preserves_balance_and_ids(spark):
    edges = _two_cliques(spark, 6).localCheckpoint(eager=True)
    verts = edges.select(F.col("src").alias("id")).distinct()
    init = random_balanced_partition(verts, k=2, seed=7)
    sizes0 = sorted(r["count"] for r in init.groupBy("label").count().collect())
    pairs = spark.createDataFrame([(0, 1)], "label_a long, label_b long")
    refined = fm_refine(spark, edges, init, pairs)
    sizes1 = sorted(r["count"] for r in refined.groupBy("label").count().collect())
    assert sizes0 == sizes1  # balanced swaps preserve community sizes
    assert sorted(r.id for r in refined.collect()) == sorted(r.id for r in verts.collect())


def test_random_balanced_partition_is_balanced(spark):
    verts = spark.range(30).select(F.col("id"))
    part = random_balanced_partition(verts, k=5, seed=1)
    sizes = [r["count"] for r in part.groupBy("label").count().collect()]
    assert sorted(sizes) == [6] * 5
    # deterministic
    a = sorted((r.id, r.label) for r in part.collect())
    b = sorted((r.id, r.label) for r in random_balanced_partition(verts, 5, 1).collect())
    assert a == b
