"""Hub-skew salting: salted join/aggregate equal the plain versions."""

from __future__ import annotations

import pyspark.sql.functions as F

from sbm_communitydetection_spark.operators.graph_ops import symmetrize
from sbm_communitydetection_spark.operators.skew import (
    csr_adjacency_shards,
    hub_vertices,
    read_csr_adjacency,
    salted_label_join,
    salted_neighbor_community_weights,
)


def _hub_graph(spark):
    """Star hub (vertex 0 connected to 1..40) + a small clique 41..45."""
    pairs = [(0, i) for i in range(1, 41)]
    pairs += [(a, b) for a in range(41, 46) for b in range(a + 1, 46)]
    return symmetrize(
        spark.createDataFrame([(s, d, 1) for s, d in pairs], "src long, dst long, weight long")
    ).localCheckpoint(eager=True)


def test_hub_detection(spark):
    edges = _hub_graph(spark)
    hubs = sorted(r.id for r in hub_vertices(edges, degree_threshold=10).collect())
    assert hubs == [0]


def test_salted_join_equals_plain_join(spark):
    edges = _hub_graph(spark)
    labels = edges.select(F.col("src").alias("id")).distinct().select(
        "id", F.pmod(F.col("id"), F.lit(3)).cast("long").alias("label")
    )
    hubs = hub_vertices(edges, degree_threshold=10)
    plain = (
        edges.join(
            labels.select(F.col("id").alias("dst"), F.col("label").alias("nbr_label")), "dst"
        )
        .select("src", "dst", "weight", "nbr_label")
        .collect()
    )
    salted = salted_label_join(edges, labels, hubs).select(
        "src", "dst", "weight", "nbr_label"
    ).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_salted_a8_equals_plain_a8(spark):
    edges = _hub_graph(spark)
    labels = edges.select(F.col("src").alias("id")).distinct().select(
        "id", F.pmod(F.col("id"), F.lit(4)).cast("long").alias("label")
    )
    hubs = hub_vertices(edges, degree_threshold=10)
    plain = (
        edges.join(
            labels.select(F.col("id").alias("dst"), F.col("label").alias("nbr_label")), "dst"
        )
        .groupBy("src", "nbr_label")
        .agg(F.sum("weight").alias("score"))
        .collect()
    )
    salted = salted_neighbor_community_weights(edges, labels, hubs).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_csr_shards_roundtrip_sorted(spark, tmp_path):
    edges = _hub_graph(spark)
    path = str(tmp_path / "csr")
    csr_adjacency_shards(edges, path, n_shards=4)
    back = read_csr_adjacency(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, edges.collect()))
    # within every file-partition, rows are (src, dst)-sorted
    part_rows = back.rdd.mapPartitions(
        lambda it: [[(r.src, r.dst) for r in it]]
    ).collect()
    for rows in part_rows:
        assert rows == sorted(rows)
