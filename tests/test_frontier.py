"""R-hop frontier (T6 radius-bounded BFS): exact distances."""

from __future__ import annotations

from sbm_communitydetection_spark.operators.graph_ops import symmetrize


def test_r_hop_exact_distances(spark):
    from sbm_communitydetection_spark.operators.frontier import r_hop_neighborhood

    # path 0-1-2-3-4-5 plus a branch 2-10
    e = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (2, 10)]
    edges = symmetrize(
        spark.createDataFrame([(s, d, 1) for s, d in e], "src long, dst long, weight long")
    )
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {r.id: r.dist for r in r_hop_neighborhood(edges, seeds, radius=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 10: 3}
    # radius 0 = just the seeds
    got0 = {r.id: r.dist for r in r_hop_neighborhood(edges, seeds, radius=0).collect()}
    assert got0 == {0: 0}


def test_r_hop_multiple_seeds_min_distance(spark):
    from sbm_communitydetection_spark.operators.frontier import r_hop_neighborhood

    e = [(0, 1), (1, 2), (2, 3), (3, 4)]
    edges = symmetrize(
        spark.createDataFrame([(s, d, 1) for s, d in e], "src long, dst long, weight long")
    )
    seeds = spark.createDataFrame([(0,), (4,)], "id long")
    got = {r.id: r.dist for r in r_hop_neighborhood(edges, seeds, radius=2).collect()}
    # vertex 2 is reached at distance 2 from both ends
    assert got == {0: 0, 4: 0, 1: 1, 3: 1, 2: 2}
