"""DCD/Louvain composite (D1): clique recovery, SBM recovery, determinism."""

from __future__ import annotations

import pyspark.sql.functions as F

from sbm_communitydetection_spark.operators.graph_ops import symmetrize
from sbm_communitydetection_spark.operators.louvain import louvain
from sbm_communitydetection_spark.sources.sbm import generate_sbm

from oracles import modularity_oracle


def _ring_of_cliques(spark, n_cliques=4, clique_size=5):
    pairs = []
    for c in range(n_cliques):
        base = c * clique_size
        for i in range(clique_size):
            for j in range(i + 1, clique_size):
                pairs.append((base + i, base + j))
        nxt = ((c + 1) % n_cliques) * clique_size
        pairs.append((base, nxt))  # ring bridge
    return symmetrize(
        spark.createDataFrame([(s, d, 1) for s, d in pairs], "src long, dst long, weight long")
    )


def test_louvain_recovers_cliques(spark):
    edges = _ring_of_cliques(spark).localCheckpoint(eager=True)
    res = louvain(spark, edges, max_levels=3, max_sweeps=8)
    rows = res.labels.collect()
    assert len(rows) == 20
    # every clique must be monochromatic, and distinct cliques distinct
    by_clique = {}
    for r in rows:
        by_clique.setdefault(r.id // 5, set()).add(r.label)
    assert all(len(s) == 1 for s in by_clique.values()), by_clique
    assert len({next(iter(s)) for s in by_clique.values()}) == 4
    # reported modularity equals the oracle modularity of the partition
    etup = [(r.src, r.dst, r.weight) for r in edges.collect()]
    lab = {r.id: r.label for r in rows}
    assert abs(res.modularity - modularity_oracle(etup, lab)) < 1e-9
    # canonical relabel: labels are 0..3 ordered by min member id
    assert by_clique[0] == {0} and by_clique[1] == {1}


def test_louvain_recovers_planted_sbm(spark):
    vertices, stream = generate_sbm(spark, n=48, k=3, m=420, p_in=0.9, p_out=0.05, seed=11)
    edges = symmetrize(
        stream.select("src", "dst", F.lit(1).cast("long").alias("weight"))
    ).localCheckpoint(eager=True)
    res = louvain(spark, edges, max_levels=4, max_sweeps=16)
    truth = {r.id: r.label for r in vertices.collect()}
    pred = {r.id: r.label for r in res.labels.collect()}
    # Louvain optimizes modularity, not the planted truth: require the found
    # partition to score AT LEAST the planted partition's modularity, and be
    # near the truth in co-membership (it may legitimately beat it locally).
    etup = [(r.src, r.dst, r.weight) for r in edges.collect()]
    truth_q = modularity_oracle(etup, truth)
    assert res.modularity >= truth_q - 1e-9, f"Q={res.modularity} < planted Q={truth_q}"
    ids = sorted(pred)
    mismatch = sum(
        1
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if (truth[ids[i]] == truth[ids[j]]) != (pred[ids[i]] == pred[ids[j]])
    )
    total = len(ids) * (len(ids) - 1) // 2
    assert mismatch / total < 0.15, f"{mismatch}/{total} co-membership disagreements"


def test_louvain_deterministic(spark):
    edges = _ring_of_cliques(spark, n_cliques=3, clique_size=4).localCheckpoint(eager=True)
    a = sorted((r.id, r.label) for r in louvain(spark, edges).labels.collect())
    b = sorted((r.id, r.label) for r in louvain(spark, edges).labels.collect())
    assert a == b
