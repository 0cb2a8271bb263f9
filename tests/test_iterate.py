"""IterationDriver: durable checkpointing, lineage metrics, resume (north_rule)."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from sbm_communitydetection_spark.plans.iterate import IterationDriver


def _inc_step(state, i):
    new = state.withColumn("v", F.col("v") + 1)
    # converge when v reaches 5 everywhere
    remaining = new.filter(F.col("v") < 5).count()
    return new, float(remaining)


def test_parquet_checkpoint_and_metrics(spark, tmp_path):
    d = IterationDriver(spark, run_id="t1", checkpoint_dir=str(tmp_path), mode="parquet")
    state = spark.createDataFrame([(i, 0) for i in range(10)], "id long, v long")
    res = d.run(state, _inc_step, max_iterations=10, metric_name="remaining")
    assert res.converged and res.iterations == 5
    assert sorted(r.v for r in res.state.collect()) == [5] * 10
    # durable snapshots exist per iteration
    for i in range(6):
        assert os.path.exists(str(tmp_path / "t1" / f"iter={i}" / "_SUCCESS"))
    # lineage/metrics log has one row per iteration incl. init
    lines = [json.loads(x) for x in open(tmp_path / "t1" / "_metrics.jsonl")]
    assert len(lines) == 6
    assert lines[0]["phase"] == "init"
    assert all("snapshot" in x and "partitions" in x for x in lines)
    assert [x["iteration"] for x in lines] == list(range(6))
    # per-partition lineage: part-file rows sum to the snapshot's row count
    for x in lines:
        pl = x["partition_lineage"]
        assert pl and sum(p["rows"] for p in pl) == 10
        assert all(p["bytes"] > 0 and p["file"].endswith(".parquet") for p in pl)
    # Q10 resource probes: every iteration row carries RSS + CPU of the
    # driver-plus-JVM process tree (reference quality_measures.cpp:190-220)
    assert all(x["rss_bytes"] > 0 and x["cpu_sec"] > 0 for x in lines[1:])


def test_resume_from_latest_snapshot(spark, tmp_path):
    d = IterationDriver(spark, run_id="t2", checkpoint_dir=str(tmp_path), mode="parquet")
    state = spark.createDataFrame([(i, 0) for i in range(10)], "id long, v long")
    # run only 2 iterations (simulated interruption)
    partial = d.run(state, _inc_step, max_iterations=2, metric_name="remaining")
    assert not partial.converged
    assert d.latest_complete_iteration() == 2

    # a NEW driver resumes mid-run from the durable snapshot and finishes
    d2 = IterationDriver(spark, run_id="t2", checkpoint_dir=str(tmp_path), mode="parquet")
    calls = []

    def counting_step(s, i):
        calls.append(i)
        return _inc_step(s, i)

    res = d2.run(state, counting_step, max_iterations=10, resume=True, metric_name="remaining")
    assert res.converged
    assert calls and calls[0] == 3  # continued at iteration 3, not 1
    assert sorted(r.v for r in res.state.collect()) == [5] * 10


def test_local_checkpoint_mode(spark):
    d = IterationDriver(spark, run_id="t3", mode="local")
    state = spark.createDataFrame([(i, 0) for i in range(4)], "id long, v long")
    res = d.run(state, _inc_step, max_iterations=10, metric_name="remaining")
    assert res.converged and sorted(r.v for r in res.state.collect()) == [5] * 4


def test_canonical_relabel_distributed_path_matches_window_path(spark):
    from pyspark.sql import functions as F

    from sbm_communitydetection_spark.operators.graph_ops import canonical_relabel

    labels = spark.createDataFrame(
        [(i, (i * 7) % 5 + 100) for i in range(50)], "id long, label long"
    )
    a = sorted((r.id, r.label) for r in canonical_relabel(labels).collect())
    b = sorted(
        (r.id, r.label)
        for r in canonical_relabel(labels, distributed_threshold=1).collect()
    )
    assert a == b
    assert {lbl for _, lbl in a} == {0, 1, 2, 3, 4}


def test_superseded_state_blocks_released(spark):
    """Back-to-back operators must not pile up their iteration history in
    the block manager (measured r2: LPA 15s fresh vs 47s after PageRank at
    local[32] before the unpersist discipline)."""
    from sbm_communitydetection_spark.operators.graph_ops import symmetrize
    from sbm_communitydetection_spark.operators.label_propagation import label_propagation
    from sbm_communitydetection_spark.operators.pagerank import pagerank

    raw = spark.range(3000).select(
        (F.xxhash64("id") % 200).alias("src"),
        (F.xxhash64("id", F.lit(1)) % 200).alias("dst"),
        F.lit(1).cast("long").alias("weight"),
    )
    edges = symmetrize(raw).localCheckpoint(eager=True)
    sc = spark.sparkContext._jsc.sc()
    base = len(sc.getRDDStorageInfo())
    pagerank(spark, edges, tolerance=-1.0, max_iterations=6, broadcast_rows_threshold=0).count()
    label_propagation(spark, edges, max_iterations=4, variant="plain", tolerance=-1.0).state.count()
    after = len(sc.getRDDStorageInfo())
    # 10 supersteps ran; only the two operators' FINAL states may remain
    # cached beyond what existed before (plus nothing from statics)
    assert after - base <= 2, f"cached RDDs grew {base} -> {after}"


def test_sync_communities_equals_full_recompute(spark):
    """C2 incremental coarsen repair == full C1 recompute after disband
    (src/dynamic_community_detection.cpp:249-276 semantics)."""
    from pyspark.sql import functions as F

    from sbm_communitydetection_spark.operators.graph_ops import (
        coarsen,
        sync_communities,
        symmetrize,
    )
    from sbm_communitydetection_spark.operators.label_propagation import label_propagation

    raw = spark.range(600).select(
        (F.xxhash64("id") % 50).alias("src"),
        (F.xxhash64("id", F.lit(1)) % 50).alias("dst"),
        F.lit(1).cast("long").alias("weight"),
    )
    edges = symmetrize(raw).localCheckpoint(eager=True)
    # an LPA labeling satisfies the label-is-a-member-id invariant
    labels = label_propagation(
        spark, edges, max_iterations=3, variant="keep_own", tolerance=-1.0
    ).state.localCheckpoint(eager=True)
    coarse = coarsen(edges, labels)
    touched = labels.select("label").distinct().orderBy("label").limit(2)

    repaired, new_labels = sync_communities(coarse, edges, labels, touched)
    expected = coarsen(edges, new_labels)

    got = {(r.src, r.dst): r.weight for r in repaired.collect()}
    want = {(r.src, r.dst): r.weight for r in expected.collect()}
    assert got == want
    # disbanded members are singletons; everyone else unchanged
    moved = new_labels.join(labels.withColumnRenamed("label", "old"), "id").filter(
        F.col("label") != F.col("old")
    )
    assert moved.filter(F.col("label") != F.col("id")).count() == 0


def test_pagerank_resumes_mid_iteration(spark, tmp_path):
    """north_rule sentence, verified literally for the flagship op: a
    PageRank run killed after 3 durable snapshots resumes mid-iteration
    from the checkpoint and finishes bit-compatibly (parquet doubles
    round-trip exactly; only partial-sum order may differ -> 1e-12)."""
    from pyspark.sql import functions as F

    from sbm_communitydetection_spark.operators.pagerank import pagerank

    edges = spark.range(4000).select(
        (F.xxhash64("id") % 300).alias("src"),
        (F.xxhash64("id", F.lit(1)) % 300).alias("dst"),
        F.lit(1).cast("long").alias("weight"),
    ).filter(F.col("src") != F.col("dst"))
    edges = edges.localCheckpoint(eager=True)

    # one uninterrupted 6-iteration run (the ground truth)
    d_full = IterationDriver(
        spark, run_id="prfull", checkpoint_dir=str(tmp_path / "full"), mode="parquet"
    )
    full = {
        r.id: r.rank
        for r in pagerank(
            spark, edges, tolerance=-1.0, max_iterations=6, driver=d_full
        ).collect()
    }

    # interrupted run: 3 iterations, then a NEW driver resumes to 6
    d1 = IterationDriver(
        spark, run_id="pr", checkpoint_dir=str(tmp_path / "r"), mode="parquet"
    )
    pagerank(spark, edges, tolerance=-1.0, max_iterations=3, driver=d1)
    assert d1.latest_complete_iteration() == 3
    d2 = IterationDriver(
        spark, run_id="pr", checkpoint_dir=str(tmp_path / "r"), mode="parquet"
    )
    resumed = {
        r.id: r.rank
        for r in pagerank(
            spark, edges, tolerance=-1.0, max_iterations=6, driver=d2, resume=True
        ).collect()
    }
    assert set(resumed) == set(full)
    assert all(abs(resumed[i] - full[i]) < 1e-12 for i in resumed)
    assert d2.latest_complete_iteration() == 6


def test_lpa_resumes_mid_iteration(spark, tmp_path):
    """Resume parity for the LPA superstep state: a run killed after 2
    durable label snapshots resumes with a NEW driver and lands on the
    IDENTICAL label vector as the uninterrupted 4-iteration run (labels
    are longs — the parquet round-trip is exact, so equality is exact)."""
    from sbm_communitydetection_spark.operators.graph_ops import symmetrize
    from sbm_communitydetection_spark.operators.label_propagation import label_propagation

    raw = spark.range(3000).select(
        (F.xxhash64("id") % 200).alias("src"),
        (F.xxhash64("id", F.lit(7)) % 200).alias("dst"),
        F.lit(1).cast("long").alias("weight"),
    )
    edges = symmetrize(raw.filter(F.col("src") != F.col("dst"))).localCheckpoint(eager=True)

    d_full = IterationDriver(
        spark, run_id="lpafull", checkpoint_dir=str(tmp_path / "full"), mode="parquet"
    )
    full = {
        r.id: r.label
        for r in label_propagation(
            spark, edges, tolerance=-1.0, max_iterations=4, driver=d_full
        ).state.collect()
    }

    d1 = IterationDriver(
        spark, run_id="lpa", checkpoint_dir=str(tmp_path / "r"), mode="parquet"
    )
    label_propagation(spark, edges, tolerance=-1.0, max_iterations=2, driver=d1)
    assert d1.latest_complete_iteration() == 2
    d2 = IterationDriver(
        spark, run_id="lpa", checkpoint_dir=str(tmp_path / "r"), mode="parquet"
    )
    resumed = {
        r.id: r.label
        for r in label_propagation(
            spark, edges, tolerance=-1.0, max_iterations=4, driver=d2, resume=True
        ).state.collect()
    }
    assert resumed == full
    assert d2.latest_complete_iteration() == 4


def test_lpa_resume_rejected_for_gain_variant(spark, tmp_path):
    import pytest

    from sbm_communitydetection_spark.operators.label_propagation import label_propagation

    edges = spark.createDataFrame([(0, 1, 1), (1, 0, 1)], "src long, dst long, weight long")
    with pytest.raises(ValueError, match="resume"):
        label_propagation(spark, edges, variant="gain", resume=True)


def test_cc_resumes_mid_iteration(spark, tmp_path):
    """Resume parity for connected components' star-pair state on a long
    path (needs >2 star rounds): kill after 2 durable rounds, resume with
    a NEW driver, and the final component labeling is exactly the full
    run's (= min id per path segment)."""
    from sbm_communitydetection_spark.operators.components import connected_components

    # two disjoint 150-vertex paths: 0..149 and 1000..1149
    rows = [(i, i + 1) for i in range(149)] + [(1000 + i, 1001 + i) for i in range(149)]
    edges = spark.createDataFrame(rows, "src long, dst long").withColumn(
        "weight", F.lit(1).cast("long")
    )

    full = {
        r.id: r.component
        for r in connected_components(
            spark,
            edges,
            driver=IterationDriver(
                spark,
                run_id="ccfull",
                checkpoint_dir=str(tmp_path / "full"),
                mode="parquet",
                keyed_state=False,
            ),
        ).collect()
    }
    assert set(full.values()) == {0, 1000}

    d1 = IterationDriver(
        spark, run_id="cc", checkpoint_dir=str(tmp_path / "r"), mode="parquet", keyed_state=False
    )
    connected_components(spark, edges, driver=d1, max_iterations=2)
    assert d1.latest_complete_iteration() == 2
    d2 = IterationDriver(
        spark, run_id="cc", checkpoint_dir=str(tmp_path / "r"), mode="parquet", keyed_state=False
    )
    resumed = {
        r.id: r.component
        for r in connected_components(spark, edges, driver=d2, resume=True).collect()
    }
    assert resumed == full


def test_bp_resumes_mid_iteration(spark, tmp_path):
    """Resume parity for the BP message state (agg impl): a run killed
    after 2 durable snapshots resumes with a NEW driver and lands on the
    identical belief argmax as the uninterrupted 4-iteration run (the
    array<double> message state round-trips parquet exactly; only
    partial-sum order may differ -> 1e-9 on the belief values)."""
    from sbm_communitydetection_spark.operators.belief_propagation import (
        belief_propagation,
    )
    from sbm_communitydetection_spark.operators.graph_ops import symmetrize

    raw = spark.range(1500).select(
        (F.xxhash64("id") % 120).alias("src"),
        (F.xxhash64("id", F.lit(3)) % 120).alias("dst"),
        F.lit(1).cast("long").alias("weight"),
    )
    edges = symmetrize(raw.filter(F.col("src") != F.col("dst"))).localCheckpoint(
        eager=True
    )
    k = 2
    priors = edges.select(F.col("src").alias("id")).distinct().select(
        "id", F.array(F.lit(0.6), F.lit(0.4)).alias("prior")
    )

    d_full = IterationDriver(
        spark, run_id="bpfull", checkpoint_dir=str(tmp_path / "full"), mode="parquet"
    )
    full = {
        r.id: (r.label, r.belief)
        for r in belief_propagation(
            spark, edges, priors, k, 0.9, 0.1,
            tolerance=-1.0, max_iterations=4, driver=d_full,
        ).collect()
    }

    d1 = IterationDriver(
        spark, run_id="bp", checkpoint_dir=str(tmp_path / "r"), mode="parquet"
    )
    belief_propagation(
        spark, edges, priors, k, 0.9, 0.1,
        tolerance=-1.0, max_iterations=2, driver=d1,
    )
    assert d1.latest_complete_iteration() == 2
    d2 = IterationDriver(
        spark, run_id="bp", checkpoint_dir=str(tmp_path / "r"), mode="parquet"
    )
    resumed = {
        r.id: (r.label, r.belief)
        for r in belief_propagation(
            spark, edges, priors, k, 0.9, 0.1,
            tolerance=-1.0, max_iterations=4, driver=d2, resume=True,
        ).collect()
    }
    assert set(resumed) == set(full)
    for i in resumed:
        assert resumed[i][0] == full[i][0]
        assert all(
            abs(a - b) < 1e-9 for a, b in zip(resumed[i][1], full[i][1])
        )
    assert d2.latest_complete_iteration() == 4
