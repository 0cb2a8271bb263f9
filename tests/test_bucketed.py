"""Bucketed adjacency layout: the 100 TB side of a superstep must join
exchange-free straight off disk (SCALE.md "Data layout")."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sbm_communitydetection_spark.sources.bucketed import (
    physical_exchange_count,
    read_bucketed_adjacency,
    scan_is_bucketed,
    write_bucketed_adjacency,
)


@pytest.fixture(scope="module")
def edges(spark):
    return spark.range(20000).select(
        (F.xxhash64("id") % 1000).alias("src"),
        (F.xxhash64("id", F.lit(1)) % 1000).alias("dst"),
        F.lit(1).cast("long").alias("weight"),
    )


def _superstep_plan(adj, state):
    # one PR-shaped superstep: probe join on src, re-aggregate on dst
    return (
        adj.join(state.hint("SHUFFLE_HASH"), "src")
        .groupBy("dst")
        .agg(F.sum(F.col("rank") * F.col("weight")).alias("contrib"))
    )


def test_bucketed_superstep_joins_exchange_free(spark, edges):
    # lands in the session warehouse dir; dropped in the finally block
    write_bucketed_adjacency(edges, "adj_bucketed_test", buckets=8)
    try:
        adj = read_bucketed_adjacency(spark, "adj_bucketed_test")
        state = spark.range(1000).select(F.col("id").alias("src"), F.lit(1.0).alias("rank"))
        # shuffle partitions must match the bucket count for elision
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            # bucketing is reported on the scan only when a plan consumes
            # the hash distribution — assert on the superstep plan
            assert scan_is_bucketed(_superstep_plan(adj, state))
            bucketed_exchanges = physical_exchange_count(_superstep_plan(adj, state))
            plain_exchanges = physical_exchange_count(_superstep_plan(edges, state))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

        # bucketed: only the state vector + the dst re-aggregation move
        # (2 exchanges); unbucketed adjacency adds a third — the 100 TB
        # table itself
        assert bucketed_exchanges == 2
        assert plain_exchanges == 3

        # and the result is the same data
        got = sorted(
            tuple(r) for r in _superstep_plan(adj, state).collect()
        )
        want = sorted(tuple(r) for r in _superstep_plan(edges, state).collect())
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS adj_bucketed_test")


def test_pagerank_over_bucketed_transition_matches_inline_build(spark, edges):
    from sbm_communitydetection_spark.operators.pagerank import pagerank
    from sbm_communitydetection_spark.sources.bucketed import write_transition_table

    e = edges.localCheckpoint(eager=True)
    write_transition_table(e, "pr_transition_test", buckets=8)
    try:
        tr = read_bucketed_adjacency(spark, "pr_transition_test")
        inline = {r.id: r.rank for r in pagerank(spark, e, tolerance=-1.0, max_iterations=5).collect()}
        prebuilt = {
            r.id: r.rank
            for r in pagerank(
                spark, None, tolerance=-1.0, max_iterations=5, transition=tr
            ).collect()
        }
        assert inline.keys() == prebuilt.keys()
        assert all(abs(inline[k] - prebuilt[k]) < 1e-12 for k in inline)
    finally:
        spark.sql("DROP TABLE IF EXISTS pr_transition_test")


def test_lpa_over_dst_bucketed_adjacency_matches_inline(spark, edges):
    from sbm_communitydetection_spark.operators.graph_ops import symmetrize
    from sbm_communitydetection_spark.operators.label_propagation import label_propagation

    sym = symmetrize(edges).localCheckpoint(eager=True)
    write_bucketed_adjacency(sym, "lpa_adj_dst_test", buckets=8, key="dst")
    try:
        adj = read_bucketed_adjacency(spark, "lpa_adj_dst_test")
        inline = {
            r.id: r.label
            for r in label_propagation(
                spark, sym, max_iterations=3, tolerance=-1.0
            ).state.collect()
        }
        prebuilt = {
            r.id: r.label
            for r in label_propagation(
                spark, adj, max_iterations=3, tolerance=-1.0,
                edges_partitioned_by_dst=True,
            ).state.collect()
        }
        assert inline == prebuilt
    finally:
        spark.sql("DROP TABLE IF EXISTS lpa_adj_dst_test")


def test_triangle_count_over_oriented_bucketed_matches_inline(spark, edges):
    """VERDICT r3 #4: the oriented-adjacency table served off disk must
    (a) produce the same triangle count as the inline orientation,
    (b) compile to strictly fewer exchanges (the orientation's distinct
    + degree joins are gone, and the lo-keyed wedge side scans
    pre-partitioned)."""
    from sbm_communitydetection_spark.operators.triangles import triangle_count
    from sbm_communitydetection_spark.sources.bucketed import (
        write_oriented_adjacency,
    )

    write_oriented_adjacency(edges, "tri_oriented_test", buckets=8)
    try:
        o = read_bucketed_adjacency(spark, "tri_oriented_test")
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            plain = triangle_count(edges)
            bucketed = triangle_count(edges, oriented=o)
            assert plain.collect()[0][0] == bucketed.collect()[0][0]
            assert scan_is_bucketed(bucketed)
            n_bucketed = physical_exchange_count(bucketed)
            n_plain = physical_exchange_count(plain)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        assert n_bucketed < n_plain, (n_bucketed, n_plain)
    finally:
        spark.sql("DROP TABLE IF EXISTS tri_oriented_test")


def test_drop_stale_handles_db_qualified_and_current_database(spark):
    """ADVICE r4: _drop_stale must clean the true warehouse location for
    db-qualified names (db.tbl → <wh>/<db>.db/<tbl>) and under a
    non-default current database — both the cataloged and the orphaned
    (catalog-lost) states."""
    import os
    import re

    from sbm_communitydetection_spark.sources.bucketed import _drop_stale

    wh = re.sub(r"^file:/*", "/", spark.conf.get("spark.sql.warehouse.dir"))
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmpdb")
    try:
        # cataloged db-qualified table: location resolved via the catalog
        spark.range(3).write.mode("overwrite").saveAsTable("graft_tmpdb.graft_ds1")
        p1 = os.path.join(wh, "graft_tmpdb.db", "graft_ds1")
        assert os.path.isdir(p1)
        _drop_stale(spark, "graft_tmpdb.graft_ds1")
        assert not os.path.isdir(p1)
        assert not spark.catalog.tableExists("graft_tmpdb.graft_ds1")

        # orphaned dir (catalog entry lost): fallback path reconstruction
        os.makedirs(p1, exist_ok=True)
        _drop_stale(spark, "graft_tmpdb.graft_ds1")
        assert not os.path.isdir(p1)

        # non-default CURRENT database with an unqualified name
        spark.catalog.setCurrentDatabase("graft_tmpdb")
        try:
            spark.range(3).write.mode("overwrite").saveAsTable("graft_ds2")
            p2 = os.path.join(wh, "graft_tmpdb.db", "graft_ds2")
            assert os.path.isdir(p2)
            _drop_stale(spark, "graft_ds2")
            assert not os.path.isdir(p2)
        finally:
            spark.catalog.setCurrentDatabase("default")
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql("DROP DATABASE IF EXISTS graft_tmpdb CASCADE")
