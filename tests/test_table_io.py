"""TableIO seam (SURVEY §7): Parquet impl roundtrip, Iceberg impl gating,
and IterationDriver accepting an injected TableIO."""

import pytest

from sbm_communitydetection_spark.plans.iterate import IterationDriver
from sbm_communitydetection_spark.sources.table_io import IcebergTableIO, ParquetTableIO


def test_parquet_table_io_roundtrip(spark, tmp_path):
    io = ParquetTableIO(spark, str(tmp_path), "run_a")
    df = spark.range(10).withColumnRenamed("id", "x")
    out = io.write_snapshot(df, 3)
    assert out.count() == 10
    assert io.latest_complete_iteration() == 3
    assert io.read_snapshot(3).count() == 10
    lineage = io.partition_lineage(3)
    assert lineage and sum(e["rows"] for e in lineage) == 10
    assert all(e["bytes"] > 0 for e in lineage)
    assert "iter=3" in io.snapshot_ref(3)


def test_iceberg_table_io_requires_catalog(spark):
    # no Iceberg jars/catalog in this sandbox: constructing the Iceberg
    # implementation must fail loudly, never silently fall back
    with pytest.raises(RuntimeError, match="catalog"):
        IcebergTableIO(spark, "warehouse.graph", "run_b")


def test_iteration_driver_with_injected_io(spark, tmp_path):
    io = ParquetTableIO(spark, str(tmp_path), "run_c")
    d = IterationDriver(spark, run_id="run_c", mode="parquet", table_io=io)
    state = spark.range(5).withColumnRenamed("id", "v")

    def step(s, i):
        return s, float(2 - i)  # converges at i=2

    res = d.run(state, step, max_iterations=5, tolerance=0.0)
    assert res.converged and res.iterations == 2
    # resume point reflects the injected IO's durable snapshots
    assert d.latest_complete_iteration() == 2
    resumed, nxt = d.resume_state()
    assert nxt == 3 and resumed.count() == 5
    assert res.metrics[-1]["partition_lineage"] is not None
