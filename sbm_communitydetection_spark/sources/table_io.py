"""TableIO — the durable-snapshot seam promised in SURVEY.md §7.

The north rule stores iteration state "to Iceberg with per-partition
lineage"; this sandbox has no Iceberg jars, so the checkpoint/lineage
layer is written against this thin interface:

* ``ParquetTableIO`` — directory-per-iteration Parquet snapshots
  (``<root>/<run_id>/iter=<i>/``). The implementation used everywhere
  in this repo; byte-identical behavior to what plans/iterate.py did
  inline before the seam existed.
* ``IcebergTableIO`` — the same schema on a real Iceberg catalog:
  one table per run partitioned by an ``iteration`` column, written
  with the DataFrameWriterV2 (``writeTo(...).overwritePartitions()``,
  i.e. one Iceberg snapshot per iteration), per-partition lineage read
  from the ``<table>.files`` metadata table (record_count +
  file_size_in_bytes per data file), resume point from
  ``MAX(iteration)``. Constructing it verifies an Iceberg catalog is
  actually configured and raises ``RuntimeError`` otherwise — no
  silent fallback.

Swapping implementations is one constructor argument on
``IterationDriver(table_io=...)``; nothing else in the engine changes.
The reference keeps no durable state at all (its iteration state is
in-place pointer mutation, src/dynamic_community_detection.cpp:32-49).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parquet_partition_lineage(path: str) -> list[dict] | None:
    """One lineage entry per parquet part-file of a snapshot directory —
    rows from the file footer, bytes from the filesystem; read on the
    driver, no Spark job. On Iceberg the same rows come from the
    manifest's per-file record counts (see IcebergTableIO)."""
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover
        return None
    if not os.path.isdir(path):
        return None
    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        fp = os.path.join(path, name)
        out.append(
            {
                "file": name,
                "rows": pq.ParquetFile(fp).metadata.num_rows,
                "bytes": os.path.getsize(fp),
            }
        )
    return out


class ParquetTableIO:
    """Directory-per-iteration Parquet snapshots under ``root/run_id``."""

    def __init__(self, spark: SparkSession, root: str, run_id: str):
        self.spark = spark
        self.dir = os.path.join(root, run_id)

    def _iter_path(self, i: int) -> str:
        return os.path.join(self.dir, f"iter={i}")

    def snapshot_ref(self, i: int) -> str:
        """Stable string identifying iteration i's snapshot (for logs)."""
        return self._iter_path(i)

    def write_snapshot(self, df: DataFrame, i: int) -> DataFrame:
        path = self._iter_path(i)
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)

    def read_snapshot(self, i: int) -> DataFrame:
        return self.spark.read.parquet(self._iter_path(i))

    def latest_complete_iteration(self) -> int | None:
        """Highest i whose snapshot finished (Parquet: _SUCCESS marker;
        a killed mid-write snapshot has none, so resume skips it)."""
        if not os.path.isdir(self.dir):
            return None
        best = None
        for name in os.listdir(self.dir):
            if name.startswith("iter=") and os.path.exists(
                os.path.join(self.dir, name, "_SUCCESS")
            ):
                i = int(name.split("=", 1)[1])
                best = i if best is None else max(best, i)
        return best

    def partition_lineage(self, i: int) -> list[dict] | None:
        return parquet_partition_lineage(self._iter_path(i))

    def append_metrics(self, row_json: str) -> None:
        os.makedirs(self.dir, exist_ok=True)
        with open(os.path.join(self.dir, "_metrics.jsonl"), "a") as f:
            f.write(row_json + "\n")


class IcebergTableIO:
    """Iteration snapshots as partitions of ONE Iceberg table per run.

    Layout: ``<catalog>.<namespace>.<run_id>`` partitioned by the
    injected ``iteration`` column. Each write is
    ``writeTo(table).overwritePartitions()`` — idempotent per iteration
    (a retried superstep replaces, not duplicates, its partition) and
    one Iceberg snapshot per iteration, which is what makes any run
    time-travelable (``VERSION AS OF``) and resumable.
    """

    def __init__(self, spark: SparkSession, table_prefix: str, run_id: str):
        self.spark = spark
        self.table = f"{table_prefix}.{run_id}"
        self._created = False
        # Fail fast if no Iceberg catalog is configured: the first dotted
        # component of the prefix must resolve to a catalog plugin.
        catalog = table_prefix.split(".", 1)[0]
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
        if impl is None:
            raise RuntimeError(
                f"no Iceberg catalog configured under spark.sql.catalog.{catalog}; "
                "add the iceberg-spark-runtime jar and catalog conf, or use "
                "ParquetTableIO (this sandbox has no Iceberg jars)"
            )

    def snapshot_ref(self, i: int) -> str:
        return f"{self.table}@iteration={i}"

    def write_snapshot(self, df: DataFrame, i: int) -> DataFrame:
        tagged = df.withColumn("iteration", F.lit(i))
        writer = tagged.writeTo(self.table)
        if not self._created:
            writer.partitionedBy(F.col("iteration")).createOrReplace()
            self._created = True
        else:
            writer.overwritePartitions()
        return self.read_snapshot(i)

    def read_snapshot(self, i: int) -> DataFrame:
        return (
            self.spark.table(self.table)
            .where(F.col("iteration") == F.lit(i))
            .drop("iteration")
        )

    def latest_complete_iteration(self) -> int | None:
        try:
            row = self.spark.table(self.table).agg(F.max("iteration")).collect()[0]
        except Exception:
            return None  # table does not exist yet
        return None if row[0] is None else int(row[0])

    def partition_lineage(self, i: int) -> list[dict] | None:
        """Per-data-file record counts from the Iceberg ``files`` metadata
        table — the manifest-backed equivalent of reading parquet footers."""
        try:
            rows = (
                self.spark.table(f"{self.table}.files")
                .where(F.col("partition.iteration") == F.lit(i))
                .select("file_path", "record_count", "file_size_in_bytes")
                .collect()
            )
        except Exception:
            return None
        return [
            {"file": r["file_path"], "rows": r["record_count"], "bytes": r["file_size_in_bytes"]}
            for r in rows
        ]

    def append_metrics(self, row_json: str) -> None:
        """Convergence/lineage rows go to ``<table>_metrics`` (append-only;
        on Iceberg an append is itself a committed snapshot)."""
        df = self.spark.createDataFrame([(row_json,)], "row string")
        try:
            df.writeTo(f"{self.table}_metrics").append()
        except Exception:
            df.writeTo(f"{self.table}_metrics").createOrReplace()
