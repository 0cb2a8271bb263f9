"""The superstep iteration driver — the one genuinely custom piece (SURVEY.md §4).

Spark has no iteration primitive: every iterative graph algorithm here is a
driver-side loop of DataFrame transformations. Naively chaining iterations
grows the logical plan linearly and planning time super-linearly, so each
iteration's state is MATERIALIZED and the lineage truncated, via one of:

* ``local``   — ``df.localCheckpoint(eager=True)`` (fast; cluster-resident)
* ``parquet`` — write state to ``<dir>/<run_id>/iter=<i>/`` and read back.
  This is the durable path: any run is resumable from the latest complete
  snapshot (north_rule "resumable from checkpoint").  The directory layout
  is the Parquet stand-in for the Iceberg snapshot-per-iteration table
  described in SURVEY.md §7 (no Iceberg jars in this sandbox; the seam is
  this class — an Iceberg implementation swaps the write/read calls for
  MERGE/snapshot operations on the same schema).

Alongside state, the driver appends per-iteration METRICS + LINEAGE rows
(run_id, iteration, wall seconds, row count, convergence metric, number of
partitions, input snapshot path) to ``<dir>/<run_id>/_metrics.jsonl`` —
the per-partition lineage + convergence log the north_rule asks for.

The reference has no persistence at all; its analogue of "iteration state"
is in-place pointer mutation (e.g. the per-edge loop at
src/dynamic_community_detection.cpp:32-49).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# Empirical (this sandbox, PySpark 4.1 local mode): a chain of >~15
# localCheckpoints — or even RELIABLE checkpoints — makes each subsequent
# job ~3x slower than the last (exponential recompute-style blowup), while
# a parquet write/read roundtrip stays flat indefinitely. So every
# SEVERANCE_EVERY-th persist goes through parquet to hard-sever the chain;
# the in-between iterations keep the cheap in-memory localCheckpoint.
SEVERANCE_EVERY = 8


def probe_resources() -> dict:
    """Current RSS + cumulative CPU of the driver process AND its JVM
    child — the engine analogue of the reference's per-run Q10 probes
    (utils/quality_measures.cpp:190-220 reads VmRSS / CPU deltas between
    algorithm steps). Two /proc scans, ~1 ms; recorded per iteration in
    the metrics log so memory growth across supersteps is observable,
    not just the end state. Empty dict off-Linux (no /proc)."""
    try:
        me = os.getpid()
        rss = 0
        cpu = 0.0
        tick = os.sysconf("SC_CLK_TCK")
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    parts = f.read().rsplit(")", 1)[1].split()
                # rsplit removes (comm); fields shift by 2 vs proc(5):
                # ppid=parts[1], utime=parts[11], stime=parts[12]
                if int(pid) != me and int(parts[1]) != me:
                    continue
                cpu += (int(parts[11]) + int(parts[12])) / tick
                with open(f"/proc/{pid}/status") as f:
                    for line in f:
                        if line.startswith("VmRSS:"):
                            rss += int(line.split()[1]) * 1024
                            break
            except (OSError, ValueError, IndexError):
                continue
        return {"rss_bytes": rss, "cpu_sec": round(cpu, 2)}
    except (OSError, ValueError, AttributeError):
        return {}


# Durable snapshots go through the TableIO seam (SURVEY §7): Parquet
# directories in this sandbox, Iceberg snapshot-per-iteration when a
# catalog is configured. Re-exported here for existing importers.
from sbm_communitydetection_spark.sources.table_io import (  # noqa: E402
    ParquetTableIO,
    parquet_partition_lineage,
)

__all__ = [
    "IterationDriver",
    "IterationResult",
    "LineageTruncator",
    "cache_partitioned",
    "parquet_partition_lineage",
    "partition_preserving_checkpoint",
    "stats_reset_checkpoint",
    "unpersist_checkpoint",
]


def cache_partitioned(df: DataFrame) -> DataFrame:
    """Materialize a STATIC table (adjacency / transition / reset vector)
    as a compressed columnar cache instead of raw checkpoint blocks.

    Why not partition_preserving_checkpoint for these: checkpoint blocks
    are raw UnsafeRows, so every superstep's probe-side scan streams
    ~29 B/edge over the memory bus; InMemoryRelation stores compressed
    columnar batches (~2-3x smaller for (long, long, double) adjacency),
    trading a little per-scan decompression CPU for bus traffic. Measured
    on the 19.2M-edge PR superstep: steady per-iteration 3.10s -> 2.78s at
    local[8], 1.37 -> 1.32s at local[32], and 2->8 scaling efficiency
    0.81 -> 0.93 (the shared memory bus is the scaling ceiling here —
    BENCH/BASELINE.md's bandwidth probe: 4x processes get only 1.36x
    copy bandwidth). Same reasoning holds on real clusters, where the
    exchange-free probe side being columnar also halves block-manager
    memory.

    Partitioning: Spark 4's AQE reads InMemoryTableScan's output
    partitioning from the cached plan (verified: the PR superstep join
    compiles with NO exchange above the cache scan), so the checkpoint
    plan-surgery workaround is unnecessary here. Lineage is kept (the
    upstream is a real source, eviction just recomputes), so this is for
    STATIC inputs only — iteration state still needs the lineage-severing
    checkpoint. Release with unpersist_checkpoint (handles both forms).
    """
    from pyspark import StorageLevel

    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()  # eager, like the checkpoint path
    return out


def partition_preserving_checkpoint(df: DataFrame, key: str | None = None) -> DataFrame:
    """localCheckpoint that KEEPS the DataFrame's hash partitioning and
    RESETS the plan's inherited size statistics.

    ``key``: name of the column the caller just ``repartition``-ed by.
    Only pass it when that is literally true — it OVERRIDES the recorded
    partitioning with ``hashpartitioning(key, n)``. Needed when the plan
    projects ONE expression under SEVERAL aliases (e.g. the singleton
    label init ``select(id, id AS label)``): the alias-aware recorder
    emits a PartitioningCollection and ``Dataset.checkpoint`` keeps only
    its FIRST leaf, which may be the wrong alias — measured: the LPA
    init recorded ``hash(label)`` instead of ``hash(id)``, so the first
    superstep re-exchanged the label vector twice.

    Two silent checkpoint pathologies, both measured in this runtime:

    1. With AQE enabled, `Dataset.localCheckpoint` materializes an
       AdaptiveSparkPlan whose output partitioning is recorded as
       UnknownPartitioning — so every downstream join/aggregate
       re-exchanges the checkpointed table even when it was just
       repartitioned on the join key. Measured on the PR superstep
       (19.2M-edge bench graph): the "exchange-free adjacency" design
       silently degraded to a full edge-table shuffle EVERY iteration,
       which is why round-1 scaling efficiency was 0.237. Compiling the
       checkpoint with AQE off records the real `hashpartitioning(key, N)`
       on the LogicalRDD; the toggle only affects this materialization
       job, and AQE is restored for everything after.

    2. The LogicalRDD COPIES the origin plan's Catalyst statistics
       (`originStats`). Join size estimates are PRODUCTS of their
       children's `sizeInBytes`, so an iterative loop whose superstep
       references the previous state 2-3 times DOUBLES the stat's digit
       count every iteration even though each checkpointed plan is a
       single leaf: 20 → 42 → 86 → ... digits (measured). By ~25
       compounded supersteps (e.g. warm-started Louvain per stream batch)
       the sizeInBytes is a multi-million-digit BigInt and Catalyst spends
       MINUTES per planning pass inside BigInteger.multiplyToomCook3
       (jstack: SizeInBytesOnlyStatsPlanVisitor.visitJoin). Rebuilding the
       LogicalRDD with `originStats=None` caps the stat at
       defaultSizeInBytes (19 digits) forever; iteration wall time stays
       flat. Side effect (unchanged behavior): checkpointed tables report
       unknown size and are never auto-broadcast — all hot-loop joins
       here already broadcast or hint explicitly.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        ck = df.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    return _stats_reset_rebuild(spark, ck, key)


def stats_reset_checkpoint(df: DataFrame) -> DataFrame:
    """localCheckpoint for UNKEYED iteration state (edge sets, pair
    tables) — stats reset like partition_preserving_checkpoint, but the
    materialization runs with AQE ON.

    There is no partitioning to preserve (the next round re-shuffles on
    different keys anyway), so the AQE-off toggle buys nothing for
    set-valued state; materialization runs under normal AQE planning.
    Warmed interleaved best-of-3 at the 9.6M-edge bench measures the two
    flavors EQUAL for CC (16.7s vs 16.5s total) — this variant exists
    for correctness of intent, not speed: it never stamps a partitioning
    the next round would wrongly trust. The originStats reset is still
    required — CC's step references the previous state 2-3 times per
    round, the digit-doubling pathology (#2 above) applies unchanged."""
    return _stats_reset_rebuild(df.sparkSession, df.localCheckpoint(eager=True), None)


def _stats_reset_rebuild(spark, ck: DataFrame, key: str | None) -> DataFrame:
    try:
        lp = ck._jdf.queryExecution().logical()
        if lp.getClass().getName() != "org.apache.spark.sql.execution.LogicalRDD":
            return ck
        jvm = spark._jvm
        none = jvm.scala.Option.empty()
        partitioning = lp.outputPartitioning()
        if key is not None:
            out, attr = lp.output(), None
            for i in range(out.size()):
                if out.apply(i).name() == key:
                    attr = out.apply(i)
                    break
            n = partitioning.numPartitions() or lp.rdd().getNumPartitions()
            if attr is not None and n > 0:
                partitioning = jvm.org.apache.spark.sql.catalyst.plans.physical.HashPartitioning(
                    spark.sparkContext._jvm.PythonUtils.toSeq([attr]), n
                )
        new_lp = jvm.org.apache.spark.sql.execution.LogicalRDD(
            lp.output(),
            lp.rdd(),
            partitioning,
            lp.outputOrdering(),
            lp.isStreaming(),
            lp.stream(),
            spark._jsparkSession,
            none,  # originStats: see (2) above
            none,  # originConstraints: unused by this workload
        )
        jdf = jvm.org.apache.spark.sql.classic.Dataset.ofRows(spark._jsparkSession, new_lp)
        return DataFrame(jdf, spark)
    except Exception:  # pragma: no cover — internal-API drift safety net
        return ck


def unpersist_checkpoint(df: DataFrame) -> None:
    """Release the storage blocks behind a (local)checkpointed DataFrame.

    localCheckpoint data lives in the block manager until the RDD is
    unpersisted or the context cleaner eventually GCs it; an iterative
    operator leaves its whole state history cached otherwise. Measured on
    the 19.2M-edge bench (local[32], 12g heap): LPA runs 15s in a fresh
    JVM but 47s after a 10-iteration PageRank in the same session — the
    superseded rank vectors + transition table keep ~2GB of blocks live
    and ParallelGC full-collections at 32 threads eat the difference.
    Also releases cache_partitioned tables (storage-level persist).
    No-op for other non-checkpoint DataFrames (parquet reads etc.).

    CAUTION: a localCheckpoint has no lineage to recompute from —
    unpersist only state that nothing will read again.
    """
    try:
        lp = df._jdf.queryExecution().logical()
        if lp.getClass().getName() == "org.apache.spark.sql.execution.LogicalRDD":
            # blocking: deterministic release (async unpersist may lag the
            # next iteration's allocation spike, which is the whole point).
            # NOTE: must be checked BEFORE storageLevel — a checkpointed
            # frame reports its RDD's storage level, but Dataset.unpersist
            # only clears CacheManager entries and would no-op on it.
            lp.rdd().unpersist(True)
        elif df.storageLevel.useMemory or df.storageLevel.useDisk:
            df.unpersist(True)  # cache_partitioned table
    except Exception:  # pragma: no cover — internal-API drift safety net
        pass


class LineageTruncator:
    """Persist iteration state with periodic hard severance via parquet."""

    def __init__(
        self,
        spark: SparkSession,
        prefix: str = "state",
        severance_every: int = SEVERANCE_EVERY,
        severance_dir: str | None = None,
        checkpoint_fn=None,
    ):
        self.spark = spark
        self.prefix = prefix
        self.every = severance_every
        self._dir = severance_dir
        self._count = 0
        self._last_path: str | None = None
        # keyed state (rank/label vectors) preserves its partitioning;
        # unkeyed state (edge sets) passes stats_reset_checkpoint instead
        self._checkpoint = checkpoint_fn or partition_preserving_checkpoint

    def _severance_path(self) -> str:
        if self._dir is None:
            self._dir = tempfile.mkdtemp(prefix=f"spark_graft_{self.prefix}_")
        return os.path.join(self._dir, f"sever_{self._count}")

    def __call__(self, df: DataFrame) -> DataFrame:
        self._count += 1
        if self.every > 0 and self._count % self.every == 0:
            path = self._severance_path()
            df.write.mode("overwrite").parquet(path)
            out = self.spark.read.parquet(path)
            # Eagerly sever lineage from the files we are about to delete:
            # the read-back must not lazily reference a removed snapshot.
            out = out.localCheckpoint(eager=True)
            # Only the latest snapshot is ever referenced again — drop the
            # previous one so long streaming/Louvain runs don't leak disk.
            if self._last_path is not None:
                shutil.rmtree(self._last_path, ignore_errors=True)
            self._last_path = path
            return out
        return self._checkpoint(df)

    def cleanup(self) -> None:
        """Drop all severance snapshots (call when the run's state DataFrame
        is no longer needed)."""
        if self._dir is not None:
            shutil.rmtree(self._dir, ignore_errors=True)
            self._dir = None
            self._last_path = None


@dataclass
class IterationResult:
    state: DataFrame
    iterations: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


class IterationDriver:
    def __init__(
        self,
        spark: SparkSession,
        run_id: str = "run",
        checkpoint_dir: str | None = None,
        mode: str = "local",
        table_io=None,
        keyed_state: bool = True,
    ):
        """mode: 'local' (localCheckpoint) or 'parquet' (durable, resumable).

        ``keyed_state=False``: the iteration state is an unkeyed SET
        (e.g. CC's pair table) — persist with stats_reset_checkpoint
        (AQE on) instead of the partition-preserving path.

        ``table_io``: any TableIO implementation (sources/table_io.py) for
        the durable path; defaults to ParquetTableIO under checkpoint_dir.
        Pass IcebergTableIO(...) on a cluster with an Iceberg catalog —
        nothing else changes."""
        if mode not in ("local", "parquet"):
            raise ValueError(f"unknown checkpoint mode {mode!r}")
        if mode == "parquet" and not (checkpoint_dir or table_io):
            raise ValueError("parquet mode requires checkpoint_dir or table_io")
        self.spark = spark
        self.run_id = run_id
        self.mode = mode
        self.io = table_io
        if mode == "parquet" and self.io is None:
            self.io = ParquetTableIO(spark, checkpoint_dir, run_id)
        self.dir = getattr(self.io, "dir", None)
        self._truncator = LineageTruncator(
            spark,
            prefix=run_id,
            checkpoint_fn=partition_preserving_checkpoint if keyed_state else stats_reset_checkpoint,
        )

    # -- snapshot plumbing -------------------------------------------------
    def _iter_path(self, i: int) -> str:
        assert self.io is not None
        return self.io.snapshot_ref(i)

    def _persist(self, df: DataFrame, i: int) -> DataFrame:
        if self.mode == "local":
            # partition-preserving (see partition_preserving_checkpoint):
            # iteration state stays co-partitioned with the static join
            # inputs, so each superstep shuffles only the intrinsic
            # communication, never the state/adjacency re-exchange
            return self._truncator(df)
        return self.io.write_snapshot(df, i)

    def _log_metrics(self, row: dict) -> None:
        if self.io is None:
            return
        self.io.append_metrics(json.dumps(row))

    def _partition_lineage(self, i: int) -> list[dict] | None:
        """Per-partition lineage for a durable snapshot: one entry per
        data file with its row count and size (parquet footers on the
        driver, or the Iceberg manifest's files table). This is the
        per-partition half of the north_rule's "per-partition lineage +
        convergence metrics"."""
        if self.mode != "parquet":
            return None
        return self.io.partition_lineage(i)

    def latest_complete_iteration(self) -> int | None:
        """Highest durably-committed i — the resume point."""
        if self.io is None:
            return None
        return self.io.latest_complete_iteration()

    def resume_state(self) -> tuple[DataFrame, int] | None:
        """(state, next_iteration) from the latest durable snapshot."""
        i = self.latest_complete_iteration()
        if i is None:
            return None
        return self.io.read_snapshot(i), i + 1

    # -- the loop ----------------------------------------------------------
    def run(
        self,
        state: DataFrame,
        step: Callable[[DataFrame, int], tuple[DataFrame, float]],
        max_iterations: int = 50,
        tolerance: float = 0.0,
        resume: bool = False,
        metric_name: str = "delta",
        log_rows: bool = True,
    ) -> IterationResult:
        """Iterate ``step(state, i) -> (new_state, convergence_metric)``
        until metric <= tolerance or max_iterations.

        The convergence metric is whatever the algorithm defines (count of
        changed labels, max rank delta, ...); it is recorded per iteration.

        ``convergence_metric`` may be a float OR a callable
        ``(persisted_new_state) -> float`` — the callable form is evaluated
        AFTER the state is persisted, so the metric action scans the
        materialized iteration output instead of re-running the whole
        superstep plan (a float metric computed inside ``step`` triggers
        the plan once for the metric and a second time for the eager
        persist — 2x compute per iteration).

        ``log_rows=False`` skips the per-iteration row-count action (the
        count is metrics-only; in fixed-iteration mode it is one whole
        extra job per superstep — measurable at bench scale)."""
        start_iter = 0
        if resume:
            resumed = self.resume_state()
            if resumed is not None:
                state, start_iter = resumed
        if start_iter == 0:
            state = self._persist(state, 0)
            self._log_metrics(
                {
                    "run_id": self.run_id,
                    "iteration": 0,
                    "phase": "init",
                    "rows": state.count(),
                    "partitions": state.rdd.getNumPartitions(),
                    "snapshot": self._iter_path(0) if self.io else "localCheckpoint",
                    "partition_lineage": self._partition_lineage(0),
                }
            )
            start_iter = 1

        metrics: list[dict] = []
        converged = False
        owned = state  # the state WE persisted (safe to release when superseded)
        i = start_iter - 1
        for i in range(start_iter, max_iterations + 1):
            t0 = time.monotonic()
            new_state, metric = step(state, i)
            new_state = self._persist(new_state, i)
            if callable(metric):
                metric = float(metric(new_state))
            rows = new_state.count() if log_rows else -1
            # the superseded state is never read again (steps and metrics
            # only ever touch the immediately-previous state, and the
            # metric just ran) — release its blocks now instead of letting
            # the whole state history pile up in the block manager
            unpersist_checkpoint(owned)
            owned = new_state
            wall = time.monotonic() - t0
            row = {
                "run_id": self.run_id,
                "iteration": i,
                metric_name: metric,
                "rows": rows,
                "partitions": new_state.rdd.getNumPartitions(),
                "wall_sec": round(wall, 4),
                "snapshot": self._iter_path(i) if self.io else "localCheckpoint",
                "partition_lineage": self._partition_lineage(i),
                **probe_resources(),  # Q10: per-iteration RSS/CPU
            }
            metrics.append(row)
            self._log_metrics(row)
            state = new_state
            if metric <= tolerance:
                converged = True
                break
        return IterationResult(state=state, iterations=i, converged=converged, metrics=metrics)
