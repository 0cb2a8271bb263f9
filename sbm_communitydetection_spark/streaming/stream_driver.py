"""Batched edge-stream community detection — the reference's streaming
semantics (SURVEY.md §2.10).

The reference consumes ONE edge per algorithm step in arrival order
(src/dynamic_community_detection.cpp:32-49, src/belief_propagation.cpp:38,
src/approximate_community_detection.cpp:33) — no watermarks, no late data;
"stream position" is just the ordinal of `addedEdges`. The engine batches
the ordered edge table by its ``edge_seq`` column and runs micro-iterations
per batch:

  1. accumulate the batch into the live symmetrized edge table (G2/G3
     upsert semantics: weights of repeated edges add),
  2. DISBAND the touched communities: every member of a community that a
     new cross-community edge hits reverts to its own singleton label
     (C3, src/dynamic_community_detection.cpp:243-247 — affected-subgraph
     recomputation is the reference's one locality optimization),
  3. re-run synchronous LPA supersteps seeded from the surviving labels,
  4. append a per-batch metrics row — the reference's per-edge accuracy
     log sink S6 (src/approximate_community_detection.cpp:47-55) — to a
     JSONL lineage file and keep it in the result.

Per-batch state is localCheckpoint-truncated; with ``checkpoint_dir``
set, every batch additionally writes durable (edges, labels) parquet
snapshots + a per-partition lineage row, and ``resume=True`` restarts a
killed run from the latest complete batch (north_rule "any run resumes
mid-iteration").
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.metrics import modularity
from ..operators.graph_ops import add_edges, symmetrize
from ..operators.label_propagation import lpa_superstep
from ..plans.iterate import (
    LineageTruncator,
    parquet_partition_lineage,
    unpersist_checkpoint,
)


class StreamCheckpointer:
    """Durable per-batch (edges, labels) snapshots under
    ``<checkpoint_dir>/<run_id>/batch=<b>/{edges,labels}`` — the streaming
    analogue of IterationDriver's parquet mode. A batch is complete when
    both tables carry a _SUCCESS marker; resume loads the highest complete
    batch. The directory layout is the Parquet stand-in for an Iceberg
    snapshot-per-batch table (see plans/iterate.py docstring)."""

    def __init__(self, spark: SparkSession, checkpoint_dir: str, run_id: str = "stream"):
        self.spark = spark
        self.dir = os.path.join(checkpoint_dir, run_id)
        self.run_id = run_id

    def _batch_path(self, b: int, table: str) -> str:
        return os.path.join(self.dir, f"batch={b}", table)

    def persist(self, b: int, edges: DataFrame, labels: DataFrame) -> tuple[DataFrame, DataFrame]:
        e_path, l_path = self._batch_path(b, "edges"), self._batch_path(b, "labels")
        edges.write.mode("overwrite").parquet(e_path)
        labels.write.mode("overwrite").parquet(l_path)
        return self.spark.read.parquet(e_path), self.spark.read.parquet(l_path)

    def lineage(self, b: int) -> dict:
        return {
            "edges": parquet_partition_lineage(self._batch_path(b, "edges")),
            "labels": parquet_partition_lineage(self._batch_path(b, "labels")),
        }

    def latest_complete_batch(self) -> int | None:
        if not os.path.isdir(self.dir):
            return None
        best = None
        for name in os.listdir(self.dir):
            b = _batch_index(name)  # ignores foreign batch=* dirs (ADVICE r4)
            if b is None:
                continue
            if all(
                os.path.exists(os.path.join(self.dir, name, t, "_SUCCESS"))
                for t in ("edges", "labels")
            ):
                best = b if best is None else max(best, b)
        return best

    def resume_state(self) -> tuple[DataFrame, DataFrame, int] | None:
        """(edges, labels, next_batch) from the latest durable snapshot."""
        b = self.latest_complete_batch()
        if b is None:
            return None
        return (
            self.spark.read.parquet(self._batch_path(b, "edges")),
            self.spark.read.parquet(self._batch_path(b, "labels")),
            b + 1,
        )


def _batch_index(name: str) -> int | None:
    """``batch=<int>`` directory name → int, else None.  A stray
    non-numeric directory (``batch=tmp`` from a copy or an editor) must
    be IGNORED, not crash every resume attempt (ADVICE r4)."""
    if not name.startswith("batch="):
        return None
    try:
        return int(name.split("=", 1)[1])
    except ValueError:
        return None


class FoldCheckpointer:
    """Durable per-batch snapshots of a fold's NAMED state tables under
    ``<checkpoint_dir>/<run_id>/batch=<b>/<table>`` — the generic form
    of StreamCheckpointer for the other streaming folds (PR / CC /
    dedup / novelty, VERDICT r3 #9).  A batch is complete when EVERY
    table carries a _SUCCESS marker; resume loads the highest complete
    batch.  Same Iceberg-snapshot-per-batch stand-in layout as
    StreamCheckpointer.

    Two persistence modes per table (VERDICT r4 #2):

    * FULL snapshot (default): the table is rewritten per batch — right
      for state that changes in place (PageRank ranks, CC labels).
    * ``delta_tables``: the caller passes only the batch's APPENDED
      rows; the durable value is the union of the batch dirs ≤ b, read
      back by a multi-path parquet scan.  Right for append-only stores
      and cumulative emission sets (emitted dup pairs, the novelty
      owner store), where a per-batch full rewrite costs
      O(n_batches × cumulative size) I/O against the O(total size) an
      Iceberg snapshot-APPEND (which this layout stands in for) pays.
      Delta reconstruction resumes from the highest batch b with an
      UNBROKEN complete prefix below it — an interior hole would
      silently drop rows, while trailing incomplete batches are simply
      replayed.

    ``manifest`` (ADVICE r4): a small JSON-serializable dict of run
    parameters (n_batches, boundaries, thresholds, input fingerprint).
    The first persist writes ``<run>/manifest.json``; any later persist
    or resume whose manifest differs raises ValueError instead of
    silently folding a DIFFERENT stream onto the old run's state (e.g.
    resuming with changed batch boundaries would return the old run's
    final state for every "already done" batch)."""

    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: str,
        run_id: str,
        tables: tuple[str, ...],
        delta_tables: tuple[str, ...] = (),
        manifest: dict | None = None,
    ):
        self.spark = spark
        self.dir = os.path.join(checkpoint_dir, run_id)
        self.tables = tables
        self.delta_tables = tuple(delta_tables)
        assert set(self.delta_tables) <= set(tables), (delta_tables, tables)
        self.manifest = manifest

    def _path(self, b: int, table: str) -> str:
        return os.path.join(self.dir, f"batch={b}", table)

    def _check_or_write_manifest(self, write: bool) -> None:
        if self.manifest is None:
            return
        # JSON round-trip so tuples/ints compare equal to what disk holds
        mine = json.loads(json.dumps(self.manifest, sort_keys=True))
        path = os.path.join(self.dir, "manifest.json")
        if os.path.exists(path):
            with open(path) as fh:
                on_disk = json.load(fh)
            if on_disk != mine:
                raise ValueError(
                    f"FoldCheckpointer manifest mismatch under {self.dir}: "
                    f"on disk {on_disk!r} vs this run {mine!r} — refusing to "
                    "resume/extend a checkpoint written by a run with "
                    "different parameters or inputs"
                )
        elif write:
            os.makedirs(self.dir, exist_ok=True)
            tmp = path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(mine, fh, sort_keys=True)
            os.replace(tmp, path)

    def _existing_batches(self) -> list[int]:
        if not os.path.isdir(self.dir):
            return []
        return sorted(
            {i for name in os.listdir(self.dir) if (i := _batch_index(name)) is not None}
        )

    def _is_complete(self, b: int) -> bool:
        return all(
            os.path.exists(os.path.join(self._path(b, t), "_SUCCESS"))
            for t in self.tables
        )

    def _read_table(self, t: str, b: int) -> DataFrame:
        if t in self.delta_tables:
            paths = [
                self._path(i, t)
                for i in self._existing_batches()
                if i <= b
                and os.path.exists(os.path.join(self._path(i, t), "_SUCCESS"))
            ]
            return self.spark.read.parquet(*paths)
        return self.spark.read.parquet(self._path(b, t))

    def _write(self, df: DataFrame, path: str) -> None:
        df.write.mode("overwrite").parquet(path)
        # an EMPTY delta (zero partitions) writes only _SUCCESS; rewrite
        # with one empty partition so the schema survives on disk and the
        # multi-path read-back can always infer it
        if not any(n.endswith(".parquet") for n in os.listdir(path)):
            df.repartition(1).write.mode("overwrite").parquet(path)

    def persist(self, b: int, **dfs: DataFrame) -> dict[str, DataFrame]:
        """Write batch ``b``'s tables (full state, or the batch DELTA for
        ``delta_tables``) and return durable read-back handles — for a
        delta table the handle is the reconstructed CUMULATIVE union."""
        assert set(dfs) == set(self.tables), (sorted(dfs), self.tables)
        self._check_or_write_manifest(write=True)
        out = {}
        for t, df in dfs.items():
            self._write(df, self._path(b, t))
            out[t] = self._read_table(t, b)
        return out

    def latest_complete_batch(self) -> int | None:
        existing = self._existing_batches()
        complete = [b for b in existing if self._is_complete(b)]
        if not complete:
            return None
        if not self.delta_tables:
            return max(complete)
        # delta reconstruction needs an unbroken prefix: stop before the
        # first existing-but-incomplete batch
        cset = set(complete)
        best = None
        for b in existing:
            if b not in cset:
                break
            best = b
        return best

    def resume_state(self) -> tuple[dict[str, DataFrame], int] | None:
        """({table: df}, next_batch) from the latest durable snapshot."""
        self._check_or_write_manifest(write=False)
        b = self.latest_complete_batch()
        if b is None:
            return None
        return ({t: self._read_table(t, b) for t in self.tables}, b + 1)


@dataclass
class StreamResult:
    labels: DataFrame  # (id, label) after the last batch
    edges: DataFrame  # accumulated symmetrized edge table
    batches: int
    metrics: list[dict] = field(default_factory=list)


def _batch_metrics(edges: DataFrame, labels: DataFrame, truth: DataFrame | None) -> dict:
    row: dict = {
        "modularity": float(modularity(edges, labels).collect()[0][0]),
        "n_communities": labels.select("label").distinct().count(),
    }
    if truth is not None:
        from ..functions.metrics import edge_classification_accuracy, max_jaccard_sum

        row["edge_cls_acc"] = float(
            edge_classification_accuracy(edges, labels, truth).collect()[0][0]
        )
        row["max_jaccard_sum"] = max_jaccard_sum(labels, truth)
    return row


def stream_community_detection(
    spark: SparkSession,
    edge_stream: DataFrame,
    n_batches: int = 10,
    supersteps_per_batch: int = 3,
    truth: DataFrame | None = None,
    metrics_path: str | None = None,
    initial_edges: DataFrame | None = None,
    initial_labels: DataFrame | None = None,
    lpa_variant: str = "keep_own",
    locality_radius: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    run_id: str = "stream",
) -> StreamResult:
    """Consume ``edge_stream(src, dst, weight, edge_seq)`` in ``n_batches``
    ordered micro-batches, maintaining a community partition throughout.

    ``locality_radius`` bounds each batch's LPA repair to the r-hop BFS
    ball around the affected vertices (disbanded members + batch
    endpoints) — the reference's affected-subgraph locality
    (collectRNeighborhood, src/belief_propagation.cpp:128-167, applied
    here to the DCD repair loop). Labels outside the ball are frozen:
    supersteps run over only the edges whose src lies in the ball, so
    ball vertices still see every neighbor's label while per-batch edge
    work drops from O(|E|) to O(Σ degree over the ball) — the property
    that makes per-batch repair affordable at 10^12-turn scale. Applies
    to the LPA variants; ``gain`` needs globally consistent community
    degrees and always runs on the full graph."""
    bounds = edge_stream.agg(
        F.min("edge_seq").alias("lo"), F.max("edge_seq").alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    if bounds.n == 0:
        raise ValueError("empty edge stream")
    span = (bounds.hi - bounds.lo + 1) / n_batches

    truncate = LineageTruncator(spark, prefix="stream")
    ckpt = StreamCheckpointer(spark, checkpoint_dir, run_id) if checkpoint_dir else None
    edges = (
        initial_edges
        if initial_edges is not None
        else spark.createDataFrame([], "src long, dst long, weight long")
    ).localCheckpoint(eager=True)
    labels = initial_labels.localCheckpoint(eager=True) if initial_labels is not None else None
    metrics: list[dict] = []

    start_batch = 0
    if resume and ckpt is not None:
        resumed = ckpt.resume_state()
        if resumed is not None:
            edges, labels, start_batch = resumed

    for b in range(start_batch, n_batches):
        t0 = time.monotonic()
        lo = bounds.lo + int(b * span)
        hi = bounds.hi + 1 if b == n_batches - 1 else bounds.lo + int((b + 1) * span)
        batch = edge_stream.filter((F.col("edge_seq") >= lo) & (F.col("edge_seq") < hi)).select(
            "src", "dst", "weight"
        )
        batch_sym = symmetrize(batch)
        edges = truncate(add_edges(edges, batch))

        affected = None
        verts = edges.select(F.col("src").alias("id")).distinct()
        if labels is None:
            labels = verts.select("id", F.col("id").alias("label"))
        else:
            # new vertices start as singletons
            labels = verts.join(labels, "id", "left").select(
                "id", F.coalesce("label", "id").alias("label")
            )
            # disband communities touched by a new CROSS-community edge (C3)
            lab_s = labels.select(F.col("id").alias("src"), F.col("label").alias("sl"))
            lab_d = labels.select(F.col("id").alias("dst"), F.col("label").alias("dl"))
            touched = (
                batch_sym.join(lab_s, "src")
                .join(lab_d, "dst")
                .filter(F.col("sl") != F.col("dl"))
                .select(F.explode(F.array("sl", "dl")).alias("label"))
                .distinct()
            )
            if locality_radius is not None:
                # affected set BEFORE disband: members of touched
                # communities plus this batch's endpoints
                affected = (
                    labels.join(touched, "label", "left_semi")
                    .select("id")
                    .unionByName(batch_sym.select(F.col("src").alias("id")))
                    .distinct()
                )
            labels = labels.join(
                touched.withColumn("hit", F.lit(1)), "label", "left"
            ).select(
                "id",
                F.when(F.col("hit").isNotNull(), F.col("id")).otherwise(F.col("label")).alias("label"),
            )
        if lpa_variant == "gain":
            # reference-DCD semantics per batch: warm-started multi-level
            # gain optimization (local moves + community merges) from the
            # current partition — the T2 gain argmax alone stalls at local
            # optima on dense graphs (see label_propagation docstring)
            from ..operators.louvain import louvain

            res = louvain(
                spark,
                edges,
                initial_labels=labels,
                max_levels=2,
                max_sweeps=supersteps_per_batch,
                canonical=False,
            )
            labels = truncate(res.labels)
            unpersist_checkpoint(res.labels)  # superseded membership checkpoint
        else:
            step_edges = edges
            if locality_radius is not None and affected is not None:
                from ..operators.frontier import r_hop_neighborhood

                ball = r_hop_neighborhood(edges, affected, locality_radius).select("id")
                # keep every edge whose UPDATE TARGET (src) is in the ball:
                # outside vertices have no rows and keep their label via
                # lpa_superstep's left join; ball vertices still aggregate
                # over all their neighbors
                step_edges = edges.join(
                    ball.withColumnRenamed("id", "src"), "src", "left_semi"
                ).localCheckpoint(eager=True)
            for _ in range(supersteps_per_batch):
                # truncate EVERY superstep: lpa_superstep references the
                # label plan ~3×, so an unchecked chain grows as 3^steps
                # logical nodes
                labels = truncate(lpa_superstep(step_edges, labels, variant=lpa_variant))

        if ckpt is not None:
            edges, labels = ckpt.persist(b, edges, labels)
        row = {
            "batch": b,
            "edges_seen": int(edges.agg(F.sum("weight") / 2).collect()[0][0] or 0),
            "wall_sec": round(time.monotonic() - t0, 4),
            **_batch_metrics(edges, labels, truth),
        }
        if ckpt is not None:
            row["partition_lineage"] = ckpt.lineage(b)
        metrics.append(row)
        if metrics_path:
            os.makedirs(os.path.dirname(metrics_path) or ".", exist_ok=True)
            with open(metrics_path, "a") as f:
                f.write(json.dumps(row) + "\n")

    return StreamResult(labels=labels, edges=edges, batches=n_batches, metrics=metrics)


def stream_connected_components(
    spark: SparkSession,
    edge_stream: DataFrame,
    n_batches: int = 5,
    checkpoint_dir: str | None = None,
    run_id: str = "stream_cc",
    resume: bool = False,
) -> DataFrame:
    """Streaming connected components: consume ``edge_stream(src, dst,
    weight, edge_seq)`` in ordered micro-batches, folding each batch into
    the component labeling via delta-proportional repair
    (operators/components.incremental_components) — the CC counterpart
    of :func:`stream_community_detection`, and the streaming face of the
    reference's dynamic addEdge loop
    (src/dynamic_community_detection.cpp:51-76).

    Per batch the star rounds touch a merge graph bounded by 2× the
    batch size, never the accumulated graph, so per-batch cost stays
    flat as the stream grows — the property that matters at 10^12
    edges.  The final labeling is EXACTLY ``connected_components`` of
    everything consumed (min-id labels); the gate proves it against the
    full-recompute oracle.

    ``checkpoint_dir`` + ``resume=True`` (VERDICT r3 #9): the labeling
    is snapshotted durably per batch (FoldCheckpointer), and a killed
    run restarts from the latest complete batch — batch spans are
    deterministic from the observed edge_seq range, so the resumed run
    replays exactly the missing batches and ends bit-identical to an
    uninterrupted one (test_streaming kill/restart parity)."""
    from ..operators.components import connected_components, incremental_components

    bounds = edge_stream.agg(
        F.min("edge_seq").alias("lo"), F.max("edge_seq").alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    if bounds.n == 0:
        raise ValueError("empty edge stream")
    span = (bounds.hi - bounds.lo + 1) / n_batches

    ckpt = (
        FoldCheckpointer(spark, checkpoint_dir, run_id, ("labels",))
        if checkpoint_dir
        else None
    )
    labels: DataFrame | None = None
    start_batch = 0
    if resume and ckpt is not None:
        resumed = ckpt.resume_state()
        if resumed is not None:
            labels, start_batch = resumed[0]["labels"], resumed[1]

    for b in range(start_batch, n_batches):
        lo = bounds.lo + int(b * span)
        hi = bounds.hi + 1 if b == n_batches - 1 else bounds.lo + int((b + 1) * span)
        batch = edge_stream.filter((F.col("edge_seq") >= lo) & (F.col("edge_seq") < hi)).select(
            "src", "dst"
        )
        if labels is None:
            labels = connected_components(spark, batch)
        else:
            labels = incremental_components(spark, labels, batch)
        if ckpt is not None:
            labels = ckpt.persist(b, labels=labels)["labels"]
        else:
            # labels are vertex-scale; sever the per-batch star-round lineage
            labels = labels.localCheckpoint(eager=True)
    return labels


def stream_pagerank(
    spark: SparkSession,
    edge_stream: DataFrame,
    boundaries: list[int] | None = None,
    n_batches: int = 3,
    iters_per_batch: int = 3,
    damping: float = 0.85,
    checkpoint_dir: str | None = None,
    run_id: str = "stream_pr",
    resume: bool = False,
) -> DataFrame:
    """Warm-start batched PageRank over an ordered edge stream — the
    dynamic counterpart of operators/pagerank for the flagship
    centrality, completing the engine's dynamic family (stream LPA / BP
    / CC / dedup / novelty) in the reference's streaming semantics
    (ordered ``addedEdges`` consumption, src/dynamic_community_detection
    .cpp:32-49 — batched here as everywhere in §2.10).

    Per batch b (cumulative edge set = all rows with edge_seq below the
    batch bound): carry the previous rank vector forward — new vertices
    seed at 1/n_b, the vector renormalizes to sum 1 — then run exactly
    ``iters_per_batch`` plain power supersteps ((1−d)/n + d·Σ frac·rank,
    no dangling redistribution: the recurrence form of the fixed-iter
    oracle). Warm-starting means each batch needs only enough supersteps
    to absorb the DELTA, not to re-converge from uniform — the property
    that matters when the stream is 10^12 turns and batches are small.

    Deterministic given boundaries (defaults: n_batches equal spans of
    the observed edge_seq range, as stream_connected_components) and
    SQL-mirrorable (stream_pagerank_unrolled_sql). At convergence-tight
    iters the final vector equals batch pagerank on the final graph
    (test_stream_pagerank_converges_to_batch).

    Scale shape per batch: identical to pagerank's superstep (cached
    src-partitioned cumulative adjacency, only the O(n) vector moves);
    the carry-forward join is id-keyed and co-partitioned with the
    state. Each batch's adjacency cache is released before the next.

    ``checkpoint_dir`` + ``resume=True`` (VERDICT r3 #9): the rank
    vector is snapshotted durably per batch; a killed run restarts from
    the latest complete batch (boundaries are deterministic from the
    edge_seq range) and ends bit-identical to an uninterrupted run."""
    from ..plans.iterate import cache_partitioned

    if boundaries is None:
        bounds = edge_stream.agg(
            F.min("edge_seq").alias("lo"), F.max("edge_seq").alias("hi"), F.count("*").alias("n")
        ).collect()[0]
        if bounds.n == 0:
            raise ValueError("empty edge stream")
        span = (bounds.hi - bounds.lo + 1) / n_batches
        boundaries = [
            bounds.hi + 1 if b == n_batches - 1 else bounds.lo + int((b + 1) * span)
            for b in range(n_batches)
        ]

    ckpt = (
        FoldCheckpointer(spark, checkpoint_dir, run_id, ("state",))
        if checkpoint_dir
        else None
    )
    state: DataFrame | None = None
    start_batch = 0
    if resume and ckpt is not None:
        resumed = ckpt.resume_state()
        if resumed is not None:
            state, start_batch = resumed[0]["state"], resumed[1]

    prev_adj = None
    for b, bound in enumerate(boundaries):
        if b < start_batch:
            continue
        cum = edge_stream.filter(F.col("edge_seq") < bound)
        verts = (
            cum.select(F.col("src").alias("id"))
            .unionByName(cum.select(F.col("dst").alias("id")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n = verts.count()
        if n == 0:
            raise ValueError(f"batch bound {bound}: empty cumulative edge set")
        out_w = cum.groupBy("src").agg(F.sum("weight").cast("double").alias("out_w"))
        adj = cache_partitioned(
            cum.join(out_w, "src")
            .select("src", "dst", (F.col("weight") / F.col("out_w")).alias("frac"))
            .repartition("src")
        )
        if state is None:
            init = verts.select("id", F.lit(1.0 / n).alias("rank"))
        else:
            raw = verts.join(
                state.withColumnRenamed("rank", "prank"), "id", "left"
            ).select("id", F.coalesce("prank", F.lit(1.0 / n)).alias("rank"))
            raw = raw.localCheckpoint(eager=True)
            unpersist_checkpoint(state)
            tot = raw.agg(F.sum("rank")).collect()[0][0]
            init = raw.select("id", (F.col("rank") / F.lit(float(tot))).alias("rank"))
        cur = init.repartition("id").localCheckpoint(eager=True)
        for _ in range(iters_per_batch):
            contrib = (
                adj.join(cur.withColumnRenamed("id", "src").hint("SHUFFLE_HASH"), "src")
                .groupBy("dst")
                .agg(F.sum(F.col("frac") * F.col("rank")).alias("c"))
                .withColumnRenamed("dst", "id")
            )
            nxt = verts.join(contrib.hint("SHUFFLE_HASH"), "id", "left").select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce("c", F.lit(0.0))
                ).alias("rank"),
            )
            nxt = nxt.localCheckpoint(eager=True)
            unpersist_checkpoint(cur)
            cur = nxt
        if prev_adj is not None:
            prev_adj.unpersist()
        prev_adj = adj
        state = cur
        if ckpt is not None:
            state = ckpt.persist(b, state=cur)["state"]
            unpersist_checkpoint(cur)  # durable copy supersedes the blocks
    if prev_adj is not None:
        prev_adj.unpersist()
    return state.select("id", F.round("rank", 8).alias("rank"))


def stream_triangles(
    spark: SparkSession,
    edge_stream: DataFrame,
    boundaries: list[int],
    checkpoint_dir: str | None = None,
    run_id: str = "stream_tri",
    resume: bool = False,
) -> DataFrame:
    """(batch_id, triangles) — incremental triangle maintenance over an
    ordered edge stream, completing the dynamic family (stream LPA / BP
    / CC / dedup / novelty / PageRank) for the fourth north-star
    algorithm.  ``edge_stream(src, dst, edge_seq)``; batch b consumes
    rows with edge_seq < boundaries[b] (cumulative), and the emitted
    count per batch is the EXACT triangle count of everything consumed.

    Incremental delta: only triangles containing at least one NEW
    undirected edge can appear, and every such triangle has a new edge
    {a, b} whose common neighbors w in the cumulative graph witness it.
    Candidates are generated from the LOWER-degree endpoint of each new
    edge (one cumulative-degree join decides the probe side), so the
    per-edge candidate cost is min(deg(a), deg(b)) — a new edge landing
    on a 10^7-degree hub probes from its other end; the canonical
    sorted triple dedups triangles discovered through two or three of
    their new edges.  Per-batch cost is delta-proportional, never
    re-counting the accumulated graph — the property that matters at
    10^12 edges.  Counts are scalar per-batch collects (house rule:
    scalars only).

    ``checkpoint_dir`` + ``resume=True`` (VERDICT r3 #9 family): the
    cumulative pair table and the per-batch count history snapshot
    durably per batch; a killed run resumes from the latest complete
    batch and emits the identical count series."""
    canon = (
        edge_stream.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col("edge_seq"),
        )
        .groupBy("a", "b")
        .agg(F.min("edge_seq").alias("edge_seq"))
    )
    ckpt = (
        FoldCheckpointer(spark, checkpoint_dir, run_id, ("cum", "counts"))
        if checkpoint_dir
        else None
    )
    cum = None  # canonical pairs seen so far
    total = 0
    out = []
    prev_bound = None
    start_batch = 0
    if resume and ckpt is not None:
        resumed = ckpt.resume_state()
        if resumed is not None:
            snap, start_batch = resumed
            cum = snap["cum"]
            out = sorted(
                (int(r.batch_id), int(r.triangles)) for r in snap["counts"].collect()
            )
            total = out[-1][1] if out else 0
            prev_bound = boundaries[start_batch - 1]
    for batch_id, bound in enumerate(boundaries):
        if batch_id < start_batch:
            continue
        cond = F.col("edge_seq") < bound
        if prev_bound is not None:
            cond = cond & (F.col("edge_seq") >= prev_bound)
        new = canon.filter(cond).select("a", "b")
        if cum is not None:
            new = new.join(cum, ["a", "b"], "left_anti")
        new = new.localCheckpoint(eager=True)
        nxt_cum = (new if cum is None else cum.unionByName(new)).localCheckpoint(
            eager=True
        )
        sym = nxt_cum.select(F.col("a").alias("u"), F.col("b").alias("w")).unionByName(
            nxt_cum.select(F.col("b").alias("u"), F.col("a").alias("w"))
        )
        deg = sym.groupBy("u").agg(F.count("*").alias("dg"))
        # probe from the lower-degree endpoint: per-edge candidate cost
        # min(deg(a), deg(b)) instead of deg(a) — hub-safe
        oriented = (
            new.join(deg.select(F.col("u").alias("a"), F.col("dg").alias("da")), "a")
            .join(deg.select(F.col("u").alias("b"), F.col("dg").alias("db")), "b")
            .select(
                F.when(F.col("da") <= F.col("db"), F.col("a")).otherwise(F.col("b")).alias("p"),
                F.when(F.col("da") <= F.col("db"), F.col("b")).otherwise(F.col("a")).alias("q"),
            )
        )
        cands = (
            oriented.join(sym.withColumnRenamed("u", "p"), "p")  # w adjacent to probe side
            .join(
                sym.select(F.col("u").alias("q"), F.col("w").alias("w")),
                ["q", "w"],
                "left_semi",
            )  # and adjacent to the other side
            .filter((F.col("w") != F.col("p")) & (F.col("w") != F.col("q")))
            .select(F.array_sort(F.array("p", "q", "w")).alias("tri"))
            .distinct()
        )
        delta = cands.count()
        total += delta
        out.append((batch_id, total))
        if cum is not None:
            unpersist_checkpoint(cum)
        unpersist_checkpoint(new)
        cum = nxt_cum
        prev_bound = bound
        if ckpt is not None:
            snap = ckpt.persist(
                batch_id,
                cum=cum,
                counts=spark.createDataFrame(out, "batch_id int, triangles long"),
            )
            unpersist_checkpoint(cum)
            cum = snap["cum"]
    if cum is not None:
        unpersist_checkpoint(cum)
    return spark.createDataFrame(out, "batch_id int, triangles long")
