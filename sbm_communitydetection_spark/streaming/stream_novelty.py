"""Incremental cross-conversation novelty — the streaming counterpart of
operators/extract.conv_novelty.

A continuously-ingesting transcript pipeline scores conversations as
they arrive; re-running the corpus-wide first-occurrence computation per
delivery is exactly the anti-pattern stream_dedup avoids for LSH.  The
durable state here is the OWNER STORE (bigram → (start_ms, conv_id) of
its first claimant).  Because batches arrive in conversation-start
order, ownership is decided forever in the batch where a bigram first
appears — later arrivals can only lose ownership races — so each
conversation's novelty emitted AT ITS ARRIVAL BATCH is already final,
and the union of per-batch emissions equals the one-shot batch operator
on the full corpus (the gate proves it against that oracle).

Per-batch cost: O(batch bigrams) — one anti-join against the store for
new owners, one equi-join for scoring, one store fold.  The store grows
one row per distinct corpus bigram (vocab-bounded), bucketable by the
gram hash on a lake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..textops.portable import shingles_col


def stream_conv_novelty(
    spark: SparkSession,
    transcripts: DataFrame,
    n_batches: int = 5,
) -> DataFrame:
    """(conv_id, n_bigrams, n_novel, novelty) — identical to
    operators/extract.conv_novelty, produced by folding ``n_batches``
    conversation-start-ordered micro-batches through the owner store."""
    start = transcripts.groupBy("conv_id").agg(
        F.unix_millis(F.min("ts").cast("timestamp")).alias("start_ms")
    )
    w = Window.orderBy("start_ms", "conv_id")
    batched = start.withColumn("batch", F.ntile(n_batches).over(w)).localCheckpoint(
        eager=True
    )

    all_grams = (
        transcripts.select(
            "conv_id", F.explode(shingles_col(F.col("text"), 2)).alias("g")
        )
        .distinct()
        .join(batched, "conv_id")
    ).localCheckpoint(eager=True)

    store = spark.createDataFrame([], "g string, start_ms long, owner_conv string")
    outputs = []
    owned = [batched, all_grams, store]
    for b in range(1, n_batches + 1):
        grams_b = all_grams.filter(F.col("batch") == b)
        # owners among THIS batch's claims, for grams the store hasn't seen
        new_owner = (
            grams_b.groupBy("g")
            .agg(F.min(F.struct("start_ms", "conv_id")).alias("first"))
            .join(store.select("g"), "g", "left_anti")
            .select(
                "g",
                F.col("first.start_ms").alias("start_ms"),
                F.col("first.conv_id").alias("owner_conv"),
            )
        )
        store = store.unionByName(new_owner).localCheckpoint(eager=True)
        owned.append(store)
        outputs.append(
            grams_b.join(store.select("g", "owner_conv"), "g")
            .groupBy("conv_id")
            .agg(
                F.count("*").cast("long").alias("n_bigrams"),
                F.sum(
                    F.when(F.col("owner_conv") == F.col("conv_id"), 1).otherwise(0)
                )
                .cast("long")
                .alias("n_novel"),
            )
            .withColumn(
                "novelty", F.round(F.col("n_novel") / F.col("n_bigrams"), 6)
            )
            .localCheckpoint(eager=True)
        )
        owned.append(outputs[-1])

    out = outputs[0]
    for o in outputs[1:]:
        out = out.unionByName(o)
    result = out.localCheckpoint(eager=True)
    from ..plans.iterate import unpersist_checkpoint

    for df in owned:
        unpersist_checkpoint(df)
    return result
