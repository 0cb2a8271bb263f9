"""Watermarked windowed aggregation over the transcript turn stream
(SURVEY.md §2.10 — the late-data half of Structured Streaming).

The batched reference stream has no late data by construction (its
"stream" is an ordered array, scripts/overall_run.cpp edge replay), so
this op has no reference analogue — it is the piece a production
transcript feed needs: per-(event-time window, role) turn rates where
a bounded amount of disorder is absorbed and anything older than the
watermark is DROPPED, so state cannot grow without bound.

Shape: file-source readStream → withWatermark(ts) → groupBy(window,
role) → append-mode foreachBatch sink. Append mode only emits a window
once the watermark has passed its end — every emitted row is FINAL, so
no upserts are needed; exactly-once then comes from the sink writing
each epoch to its own ``epoch=<batch_id>`` partition with overwrite
(checkpoint replay rewrites, never duplicates). State size is O(open
windows × roles), bounded by the watermark horizon regardless of
stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TURN_SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def turn_rate_stream(
    spark: SparkSession,
    source_dir: str,
    window_duration: str = "5 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming (window_start, role, n_turns) — event-time turn rates.

    Rows later than ``watermark_delay`` behind the max event time seen so
    far are dropped (the documented, bounded-state late-data contract).
    """
    stream = spark.readStream.schema(TURN_SCHEMA).parquet(source_dir)
    return (
        stream.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("w"), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(F.col("w").getField("start").alias("window_start"), "role", "n_turns")
    )


def epoch_sink(out_dir: str):
    """foreachBatch function with idempotent-per-epoch semantics.

    A plain mode("append") would be at-least-once — a failure between the
    parquet write and the checkpoint commit makes the replayed epoch
    APPEND the same finalized rows again as new files. Writing each epoch
    to its own partition directory with overwrite makes replay REWRITE
    (not duplicate) that epoch's output: exactly-once end-to-end. Readers
    see ``epoch`` as a partition column under ``out_dir``."""

    def write_batch(df: DataFrame, epoch: int) -> None:
        df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch}")

    return write_batch


def start_turn_rate_sink(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window_duration: str = "5 minutes",
    watermark_delay: str = "10 minutes",
):
    """Run the turn-rate query, appending FINALIZED windows to parquet.

    availableNow trigger: drains what is currently in source_dir, then
    stops — call again after more files land; the checkpoint carries the
    watermark across restarts, so lateness is enforced end-to-end.
    """
    rates = turn_rate_stream(spark, source_dir, window_duration, watermark_delay)
    return (
        rates.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(epoch_sink(out_dir))
        .trigger(availableNow=True)
        .start()
    )
