"""Structured Streaming ingestion for the edge stream (SURVEY.md §2.10).

True Structured Streaming is OPTIONAL for reference parity (its stream is
just an ordered array), but the engine ships a real `readStream` path so a
deployment can tail an edge feed (files landing in a directory, or Kafka
with the same schema) and keep the materialized symmetrized edge table —
the input of every iterative operator — continuously up to date.

Shape: file-source `readStream` → `foreachBatch` MERGE into a parquet
state table with G2 accumulate semantics (weights of repeated edges add —
src/graph.cpp:24-26). foreachBatch is the deliberate choice over a
stateful streaming aggregation: the edge table is the engine's durable
working relation, and each micro-batch's merge is an idempotent
read-modify-write of the partition-pruned slice it touches. On Iceberg
this becomes MERGE INTO; the parquet implementation rewrites only the
hash-bucket subdirectories the batch touches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph_ops import symmetrize

EDGE_SCHEMA = "src long, dst long, weight long, edge_seq long"
N_BUCKETS = 64


def read_edge_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 10) -> DataFrame:
    """File-source streaming DataFrame over parquet edge batches."""
    return (
        spark.readStream.schema(EDGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def _merge_batch(state_dir: str, spark: SparkSession, batch_df: DataFrame) -> None:
    """Accumulate one micro-batch into the bucketed parquet edge state."""
    batch_sym = symmetrize(batch_df.select("src", "dst", "weight")).withColumn(
        "bucket", F.pmod(F.xxhash64("src"), F.lit(N_BUCKETS))
    )
    touched = [r.bucket for r in batch_sym.select("bucket").distinct().collect()]
    if not touched:
        return
    existing = None
    if os.path.isdir(state_dir):
        dirs = [
            f"{state_dir}/bucket={b}"
            for b in touched
            if os.path.isdir(f"{state_dir}/bucket={b}")
        ]
        if dirs:
            existing = (
                spark.read.option("basePath", state_dir)
                .parquet(*dirs)
                .select("src", "dst", "weight", "bucket")
            )
    merged = batch_sym if existing is None else existing.unionByName(batch_sym)
    merged = (
        merged.groupBy("bucket", "src", "dst")
        .agg(F.sum("weight").alias("weight"))
        .filter(F.col("weight") != 0)
    )
    # rewrite ONLY the touched buckets (partition-pruned read-modify-write)
    merged.write.mode("overwrite").partitionBy("bucket").option(
        "partitionOverwriteMode", "dynamic"
    ).parquet(state_dir)


def start_edge_ingest(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Start (and return) the streaming query maintaining the edge table.

    ``trigger_available_now`` drains everything currently in source_dir and
    stops — the test/batch-catchup mode; otherwise runs continuously.
    """
    stream = read_edge_stream(spark, source_dir)
    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(lambda df, _epoch: _merge_batch(state_dir, spark, df))
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_edge_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The live symmetrized edge table maintained by the ingest query."""
    return spark.read.parquet(state_dir).select("src", "dst", "weight")
