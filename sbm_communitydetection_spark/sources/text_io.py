"""Text-corpus readers matching the reference's golden-input formats.

S2/S3 in SURVEY.md §2.1: the 16 `test_data/{n}_{m}_{k}_{radius}_{p_out%}_{p_in%}`
directories each hold `edges.txt` (whitespace-separated `src dst`, one
edge per line, duplicates allowed — scripts/overall_run.cpp:46-52) and
`labels.txt` (`id label offset` triples — scripts/overall_run.cpp:36-43).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_edges_txt(spark: SparkSession, path: str) -> DataFrame:
    """edges(edge_seq, src, dst) in file-line arrival order."""
    raw = spark.read.text(path).withColumn("edge_seq", F.monotonically_increasing_id())
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return (
        raw.filter(F.length(F.trim(F.col("value"))) > 0)
        .select(
            "edge_seq",
            parts.getItem(0).cast("long").alias("src"),
            parts.getItem(1).cast("long").alias("dst"),
        )
    )


def read_labels_txt(spark: SparkSession, path: str) -> DataFrame:
    """labels(id, label, offset) ground truth."""
    raw = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return raw.filter(F.length(F.trim(F.col("value"))) > 0).select(
        parts.getItem(0).cast("long").alias("id"),
        parts.getItem(1).cast("long").alias("label"),
        parts.getItem(2).cast("int").alias("offset"),
    )


def decode_dataset_dirname(dirname: str) -> dict:
    """Decode `{n}_{m}_{k}_{radius}_{p_out%}_{p_in%}` (S4:
    scripts/overall_run.cpp:24-31, utils/utilities.cpp:143-151)."""
    n, m, k, radius, p_out, p_in = os.path.basename(dirname.rstrip("/")).split("_")
    return {
        "nodes": int(n),
        "edges": int(m),
        "communities": int(k),
        "radius": int(radius),
        "p_out": int(p_out) / 100.0,
        "p_in": int(p_in) / 100.0,
    }
