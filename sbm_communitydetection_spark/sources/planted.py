"""Portable planted-partition graph for exact-recovery oracle gates.

The composite drivers (Louvain D1, FM refinement D3, the batched stream
driver §2.10) are not ANSI-SQL-expressible, so their driver gates were
rows-only checks through round 2.  This module closes that gap the way
the reference's own EP2 harness does (reference: scripts/overall_run.cpp
:24-43 — generate a strongly-separated SBM, treat the PLANTED partition
as ground truth): on a strongly-assortative planted-partition graph the
algorithms recover the planted blocks EXACTLY, and after canonical
relabel (C4, src/dynamic_community_detection.cpp:345-357) the truth is a
pure closed-form table —

    label(id) = id % k          (node b < k is the min id of block b)

— which IS DuckDB-expressible.  The graph itself is built from the
portable 60-bit md5 hash (textops/portable.py), so the construction is a
pure deterministic function of (n, k, p permilles, seed): identical at
any parallelism, any partitioning, either engine.

Edge rule: pair (i, j), i < j, is an edge iff

    md5_60(seed ':' i ':' j) mod 1000  <  p_in_pm   when i % k == j % k
                                          p_out_pm  otherwise

Gate scale is tiny (n ≈ 40-60); the crossJoin pair enumeration is
O(n²) rows = a few thousand and never runs at data scale — the at-scale
SBM path is sources/sbm.py (O(m), no pair enumeration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph_ops import symmetrize
from ..textops.portable import md5_long


def planted_partition(
    spark: SparkSession,
    n: int,
    k: int,
    p_in_pm: int,
    p_out_pm: int,
    seed: int = 7,
) -> tuple[DataFrame, DataFrame]:
    """(vertices(id, label=id%k), symmetric edges(src, dst, weight=1))."""
    a = spark.range(n).select(F.col("id").cast("long").alias("src"))
    b = spark.range(n).select(F.col("id").cast("long").alias("dst"))
    pairs = a.crossJoin(b).filter(F.col("src") < F.col("dst"))
    coin = (
        md5_long(F.concat_ws(":", F.lit(str(seed)), F.col("src"), F.col("dst")))
        % F.lit(1000)
    )
    intra = (F.col("src") % k) == (F.col("dst") % k)
    kept = pairs.filter(
        coin < F.when(intra, F.lit(p_in_pm)).otherwise(F.lit(p_out_pm))
    ).withColumn("weight", F.lit(1).cast("long"))
    vertices = spark.range(n).select(
        F.col("id").cast("long").alias("id"),
        (F.col("id") % k).cast("long").alias("label"),
    )
    return vertices, symmetrize(kept)


def planted_truth_sql(n: int, k: int) -> str:
    """DuckDB oracle: the planted partition after canonical relabel (C4)."""
    return (
        f"SELECT CAST(range AS BIGINT) AS id, CAST(range % {k} AS BIGINT) AS label "
        f"FROM range({n})"
    )


def planted_edge_stream(
    spark: SparkSession, n: int, k: int, p_in_pm: int, p_out_pm: int, seed: int = 7
) -> DataFrame:
    """Directed arrival-ordered stream (src, dst, weight, edge_seq) of the
    planted graph's i<j pairs — input shape for the §2.10 batched driver
    (which symmetrizes per-batch via addUndirectedEdge/G3)."""
    _, edges = planted_partition(spark, n, k, p_in_pm, p_out_pm, seed)
    directed = edges.filter(F.col("src") < F.col("dst"))
    return directed.withColumn(
        "edge_seq", (F.col("src") * F.lit(n) + F.col("dst")).cast("long")
    )
