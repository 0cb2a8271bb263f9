"""Partition-quality audit — measures what a vertex→partition
assignment costs at the shuffle layer, per partition:

    edge-cut weight      — messages crossing partitions each superstep
    internal weight      — work that stays local
    communication volume — distinct (boundary vertex, foreign part)
                           pairs, i.e. the replication factor a
                           vertex-cut engine would pay (Gonzalez et
                           al., PowerGraph OSDI'12 metric)
    vertex balance       — straggler exposure

The north rule demands "partitioning / shuffle / skew handled
explicitly"; this operator is the measuring stick: run it on a
candidate layout (hash, range, community-aligned from louvain/lpa)
BEFORE committing a 100 TB table to it.  The reference engine keeps
the whole graph in one address space (src/graph.cpp) so no analogue
exists; this op is Spark-native by construction.

Scale shape: two vertex-attribute joins (edges ⋈ assignment on src,
then dst — the canonical pair of co-partitioned shuffles; at 10^12
edges each is one exchange keyed on the join column), one distinct
over (src, dst_part) for the volume term (bounded by the cut size,
not the edge count), and two part-keyed hash aggregates.  No windows,
no Python, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..textops.portable import md5_long, md5_long_sql

DEFAULT_PARTS = 8


def hash_partition_assignment(edges: DataFrame, num_parts: int = DEFAULT_PARTS) -> DataFrame:
    """(id, part) — portable-hash block assignment of every vertex.

    Deterministic and engine-portable (md5-based, cf. textops.portable),
    so the DuckDB oracle reproduces it bit-for-bit; stands in for any
    real layout (range partitioner, community-aligned, METIS import)."""
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return verts.select(
        "id",
        F.pmod(md5_long(F.col("id").cast("string")), F.lit(num_parts))
        .cast("long")
        .alias("part"),
    )


def partition_quality(edges: DataFrame, assignment: DataFrame) -> DataFrame:
    """(part, n_vertices, internal_w, cut_w, comm_volume) — per-partition
    cost profile of `assignment(id, part)` over `edges(src, dst, weight)`.

    On a symmetrized edge table the out-view equals the in-view, so the
    src-side grouping captures both directions; cut_w sums the weight of
    edges leaving the partition and comm_volume counts distinct
    (vertex, foreign part) pairs — the PowerGraph replication factor
    numerator."""
    a_src = assignment.select(F.col("id").alias("src"), F.col("part").alias("src_part"))
    a_dst = assignment.select(F.col("id").alias("dst"), F.col("part").alias("dst_part"))
    e = edges.join(a_src, "src").join(a_dst, "dst")
    w_stats = e.groupBy(F.col("src_part").alias("part")).agg(
        F.sum(
            F.when(F.col("src_part") == F.col("dst_part"), F.col("weight")).otherwise(0)
        )
        .cast("long")
        .alias("internal_w"),
        F.sum(
            F.when(F.col("src_part") != F.col("dst_part"), F.col("weight")).otherwise(0)
        )
        .cast("long")
        .alias("cut_w"),
    )
    volume = (
        e.filter(F.col("src_part") != F.col("dst_part"))
        .select("src_part", "src", "dst_part")
        .distinct()
        .groupBy(F.col("src_part").alias("part"))
        .agg(F.count("*").cast("long").alias("comm_volume"))
    )
    n_verts = assignment.groupBy("part").agg(
        F.count("*").cast("long").alias("n_vertices")
    )
    return (
        n_verts.join(w_stats, "part", "left")
        .join(volume, "part", "left")
        .select(
            "part",
            "n_vertices",
            F.coalesce("internal_w", F.lit(0)).cast("long").alias("internal_w"),
            F.coalesce("cut_w", F.lit(0)).cast("long").alias("cut_w"),
            F.coalesce("comm_volume", F.lit(0)).cast("long").alias("comm_volume"),
        )
    )


def partition_quality_sql(num_parts: int = DEFAULT_PARTS) -> str:
    """DuckDB twin over an `edges(src, dst, weight)` CTE already in scope."""
    part_expr = md5_long_sql("CAST(id AS VARCHAR)") + f" % {num_parts}"
    return f"""
    verts AS (SELECT DISTINCT src AS id FROM edges
              UNION SELECT DISTINCT dst FROM edges),
    assignment AS (
        SELECT id,
               ((({part_expr}) % {num_parts}) + {num_parts}) % {num_parts} AS part
        FROM verts
    ),
{partition_quality_body_sql()}"""


def partition_quality_body_sql() -> str:
    """The audit tail alone — assumes `edges(src, dst, weight)` AND an
    `assignment(id, part)` CTE already in scope, so any partitioner
    twin (hash, spectral bisection, community-aligned) composes with
    the identical audit arithmetic."""
    return """    e AS (
        SELECT a.part AS src_part, b.part AS dst_part, e.src, e.weight
        FROM edges e
        JOIN assignment a ON e.src = a.id
        JOIN assignment b ON e.dst = b.id
    ),
    w_stats AS (
        SELECT src_part AS part,
               SUM(CASE WHEN src_part = dst_part THEN weight ELSE 0 END)::BIGINT
                   AS internal_w,
               SUM(CASE WHEN src_part <> dst_part THEN weight ELSE 0 END)::BIGINT
                   AS cut_w
        FROM e GROUP BY src_part
    ),
    volume AS (
        SELECT src_part AS part, COUNT(*)::BIGINT AS comm_volume
        FROM (SELECT DISTINCT src_part, src, dst_part FROM e
              WHERE src_part <> dst_part)
        GROUP BY src_part
    ),
    nv AS (SELECT part, COUNT(*)::BIGINT AS n_vertices FROM assignment GROUP BY part)
    SELECT nv.part, nv.n_vertices,
           COALESCE(w.internal_w, 0)::BIGINT AS internal_w,
           COALESCE(w.cut_w, 0)::BIGINT AS cut_w,
           COALESCE(v.comm_volume, 0)::BIGINT AS comm_volume
    FROM nv
    LEFT JOIN w_stats w ON nv.part = w.part
    LEFT JOIN volume v ON nv.part = v.part
    """
