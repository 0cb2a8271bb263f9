"""Vectorized, seeded Stochastic Block Model generator.

Re-expresses the reference's single-threaded RNG loop
(reference: src/sbm.cpp:61-142) as a fully columnar Spark pipeline:
one `spark.range(m)` with seeded rand() columns generates ALL edges at
once; (community, offset) pairs are resolved to vertex ids with a join
against the block-assignment table (broadcast at small scale, shuffle
hash join at large scale).

Behavioral parity notes
-----------------------
* Block assignment (reference: src/sbm.cpp:111-142): a random permutation
  of the n ids is split into k equal blocks of b = n/k; `label` is the
  block index, `offset` the position within the block.
* Intra/inter coin flip (reference: src/sbm.cpp:25-28, 103-109): the
  threshold computed there via beta functions algebraically reduces to

      P(intra) = p_in * N_intra_pairs / (p_in * N_intra_pairs + p_out * N_inter_pairs)

  with N_intra_pairs = k * C(b, 2) and N_inter_pairs = C(n, 2) - k*C(b, 2),
  because 1 / ((x+1) * B(x-1, 3)) == C(x, 2).  We compute it directly.
* Intra draw (src/sbm.cpp:87-101): uniform community, two DISTINCT
  uniform offsets (no self-loops).
* Inter draw (src/sbm.cpp:68-85): two DISTINCT uniform communities,
  one uniform offset each (no self-loops possible).
* The reference seeds from random_device (src/sbm.cpp:19) and is not
  reproducible; we take an explicit seed and are fully deterministic.
"""

from __future__ import annotations

from math import comb

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def intra_threshold(n: int, k: int, p_in: float, p_out: float) -> float:
    """Probability that a generated edge is intra-community.

    Algebraic simplification of reference src/sbm.cpp:25-28 (see module
    docstring).
    """
    b = n // k
    intra_pairs = k * comb(b, 2)
    inter_pairs = comb(n, 2) - intra_pairs
    iw = p_in * intra_pairs
    ow = p_out * inter_pairs
    return iw / (iw + ow)


def hash_uniform(col, seed: int):
    """Partition-count-independent uniform [0,1) keyed by a column value.

    ``F.rand(seed)`` seeds PER PARTITION, so its draws change with the
    number of partitions — breaking the determinism contract (same seed =>
    identical output at local[2] and local[8], SURVEY.md §5). Deriving the
    uniform from ``xxhash64(value, seed)`` makes every draw a pure
    function of the row's key, independent of physical layout.
    """
    m = 1 << 40
    return F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(m)) / F.lit(float(m))


def block_assignment(
    spark: SparkSession, n: int, k: int, seed: int, uneven: bool = False
) -> DataFrame:
    """vertices(id, label, offset): seeded random permutation into k equal blocks.

    Reference: src/sbm.cpp:111-142 (generateSbm + communityTracker fill).
    The global window sort is acceptable for fixture-scale n; the
    at-scale variant would assign `pos` via a distributed sort + per-
    partition offsets (zipWithIndex pattern) — same deterministic result.

    ``uneven`` mirrors config `uneven_node_distribution`
    (utils/sequence_generator.cpp:56-58, :82-84): it only RELAXES the
    divisibility validation — generateSbm still fills k blocks of
    floor(n/k), so the n mod k leftover vertices never enter the
    communityTracker: they keep the Graph-constructor defaults
    (label = id, src/graph.cpp:33-40; offset stays unassigned, -1 here)
    and the edge generator can never draw them.
    """
    if n % k != 0 and not uneven:
        raise ValueError("nodes % communities must be 0 (utils/sequence_generator.cpp:82-84)")
    b = n // k
    w = Window.orderBy("r", "id")
    assigned = F.col("pos") < k * b
    return (
        spark.range(n)
        .withColumn("r", hash_uniform(F.col("id"), seed))
        .withColumn("pos", F.row_number().over(w) - F.lit(1))
        .select(
            F.col("id").cast("long").alias("id"),
            F.when(assigned, (F.col("pos") / b).cast("long")).otherwise(F.col("id")).alias("label"),
            F.when(assigned, (F.col("pos") % b).cast("int")).otherwise(F.lit(-1)).alias("offset"),
        )
    )


def sbm_edge_stream(
    spark: SparkSession,
    vertices: DataFrame,
    n: int,
    k: int,
    m: int,
    p_in: float,
    p_out: float,
    seed: int,
) -> DataFrame:
    """edges(edge_seq, src, dst): m seeded SBM edge draws in arrival order.

    Vectorized port of the per-edge loop at src/sbm.cpp:61-109 +
    utils/sequence_generator.cpp:97-103.  `edge_seq` preserves stream
    order for the batched-iteration drivers (SURVEY.md §2.10).
    """
    b = n // k
    thr = intra_threshold(n, k, p_in, p_out)

    draws = (
        spark.range(m)
        .withColumnRenamed("id", "edge_seq")
        .withColumn("is_intra", hash_uniform(F.col("edge_seq"), seed + 1) < F.lit(thr))
        # intra: one community, two distinct offsets (src/sbm.cpp:87-101)
        .withColumn("c1", F.floor(hash_uniform(F.col("edge_seq"), seed + 2) * k).cast("long"))
        .withColumn("o1", F.floor(hash_uniform(F.col("edge_seq"), seed + 3) * b).cast("int"))
        .withColumn("o2r", F.floor(hash_uniform(F.col("edge_seq"), seed + 4) * (b - 1)).cast("int"))
        .withColumn("o2", F.when(F.col("o2r") >= F.col("o1"), F.col("o2r") + 1).otherwise(F.col("o2r")))
        # inter: two distinct communities, one offset each (src/sbm.cpp:68-85)
        .withColumn("c2r", F.floor(hash_uniform(F.col("edge_seq"), seed + 5) * (k - 1)).cast("long"))
        .withColumn("c2", F.when(F.col("c2r") >= F.col("c1"), F.col("c2r") + 1).otherwise(F.col("c2r")))
        .withColumn("o3", F.floor(hash_uniform(F.col("edge_seq"), seed + 6) * b).cast("int"))
        .select(
            "edge_seq",
            F.col("c1").alias("src_label"),
            F.col("o1").alias("src_offset"),
            F.when(F.col("is_intra"), F.col("c1")).otherwise(F.col("c2")).alias("dst_label"),
            F.when(F.col("is_intra"), F.col("o2")).otherwise(F.col("o3")).alias("dst_offset"),
        )
    )

    vsrc = vertices.select(
        F.col("label").alias("src_label"), F.col("offset").alias("src_offset"), F.col("id").alias("src")
    )
    vdst = vertices.select(
        F.col("label").alias("dst_label"), F.col("offset").alias("dst_offset"), F.col("id").alias("dst")
    )
    # vertices is k*b = n rows — broadcast both sides of the resolve join.
    return (
        draws.join(F.broadcast(vsrc), ["src_label", "src_offset"])
        .join(F.broadcast(vdst), ["dst_label", "dst_offset"])
        .select("edge_seq", "src", "dst")
    )


def generate_sbm(
    spark: SparkSession,
    n: int,
    k: int,
    m: int,
    p_in: float,
    p_out: float,
    seed: int = 42,
    uneven: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(vertices, edge_stream) — the Spark analogue of `generateSequence`
    (utils/sequence_generator.cpp:5-113) minus the result-directory I/O.

    ``uneven``: see block_assignment — the n mod k leftover vertices stay
    label=id / offset=-1 and receive no edges (the resolve join only maps
    tracker offsets 0..floor(n/k)-1)."""
    vertices = block_assignment(spark, n, k, seed, uneven=uneven)
    edges = sbm_edge_stream(spark, vertices, n, k, m, p_in, p_out, seed)
    return vertices, edges
