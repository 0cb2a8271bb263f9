"""Deterministic graph derivation from the driver's TPC-H-ish testdata.

The correctness harness (driver + DuckDB oracle) runs on the parquet
tables at /root/testdata/sf*/.  To exercise the graph operators under
that harness we derive a deterministic pseudo-random unipartite graph
from `lineitem`:

    src = l_orderkey % N_VERTS,  dst = l_partkey % N_VERTS

symmetrized and weight-aggregated exactly like the transcript-extracted
edge table.  Both sides (Spark and ANSI SQL) express this identically,
so every graph operator gains a DuckDB-checkable oracle query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph_ops import symmetrize

N_VERTS = 1000
N_LABELS = 10


def lineitem_edges(
    spark: SparkSession,
    sf_dir: str,
    n_verts: int = N_VERTS,
    row_filter=None,
) -> DataFrame:
    """edges(src, dst, weight) — symmetrized derived graph.
    ``row_filter`` (a Column predicate over raw lineitem rows) carves
    deterministic sub-graphs — e.g. the link-prediction train split."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    if row_filter is not None:
        li = li.filter(row_filter)
    raw = li.select(
        F.pmod(F.col("l_orderkey"), F.lit(n_verts)).cast("long").alias("src"),
        F.pmod(F.col("l_partkey"), F.lit(n_verts)).cast("long").alias("dst"),
        F.lit(1).cast("long").alias("weight"),
    )
    return symmetrize(raw)


def lineitem_edges_sql(n_verts: int = N_VERTS, lineitem_where: str = "") -> str:
    """DuckDB-equivalent of lineitem_edges as a CTE body named `edges`;
    ``lineitem_where`` mirrors lineitem_edges(row_filter=...)."""
    where = f"WHERE {lineitem_where}" if lineitem_where else ""
    return f"""
    raw AS (
        SELECT l_orderkey % {n_verts} AS src, l_partkey % {n_verts} AS dst, 1::BIGINT AS weight
        FROM lineitem {where}
    ),
    sym AS (
        SELECT src, dst, weight FROM raw
        UNION ALL
        SELECT dst AS src, src AS dst, weight FROM raw
    ),
    edges AS (
        -- ::BIGINT: DuckDB promotes SUM(BIGINT) to HUGEINT, which the
        -- driver's type-sensitive value hash sees as a mismatch vs
        -- Spark's int64 even when values are identical (VERDICT r1 #2)
        SELECT src, dst, SUM(weight)::BIGINT AS weight
        FROM sym WHERE src <> dst
        GROUP BY src, dst
        HAVING SUM(weight) <> 0
    )
    """


def lineitem_directed_edges(
    spark: SparkSession, sf_dir: str, n_verts: int = N_VERTS
) -> DataFrame:
    """edges(src, dst, weight) — DIRECTED derived graph (no mirroring):
    weight-aggregated, self-loops dropped. Hub/authority-style operators
    need asymmetric adjacency; the symmetrized table collapses them."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    raw = li.select(
        F.pmod(F.col("l_orderkey"), F.lit(n_verts)).cast("long").alias("src"),
        F.pmod(F.col("l_partkey"), F.lit(n_verts)).cast("long").alias("dst"),
    )
    return (
        raw.filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("weight"))
    )


def lineitem_directed_edges_sql(n_verts: int = N_VERTS) -> str:
    """DuckDB twin of lineitem_directed_edges as a CTE body named `edges`."""
    return f"""
    raw AS (
        SELECT l_orderkey % {n_verts} AS src, l_partkey % {n_verts} AS dst
        FROM lineitem
    ),
    edges AS (
        SELECT src, dst, COUNT(*)::BIGINT AS weight
        FROM raw WHERE src <> dst
        GROUP BY src, dst
    )
    """


def derived_labels(edges: DataFrame, n_labels: int = N_LABELS) -> DataFrame:
    """Deterministic label assignment for metric oracles: label = id % n_labels."""
    return (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.pmod(F.col("id"), F.lit(n_labels)).cast("long").alias("label"))
    )


BENCH_N_VERTS = 1_000_000
BENCH_AMPLIFY = 8


def bench_edges(
    spark: SparkSession,
    sf_dir: str,
    n_verts: int = BENCH_N_VERTS,
    amplify: int = BENCH_AMPLIFY,
) -> DataFrame:
    """Deterministic AMPLIFIED benchmark graph.

    The correctness-gate graph (`lineitem_edges`, 1000 vertices) is so
    small that iteration cost is pure scheduler overhead — useless for
    measuring scaling. This derivation hash-expands every lineitem row
    into `amplify` edges over an `n_verts`-sized vertex domain, producing
    a graph large enough (~10M directed edges at sf0.1) that shuffle and
    aggregation compute dominate and parallelism actually pays.
    Deterministic (xxhash64 of key×salt), no RNG.
    """
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    raw = (
        li.select("l_orderkey", "l_partkey")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(amplify - 1))))
        .select(
            F.pmod(
                F.xxhash64(F.col("l_orderkey") * amplify + F.col("salt")), F.lit(n_verts)
            ).alias("src"),
            F.pmod(
                F.xxhash64(F.col("l_partkey") * amplify + F.col("salt") + F.lit(1_000_000_007)),
                F.lit(n_verts),
            ).alias("dst"),
            F.lit(1).cast("long").alias("weight"),
        )
    )
    return symmetrize(raw)


STRATUM_SIZE = 100


def lineitem_mixed_digraph(
    spark: SparkSession,
    sf_dir: str,
    n_verts: int = N_VERTS,
    stratum: int = STRATUM_SIZE,
) -> DataFrame:
    """edges(src, dst) — deterministic digraph with BOTH cyclic cores and
    DAG structure, for condensation/topological operators: edges whose
    endpoints share a stratum (``id // stratum``) are kept in both
    directions (symmetric ⇒ they collapse into SCCs), edges across
    strata are oriented strictly low → high (⇒ the condensation is a
    layered DAG of depth ≈ n_verts/stratum)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    raw = (
        li.select(
            F.pmod(F.col("l_orderkey"), F.lit(n_verts)).cast("long").alias("a"),
            F.pmod(F.col("l_partkey"), F.lit(n_verts)).cast("long").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
    )
    sa, sb = F.floor(F.col("a") / stratum), F.floor(F.col("b") / stratum)
    intra = raw.filter(sa == sb)
    sym = intra.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        intra.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    cross = raw.filter(sa != sb).select(
        F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")
    )
    return sym.unionByName(cross).distinct()


def lineitem_mixed_digraph_sql(
    n_verts: int = N_VERTS, stratum: int = STRATUM_SIZE
) -> str:
    """DuckDB twin of lineitem_mixed_digraph as a CTE body named `dedges`."""
    return f"""
    raw AS (
        SELECT l_orderkey % {n_verts} AS a, l_partkey % {n_verts} AS b
        FROM lineitem
        WHERE l_orderkey % {n_verts} <> l_partkey % {n_verts}
    ),
    dedges AS (
        SELECT DISTINCT src, dst FROM (
            SELECT a AS src, b AS dst FROM raw WHERE a // {stratum} = b // {stratum}
            UNION ALL
            SELECT b AS src, a AS dst FROM raw WHERE a // {stratum} = b // {stratum}
            UNION ALL
            SELECT LEAST(a, b) AS src, GREATEST(a, b) AS dst
            FROM raw WHERE a // {stratum} <> b // {stratum}
        )
    )
    """
