"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: sbm_communitydetection_spark (see SURVEY.md §2 for the
operator inventory each query exercises).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sbm_communitydetection_spark.operators.graph_ops import (  # noqa: E402
    total_edges,
    weighted_degree,
)
from sbm_communitydetection_spark.sources.tpch_graph import (  # noqa: E402
    lineitem_edges,
    lineitem_edges_sql,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full synth→extract→
    analyze slice — generate SBM-planted transcripts, extract the link
    graph, return weighted-degree top-20 actors (SURVEY.md §7 Phase 1)."""
    from sbm_communitydetection_spark.operators.extract import extract_graph
    from sbm_communitydetection_spark.sources.transcripts import generate_transcripts

    # deterministic synthetic transcripts (no external data); sized ~sf0.001
    t, _, _ = generate_transcripts(spark, n=100, k=5, m=400, seed=42)
    vertices, edges = extract_graph(t)
    deg = weighted_degree(edges)
    return (
        vertices.join(deg, "id")
        .orderBy(F.desc("degree"), "actor_key")
        .select("actor_key", "kind", "degree")
        .limit(20)
    )


def _q_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lineitem_edges(spark, sf_dir).select("src", "dst", "weight")


def _q_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weighted_degree(lineitem_edges(spark, sf_dir)).select("id", "degree")


def _q_total_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return total_edges(lineitem_edges(spark, sf_dir)).select(
        F.col("total_edges").cast("double").alias("total_edges")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {
        "edge_extract_symmetrize": _q_edges,  # G2/G3 symmetrize + weight-accumulate
        "weighted_degree": _q_degree,  # A1
        "total_edges": _q_total_edges,  # G10/A2
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (same parquet views)."""
    edges_cte = "WITH " + lineitem_edges_sql()
    return {
        "edge_extract_symmetrize": edges_cte + "SELECT src, dst, weight FROM edges",
        "weighted_degree": edges_cte
        + "SELECT src AS id, SUM(weight) AS degree FROM edges GROUP BY src",
        "total_edges": edges_cte
        + "SELECT (SUM(weight) / 2.0)::DOUBLE AS total_edges FROM edges",
    }
