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

from sbm_communitydetection_spark.functions.sql_oracles import (  # noqa: E402
    components_recursive_sql,
    lpa_unrolled_sql,
    modularity_sql,
    pagerank_unrolled_sql,
    triangle_count_sql,
    triangle_per_vertex_sql,
)
from sbm_communitydetection_spark.operators.graph_ops import (  # noqa: E402
    total_edges,
    weighted_degree,
)
from sbm_communitydetection_spark.sources.tpch_graph import (  # noqa: E402
    N_LABELS,
    derived_labels,
    lineitem_edges,
    lineitem_edges_sql,
)

PR_ITERS = 5
LPA_ITERS = 3


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


def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration weighted PageRank (tolerance=-1 forces exactly
    PR_ITERS supersteps to mirror the unrolled SQL oracle)."""
    from sbm_communitydetection_spark.operators.pagerank import pagerank

    ranks = pagerank(
        spark, lineitem_edges(spark, sf_dir), damping=0.85, tolerance=-1.0, max_iterations=PR_ITERS
    )
    return ranks.select("id", F.round("rank", 8).alias("rank"))


def _q_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sbm_communitydetection_spark.operators.label_propagation import label_propagation

    # tolerance=-1 forces exactly LPA_ITERS supersteps, mirroring the
    # unrolled SQL oracle regardless of early convergence
    res = label_propagation(
        spark,
        lineitem_edges(spark, sf_dir),
        max_iterations=LPA_ITERS,
        variant="plain",
        tolerance=-1.0,
    )
    return res.state.select("id", "label")


def _q_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sbm_communitydetection_spark.operators.components import connected_components

    return connected_components(spark, lineitem_edges(spark, sf_dir)).select("id", "component")


def _q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sbm_communitydetection_spark.operators.triangles import triangle_count

    return triangle_count(lineitem_edges(spark, sf_dir))


def _q_triangles_per_vertex(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sbm_communitydetection_spark.operators.triangles import triangle_counts_per_vertex

    return triangle_counts_per_vertex(lineitem_edges(spark, sf_dir)).select("id", "tri_count")


def _q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sbm_communitydetection_spark.functions.metrics import modularity

    edges = lineitem_edges(spark, sf_dir)
    return modularity(edges, derived_labels(edges)).select(
        F.round("modularity", 8).alias("modularity")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.13."""
    return {
        "edge_extract_symmetrize": _q_edges,  # G2/G3 symmetrize + weight-accumulate
        "weighted_degree": _q_degree,  # A1
        "total_edges": _q_total_edges,  # G10/A2
        "pagerank_fixed_iters": _q_pagerank,  # north-star: PageRank
        "label_propagation_fixed_iters": _q_lpa,  # north-star: sync LPA (A8+T2)
        "connected_components": _q_components,  # north-star: large-star/small-star
        "triangle_count": _q_triangle_count,  # north-star: triangles (global)
        "triangles_per_vertex": _q_triangles_per_vertex,  # north-star: triangles (per vertex)
        "modularity": _q_modularity,  # Q1/A4
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
        "pagerank_fixed_iters": edges_cte + ",\n" + pagerank_unrolled_sql(PR_ITERS),
        "label_propagation_fixed_iters": edges_cte + ",\n" + lpa_unrolled_sql(LPA_ITERS),
        "connected_components": edges_cte.replace("WITH ", "WITH RECURSIVE ", 1)
        + ",\n"
        + components_recursive_sql(),
        "triangle_count": edges_cte + ",\n" + triangle_count_sql(),
        "triangles_per_vertex": edges_cte + ",\n" + triangle_per_vertex_sql(),
        "modularity": edges_cte + ",\n" + modularity_sql(N_LABELS),
    }
