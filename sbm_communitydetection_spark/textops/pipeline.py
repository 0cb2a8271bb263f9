"""End-to-end curation decision: the keep-list a training-data pipeline
actually materializes before tokenization.

    keep(doc) = quality_filter AND near-dup survivorship AND
                per-language stratified sampling

— one composed query over the building blocks this package already
gate-checks individually (analysis.text_quality, dedup.near_dup_clusters,
analysis.stratified_sample). Emitting the three per-stage flags alongside
the final bit is deliberate: pipelines audit WHY a document was dropped
(filter-rate dashboards per stage), and downstream joins can reuse the
same pass for ablations.

Scale: quality + sampling are per-row column math on the scan; the dedup
flag is the LSH + pair-graph component pass (dedup.near_dup_clusters —
the only shuffling stage); the final assembly is two doc_id equi-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analysis import _MIX_BUCKETS, _MIX_KNUTH, text_quality, text_quality_sql
from .dedup import near_dup_clusters, near_dup_clusters_sql


def curation_keep_list(
    spark: SparkSession,
    docs: DataFrame,
    quality_min: float,
    rates_permille: dict[str, int],
    default_permille: int = 1000,
    dup_threshold: float = 0.4,
) -> DataFrame:
    """(doc_id, pass_quality, pass_dedup, pass_sample, keep) — all INT
    0/1 flags; keep = product of the three stages."""
    q = text_quality(docs).select(
        "doc_id", (F.col("quality") >= quality_min).cast("int").alias("pass_quality")
    )
    d = near_dup_clusters(spark, docs, threshold=dup_threshold).select(
        "doc_id", F.col("keep").alias("pass_dedup")
    )
    rate = F.lit(default_permille)
    for lang, permille in sorted(rates_permille.items()):
        rate = F.when(F.col("lang") == lang, F.lit(permille)).otherwise(rate)
    bucket = F.pmod(F.col("doc_id") * _MIX_KNUTH, F.lit(_MIX_BUCKETS))
    s = docs.select("doc_id", (bucket < rate).cast("int").alias("pass_sample"))
    return (
        s.join(q, "doc_id")
        .join(d, "doc_id")
        .select(
            "doc_id",
            "pass_quality",
            "pass_dedup",
            "pass_sample",
            (F.col("pass_quality") * F.col("pass_dedup") * F.col("pass_sample")).alias(
                "keep"
            ),
        )
    )


def curation_keep_list_sql(
    quality_min: float,
    rates_permille: dict[str, int],
    default_permille: int = 1000,
    dup_threshold: float = 0.4,
    table: str = "documents",
) -> str:
    """DuckDB twin (composes the stage oracles as subqueries)."""
    whens = " ".join(
        f"WHEN lang = '{lang}' THEN {permille}"
        for lang, permille in sorted(rates_permille.items())
    )
    rate = f"CASE {whens} ELSE {default_permille} END"
    return f"""
    SELECT d.doc_id,
           (q.quality >= {quality_min})::INT AS pass_quality,
           nd.keep AS pass_dedup,
           ((d.doc_id * {_MIX_KNUTH}) % {_MIX_BUCKETS} < {rate})::INT AS pass_sample,
           (q.quality >= {quality_min})::INT * nd.keep
             * ((d.doc_id * {_MIX_KNUTH}) % {_MIX_BUCKETS} < {rate})::INT AS keep
    FROM {table} d
    JOIN ({text_quality_sql(table)}) q ON d.doc_id = q.doc_id
    JOIN ({near_dup_clusters_sql(table, threshold=dup_threshold)}) nd
      ON d.doc_id = nd.doc_id
    """
