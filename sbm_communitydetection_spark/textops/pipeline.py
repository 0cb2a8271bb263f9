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


def source_health_report(docs: DataFrame) -> DataFrame:
    """(source, n_docs, n_exact_dups, dup_rate, avg_quality, avg_tokens,
    top_lang) — the per-source corpus health card a mixture pipeline
    reads before setting weights: volume, exact-duplicate burden
    (min-doc_id survivor rule, duplicates counted where they sit),
    mean heuristic quality, mean whitespace-token length, and the
    plurality language (tie-break lexicographic).

    Shape: one doc-level pass composing the existing gated primitives
    (exact_dedup's hash-groupBy, text_quality's pure expressions) + one
    source-keyed aggregate + one (source, lang) count with a per-source
    argmax window — source cardinality is tiny, so everything after the
    doc-level aggregates is broadcast-scale.  Rates/averages rounded to
    6 dp in both engines."""
    from pyspark.sql import Window

    from .analysis import text_quality
    from .dedup import exact_dedup

    quality = text_quality(docs).select("doc_id", "quality")
    dedup = exact_dedup(docs).select(
        "doc_id", (F.col("doc_id") != F.col("keep_id")).cast("int").alias("is_dup")
    )
    toks = docs.select(
        "doc_id", "source", "lang", F.size(F.split(F.col("text"), " ")).alias("n_toks")
    )
    base = toks.join(quality, "doc_id").join(dedup, "doc_id")
    agg = base.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("is_dup").cast("long").alias("n_exact_dups"),
        F.round(F.sum("is_dup") / F.count("*"), 6).alias("dup_rate"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
        F.round(F.avg("n_toks"), 6).alias("avg_tokens"),
    )
    lang_rank = F.row_number().over(
        Window.partitionBy("source").orderBy(F.desc("n_lang"), F.asc("lang"))
    )
    top_lang = (
        toks.groupBy("source", "lang")
        .agg(F.count("*").alias("n_lang"))
        .select("source", "lang", lang_rank.alias("r"))
        .filter(F.col("r") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    return agg.join(top_lang, "source")


def source_health_report_sql(table: str = "documents") -> str:
    from .analysis import text_quality_sql
    from .portable import md5_long_sql

    return f"""
    WITH q AS ({text_quality_sql(table)}),
    d AS (
        SELECT doc_id,
               CASE WHEN doc_id <> MIN(doc_id) OVER (PARTITION BY {md5_long_sql("text")})
                    THEN 1 ELSE 0 END AS is_dup
        FROM {table}
    ),
    base AS (
        SELECT t.doc_id, t.source, t.lang,
               len(string_split(t.text, ' ')) AS n_toks,
               q.quality, d.is_dup
        FROM {table} t JOIN q USING (doc_id) JOIN d USING (doc_id)
    ),
    agg AS (
        SELECT source, COUNT(*)::BIGINT AS n_docs,
               SUM(is_dup)::BIGINT AS n_exact_dups,
               ROUND(SUM(is_dup) / CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate,
               ROUND(AVG(quality), 6) AS avg_quality,
               ROUND(AVG(n_toks), 6) AS avg_tokens
        FROM base GROUP BY source
    ),
    tl AS (
        SELECT source, lang AS top_lang FROM (
            SELECT source, lang,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY COUNT(*) DESC, lang ASC) AS r
            FROM base GROUP BY source, lang
        ) WHERE r = 1
    )
    SELECT agg.*, tl.top_lang FROM agg JOIN tl USING (source)
    """


def doc_split_assignment(docs: DataFrame, val_permille: int = 50,
                         test_permille: int = 50, seed: int = 13) -> DataFrame:
    """(doc_id, split) — document-level train/val/test coin, same
    portable-hash scheme as extract.holdout_split (conversation level):
    reproducible across runs AND engines, zero shuffles (rides the scan)."""
    from .portable import md5_long

    coin = md5_long(
        F.concat_ws(":", F.lit(str(seed)), F.col("doc_id").cast("string"))
    ) % 1000
    return docs.select(
        "doc_id",
        F.when(coin < val_permille, F.lit("val"))
        .when(coin < val_permille + test_permille, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def split_leakage(
    docs: DataFrame,
    max_hamming: int = 3,
    val_permille: int = 50,
    test_permille: int = 50,
    seed: int = 13,
) -> DataFrame:
    """(a, b, hamming, split_a, split_b) — near-duplicate document pairs
    whose members land in DIFFERENT holdout splits: the train→eval
    contamination a random split silently bakes in (Dodge et al. 2021
    C4 audit; the reason dedup must run BEFORE splitting).  Empty output
    = the split is leakage-clean at this Hamming radius.

    Scale shape: banded-SimHash candidates (pigeonhole total recall, no
    all-pairs join) + two broadcastable split-coin joins keyed on doc_id
    — the coin table is pure column math on the scan, so the only
    shuffle is the LSH bucket join already inside the dedup primitive."""
    from .dedup import simhash_banded_dup_pairs

    pairs = simhash_banded_dup_pairs(docs, max_hamming=max_hamming)
    s = doc_split_assignment(docs, val_permille, test_permille, seed)
    sa = s.select(F.col("doc_id").alias("a"), F.col("split").alias("split_a"))
    sb = s.select(F.col("doc_id").alias("b"), F.col("split").alias("split_b"))
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("a", "b", "hamming", "split_a", "split_b")
    )


def split_leakage_sql(
    table: str = "documents",
    max_hamming: int = 3,
    val_permille: int = 50,
    test_permille: int = 50,
    seed: int = 13,
) -> str:
    """DuckDB twin: exact all-pairs SimHash (the banded op's oracle
    equivalence is already driver-gated) + the same split coin."""
    from .dedup import simhash_sql
    from .portable import md5_long_sql

    coin = md5_long_sql(f"'{seed}:' || CAST(doc_id AS VARCHAR)") + " % 1000"
    return f"""
    WITH fp AS ({simhash_sql(table)}),
    pairs AS (
        SELECT l.doc_id AS a, r.doc_id AS b,
               bit_count(xor(l.simhash, r.simhash)) AS hamming
        FROM fp l JOIN fp r ON l.doc_id < r.doc_id
        WHERE bit_count(xor(l.simhash, r.simhash)) <= {max_hamming}
    ),
    coin AS (
        SELECT doc_id,
               CASE WHEN {coin} < {val_permille} THEN 'val'
                    WHEN {coin} < {val_permille + test_permille} THEN 'test'
                    ELSE 'train' END AS split
        FROM {table}
    )
    SELECT p.a, p.b, p.hamming, ca.split AS split_a, cb.split AS split_b
    FROM pairs p
    JOIN coin ca ON p.a = ca.doc_id
    JOIN coin cb ON p.b = cb.doc_id
    WHERE ca.split <> cb.split
    """
