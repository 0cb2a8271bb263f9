"""BM25 retrieval scoring over the `documents` table — the ranking
primitive a retrieval-augmented training pipeline runs to mine the
corpus for query-relevant documents (and the scoring half of
hard-negative mining for embedding training).

The reference engine has no text-retrieval surface; this is a
north-star pipeline op (brief: "operations a large-scale training-data
pipeline would need").  Okapi BM25 with the Lucene idf variant
(always positive, no negative-idf clipping needed):

    idf(t)        = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(q, d)   = Σ_{t ∈ q ∩ d} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

Scale plan (100 TB corpus, thousands of queries):
- per-doc term frequencies and doc lengths are ONE pass over the scan
  (explode + two hash aggregates, map-side combinable);
- the query term set is tiny → broadcast; `df` is computed ONLY for
  query terms (semi-join before the count), so the vocabulary-sized
  aggregate never materializes;
- scoring joins are big-side-only: tf ⋈ broadcast(query terms) keyed
  on term, then one (query_id, doc_id) aggregate;
- top-k per query is a query_id-partitioned window — no global sort.

Scores are rounded to `round_to` BEFORE ranking so the Spark and
DuckDB top-k cut identically even when float summation order differs
in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    round_to: int = 6,
) -> DataFrame:
    """(query_id, doc_id, score) — top-k documents per query by BM25.

    `docs`: (doc_id, text, ...); `queries`: (query_id, text) — small
    (driver-scale) relative to the corpus.  Ties broken by doc_id asc.
    Documents sharing no term with a query are absent (score would be 0).
    """
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))

    stats = dl.agg(
        F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = float(stats["n"]), float(stats["avgdl"])

    qterms = (
        queries.select("query_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )
    # df over query terms ONLY: semi-join first so the per-term count
    # aggregate is bounded by |query vocabulary|, not corpus vocabulary
    qdf = (
        tf.join(F.broadcast(qterms.select("term").distinct()), "term", "left_semi")
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
    )
    qside = F.broadcast(qterms.join(qdf, "term"))

    idf = F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    norm = F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl))
    )
    scored = (
        tf.join(qside, "term")
        .join(dl, "doc_id")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(idf * norm), round_to).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "doc_id", "score")
    )


def bm25_topk_sql(
    table: str = "documents",
    queries_cte: str = "SELECT doc_id AS query_id, text FROM documents WHERE doc_id % 97 = 3",
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    round_to: int = 6,
) -> str:
    """DuckDB twin. `queries_cte` must yield (query_id, text)."""
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM {table}
    ), toks_f AS (
        SELECT doc_id, term FROM toks WHERE term <> ''
    ), tf AS (
        SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM toks_f GROUP BY doc_id, term
    ), dl AS (
        SELECT doc_id, COUNT(*)::BIGINT AS dl FROM toks_f GROUP BY doc_id
    ), stats AS (
        SELECT COUNT(*)::DOUBLE AS n, AVG(dl)::DOUBLE AS avgdl FROM dl
    ), q AS ({queries_cte}
    ), qterms AS (
        SELECT DISTINCT query_id, term
        FROM (SELECT query_id, unnest(string_split(text, ' ')) AS term FROM q)
        WHERE term <> ''
    ), qdf AS (
        SELECT term, COUNT(*)::BIGINT AS df FROM tf
        WHERE term IN (SELECT DISTINCT term FROM qterms)
        GROUP BY term
    ), scored AS (
        SELECT qt.query_id, tf.doc_id,
               ROUND(SUM(
                   ln(1.0 + (stats.n - qdf.df + 0.5) / (qdf.df + 0.5))
                   * tf.tf * ({k1} + 1)
                   / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / stats.avgdl))
               ), {round_to}) AS score
        FROM tf
        JOIN qterms qt USING (term)
        JOIN qdf USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN stats
        GROUP BY qt.query_id, tf.doc_id
    )
    SELECT query_id, doc_id, score
    FROM (
        SELECT query_id, doc_id, score,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rn
        FROM scored
    )
    WHERE rn <= {k}
    """
