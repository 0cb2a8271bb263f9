"""Hybrid-retrieval rank fusion — Reciprocal Rank Fusion (Cormack,
Clarke & Buettcher, SIGIR'09) of the lexical (BM25) and semantic
(embedding cosine) rankings this package already gate-checks
individually:

    rrf(q, d) = Σ_lists 1 / (rrf_k + rank_list(q, d))

The pipeline use: hard-negative mining and RAG retrieval both run
hybrid search, and RRF is the standard parameter-free fusion (no score
normalization across incomparable scales).  Absent docs contribute 0.

Scale shape: both input rankings are per-query top-`depth` lists —
tiny relative to the corpus — so the fusion itself is a full-outer
join keyed on (query_id, doc_id) between two bounded tables plus one
per-query window.  The expensive work (corpus scan for BM25, ANN for
cosine) happens inside the already-optimized primitives; fusion adds
no corpus-sized shuffle.

Determinism: ranks are integers, the RRF sum has exactly two terms
evaluated in fixed order, rounded to 6 decimals before the final
ranking; ties break on doc_id asc (bm25.py convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .bm25 import bm25_topk, bm25_topk_sql
from .similarity import cosine_topk, cosine_topk_sql

RRF_K = 60


def rrf_fused_topk(
    docs: DataFrame,
    embs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    depth: int = 20,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """(query_id, doc_id, rrf) — top-k fused results per query.

    `queries`: (query_id, text) where query_id is also the vec_id of
    the query's embedding (the aligned documents/embeddings id space).
    Lexical list: BM25 top-(depth+1) with the self-hit dropped then
    re-ranked (both engines apply the identical procedure).  Semantic
    list: cosine top-depth neighbors of the query vector (self-free by
    construction)."""
    lex_raw = bm25_topk(docs, queries, k=depth + 1).filter(
        F.col("doc_id") != F.col("query_id")
    )
    w_lex = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    lex = (
        lex_raw.withColumn("lex_rank", F.row_number().over(w_lex))
        .filter(F.col("lex_rank") <= depth)
        .select("query_id", "doc_id", "lex_rank")
    )
    qids = queries.select(F.col("query_id").alias("vec_id")).distinct()
    sem = (
        cosine_topk(embs, k=depth)
        .join(F.broadcast(qids), "vec_id", "left_semi")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").alias("sem_rank"),
        )
    )
    fused = lex.join(sem, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("sem_rank")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "doc_id", "rrf")
    )


def rrf_fused_topk_sql(
    docs_table: str = "documents",
    embs_table: str = "embeddings",
    queries_cte: str = "SELECT doc_id AS query_id, text FROM documents WHERE doc_id % 97 = 3",
    k: int = 10,
    depth: int = 20,
    rrf_k: int = RRF_K,
) -> str:
    """DuckDB twin — nests the two primitives' oracle SQL as CTE
    subqueries and applies the identical drop-self/re-rank/fuse steps."""
    lex_inner = bm25_topk_sql(table=docs_table, queries_cte=queries_cte, k=depth + 1)
    sem_inner = cosine_topk_sql(table=embs_table, k=depth)
    return f"""
    WITH lex0 AS ({lex_inner}),
    lex AS (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id ASC) AS lex_rank
        FROM lex0 WHERE doc_id <> query_id
        QUALIFY lex_rank <= {depth}
    ),
    sem0 AS ({sem_inner}),
    q AS ({queries_cte}),
    sem AS (
        SELECT s.vec_id AS query_id, s.neighbor_id AS doc_id, s.rank AS sem_rank
        FROM sem0 s
        WHERE s.vec_id IN (SELECT query_id FROM q)
    ),
    fused AS (
        SELECT COALESCE(l.query_id, s.query_id) AS query_id,
               COALESCE(l.doc_id, s.doc_id) AS doc_id,
               ROUND(COALESCE(1.0 / ({rrf_k} + l.lex_rank), 0)
                     + COALESCE(1.0 / ({rrf_k} + s.sem_rank), 0), 6) AS rrf
        FROM lex l
        FULL OUTER JOIN sem s
          ON l.query_id = s.query_id AND l.doc_id = s.doc_id
    )
    SELECT query_id, doc_id, rrf FROM (
        SELECT query_id, doc_id, rrf,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY rrf DESC, doc_id ASC) AS rn
        FROM fused
    ) WHERE rn <= {k}
    """
