"""TextRank keyword extraction — the text × graph composition a
training-data pipeline runs to surface corpus-level salient terms
(topic labeling, dedup-cluster naming, retrieval query seeding).

Mihalcea & Tarau's TextRank (EMNLP 2004, public): build an undirected
word co-occurrence graph from adjacent-token pairs, run weighted
PageRank over it, rank words by stationary score.  The reference
engine has no text surface; this composes the repo's own PageRank
operator (operators/pagerank.py, cf. reference src/graph.cpp:19-119
for the edge-accumulate semantics the graph build mirrors) with the
bigram machinery the PMI/boilerplate ops already use.

Scale plan (100 TB corpus):
- the co-occurrence GRAPH is vocabulary-bounded, not corpus-bounded:
  one explode + one canonical-pair count aggregate (map-side
  combinable) folds any number of documents into at most |V|² edges,
  and ``min_pair_count`` prunes the long noise tail so the word graph
  is millions of edges, not trillions of rows;
- PageRank then runs on that small graph via the full-scale operator
  (co-partitioned transition cache, broadcast rank vector under the
  measured crossover) — the expensive corpus pass happens exactly
  once, before the iteration;
- scores are rounded BEFORE ranking (bm25.py convention) so the Spark
  and DuckDB top-k cut identically despite float-sum-order ulps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.sql_oracles import pagerank_unrolled_sql
from ..operators.pagerank import pagerank
from .portable import shingles_col, shingles_sql


def word_cooccurrence_edges(
    docs: DataFrame, min_pair_count: int = 2
) -> DataFrame:
    """(src, dst, weight) — symmetrized adjacent-token co-occurrence
    graph over `docs.text`.  weight = global count of the unordered
    pair; self-pairs and empty tokens dropped; pairs rarer than
    ``min_pair_count`` pruned.  Both directions emitted, so the table
    plugs straight into pagerank()'s directed contract."""
    pairs = (
        docs.select(F.explode(shingles_col(F.col("text"), 2)).alias("g"))
        .select(
            F.split_part(F.col("g"), F.lit(" "), F.lit(1)).alias("a"),
            F.split_part(F.col("g"), F.lit(" "), F.lit(2)).alias("b"),
        )
        .filter((F.col("a") != "") & (F.col("b") != "") & (F.col("a") != F.col("b")))
    )
    canon = (
        pairs.select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .groupBy("u", "v")
        .agg(F.count("*").cast("double").alias("weight"))
        .filter(F.col("weight") >= min_pair_count)
    )
    return canon.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "weight"
    ).unionByName(
        canon.select(F.col("v").alias("src"), F.col("u").alias("dst"), "weight")
    )


def textrank_keywords(
    spark: SparkSession,
    docs: DataFrame,
    k: int = 50,
    n_iterations: int = 5,
    damping: float = 0.85,
    min_pair_count: int = 2,
    round_to: int = 8,
) -> DataFrame:
    """(word, rank) — top-k corpus keywords by TextRank score.

    Fixed-iteration PageRank (tolerance<0 path: no convergence actions)
    over the co-occurrence graph; ties at the rounded-score boundary
    broken by word asc, so the output row SET is engine-independent."""
    edges = word_cooccurrence_edges(docs, min_pair_count=min_pair_count)
    ranks = pagerank(
        spark,
        edges,
        damping=damping,
        tolerance=-1.0,
        max_iterations=n_iterations,
    )
    # orderBy().limit() compiles to TakeOrdered — a distributed
    # per-partition top-k merged on the driver — instead of the
    # single-partition global window a row_number() would force.
    return (
        ranks.select(
            F.col("id").alias("word"), F.round("rank", round_to).alias("rank")
        )
        .orderBy(F.desc("rank"), F.asc("word"))
        .limit(k)
        .select("word", "rank")
    )


def textrank_keywords_sql(
    table: str = "documents",
    k: int = 50,
    n_iterations: int = 5,
    damping: float = 0.85,
    min_pair_count: int = 2,
    round_to: int = 8,
) -> str:
    """DuckDB twin: same graph build, then the unrolled PageRank CTE."""
    pr = pagerank_unrolled_sql(
        n_iterations, damping=damping, round_to=round_to, final_cte="pr"
    )
    return f"""
    WITH grams AS (
        SELECT unnest({shingles_sql("text", 2)}) AS g FROM {table}
    ),
    pairs AS (
        SELECT split_part(g, ' ', 1) AS a, split_part(g, ' ', 2) AS b FROM grams
    ),
    canon AS (
        SELECT least(a, b) AS u, greatest(a, b) AS v,
               COUNT(*)::DOUBLE AS weight
        FROM pairs
        WHERE a <> '' AND b <> '' AND a <> b
        GROUP BY 1, 2
        HAVING COUNT(*) >= {min_pair_count}
    ),
    edges AS (
        SELECT u AS src, v AS dst, weight FROM canon
        UNION ALL
        SELECT v AS src, u AS dst, weight FROM canon
    ),
    {pr}
    SELECT word, rank FROM (
        SELECT id AS word, rank,
               ROW_NUMBER() OVER (ORDER BY rank DESC, id ASC) AS rn
        FROM pr
    ) WHERE rn <= {k}
    """
