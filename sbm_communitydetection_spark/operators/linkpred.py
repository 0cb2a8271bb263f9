"""Link prediction over the undirected link graph: common-neighbor and
Adamic-Adar scoring via wedge enumeration.

    cn(a, b)  = |N(a) ∩ N(b)|
    aa(a, b)  = Σ_{c ∈ N(a) ∩ N(b)}  1 / ln |N(c)|

One self-join of the distinct-neighbor table on the wedge CENTER, then a
groupBy on the endpoint pair — the canonical Spark shape (no cross
join; candidate pairs exist only where a common neighbor does).

Scale levers, both standard for 100 TB link prediction:

- ``degree_cap``: drop wedge centers with degree > cap BEFORE the
  self-join. Hub centers dominate the wedge count (Σ d(c)² blows up on
  skewed graphs) while contributing the least signal (1/ln d → 0);
  capping bounds per-center work at cap². Off by default — the DuckDB
  oracle requires exact semantics.
- ``probe_mod``: restrict the LEFT endpoint to a deterministic probe
  set (a % probe_mod == 0), pushed below the self-join — the
  partner-lookup pattern (score all candidates FOR these vertices)
  instead of the all-pairs materialization.

No reference analogue (SURVEY.md §2.13 scope extension); gated by a
mirrored DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def adamic_adar(
    edges: DataFrame,
    probe_mod: int | None = None,
    degree_cap: int | None = None,
    include_existing: bool = False,
) -> DataFrame:
    """(a, b, cn_count, aa_score) for unordered pairs a < b that share at
    least one common neighbor; existing edges are anti-joined away unless
    ``include_existing``."""
    nbrs = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = nbrs.groupBy(F.col("src").alias("c")).agg(
        F.count("*").cast("long").alias("deg_c")
    )
    centers = deg if degree_cap is None else deg.filter(F.col("deg_c") <= degree_cap)

    left = nbrs.select(F.col("src").alias("c"), F.col("dst").alias("a"))
    if probe_mod is not None:
        left = left.filter(F.pmod(F.col("a"), F.lit(probe_mod)) == 0)
    right = nbrs.select(F.col("src").alias("c"), F.col("dst").alias("b"))

    wedges = (
        left.join(right, "c")
        .filter(F.col("a") < F.col("b"))
        .join(centers, "c")
    )
    scores = wedges.groupBy("a", "b").agg(
        F.count("*").cast("long").alias("cn_count"),
        F.sum(F.lit(1.0) / F.log(F.col("deg_c"))).alias("aa_score"),
    )
    if include_existing:
        return scores
    existing = nbrs.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    return scores.join(existing, ["a", "b"], "left_anti")


def jaccard_scores(
    edges: DataFrame,
    probe_mod: int | None = None,
    degree_cap: int | None = None,
) -> DataFrame:
    """(a, b, cn_count, jaccard) for non-adjacent unordered pairs a < b:

        jaccard(a, b) = |N(a) ∩ N(b)| / |N(a) ∪ N(b)|
                      = cn / (deg(a) + deg(b) − cn)

    Same wedge self-join as adamic_adar (one shuffle on the center, one
    on the pair), plus two broadcast-or-shuffle joins against the degree
    table to resolve the union size — no second pass over the edge
    table. ``probe_mod``/``degree_cap`` as in adamic_adar."""
    nbrs = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = nbrs.groupBy(F.col("src").alias("c")).agg(
        F.count("*").cast("long").alias("deg_c")
    )
    centers = deg if degree_cap is None else deg.filter(F.col("deg_c") <= degree_cap)

    left = nbrs.select(F.col("src").alias("c"), F.col("dst").alias("a"))
    if probe_mod is not None:
        left = left.filter(F.pmod(F.col("a"), F.lit(probe_mod)) == 0)
    right = nbrs.select(F.col("src").alias("c"), F.col("dst").alias("b"))

    wedges = left.join(right, "c").filter(F.col("a") < F.col("b"))
    if degree_cap is not None:
        wedges = wedges.join(centers.select("c"), "c", "left_semi")
    cn = wedges.groupBy("a", "b").agg(F.count("*").cast("long").alias("cn_count"))
    deg_a = deg.select(F.col("c").alias("a"), F.col("deg_c").alias("deg_a"))
    deg_b = deg.select(F.col("c").alias("b"), F.col("deg_c").alias("deg_b"))
    scored = cn.join(deg_a, "a").join(deg_b, "b").select(
        "a",
        "b",
        "cn_count",
        (
            F.col("cn_count")
            / (F.col("deg_a") + F.col("deg_b") - F.col("cn_count"))
        ).alias("jaccard"),
    )
    existing = nbrs.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    return scored.join(existing, ["a", "b"], "left_anti")


def jaccard_sql(probe_mod: int | None = None, round_to: int = 6) -> str:
    """DuckDB twin of jaccard_scores over the `edges` CTE (same
    association order: cn / (deg_a + deg_b - cn))."""
    probe = f"AND l.dst % {probe_mod} = 0" if probe_mod is not None else ""
    return f"""nbrs AS (
    SELECT DISTINCT src, dst FROM edges WHERE src <> dst
),
deg AS (SELECT src AS c, COUNT(*)::BIGINT AS deg_c FROM nbrs GROUP BY src),
cn AS (
    SELECT l.dst AS a, r.dst AS b, COUNT(*)::BIGINT AS cn_count
    FROM nbrs l JOIN nbrs r ON l.src = r.src AND l.dst < r.dst {probe}
    GROUP BY l.dst, r.dst
),
scored AS (
    SELECT cn.a, cn.b, cn.cn_count,
           cn.cn_count / CAST(da.deg_c + db.deg_c - cn.cn_count AS DOUBLE) AS jaccard
    FROM cn JOIN deg da ON cn.a = da.c JOIN deg db ON cn.b = db.c
),
existing AS (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM nbrs
)
SELECT s.a, s.b, s.cn_count, ROUND(s.jaccard, {round_to}) AS jaccard
FROM scored s LEFT JOIN existing e ON s.a = e.a AND s.b = e.b
WHERE e.a IS NULL"""


def adamic_adar_sql(
    probe_mod: int | None = None, round_to: int = 6
) -> str:
    """DuckDB twin over the `edges` CTE (same association order:
    1.0 / LN(deg))."""
    probe = f"AND l.dst % {probe_mod} = 0" if probe_mod is not None else ""
    return f"""nbrs AS (
    SELECT DISTINCT src, dst FROM edges WHERE src <> dst
),
deg AS (SELECT src AS c, COUNT(*)::BIGINT AS deg_c FROM nbrs GROUP BY src),
wedges AS (
    SELECT l.dst AS a, r.dst AS b, l.src AS c
    FROM nbrs l JOIN nbrs r ON l.src = r.src AND l.dst < r.dst {probe}
),
scores AS (
    SELECT w.a, w.b, COUNT(*)::BIGINT AS cn_count,
           SUM(1.0 / LN(d.deg_c)) AS aa_score
    FROM wedges w JOIN deg d ON w.c = d.c
    GROUP BY w.a, w.b
),
existing AS (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM nbrs
)
SELECT s.a, s.b, s.cn_count, ROUND(s.aa_score, {round_to}) AS aa_score
FROM scores s LEFT JOIN existing e ON s.a = e.a AND s.b = e.b
WHERE e.a IS NULL"""


LINKPRED_KS = (5, 10, 20)


def linkpred_precision_at_k(
    edges_train: DataFrame, edges_full: DataFrame, ks: tuple[int, ...] = LINKPRED_KS
) -> DataFrame:
    """(k, hits, precision) — the standard link-prediction evaluation
    protocol (Liben-Nowell & Kleinberg): hold out part of the graph,
    rank non-adjacent pairs of the TRAIN graph by Adamic-Adar, and
    measure what fraction of the top-k predicted pairs are true edges
    of the FULL graph that the train split hid.  The model-selection
    loop for the linkpred family (adamic_adar / jaccard) — run per
    refresh to catch scorer or extraction drift.

    Deterministic: scores rounded to 6 dp before ranking, ties broken
    by (a, b); the top-max(k) cut is an orderBy().limit() TakeOrdered
    (k is tens — driver-scale by definition), so NO global window ever
    sorts the full candidate set.  Held-out pairs = canonical full
    pairs anti-join train pairs.
    """
    scored = adamic_adar(edges_train).select(
        "a", "b", F.round("aa_score", 6).alias("s")
    )
    mk = max(ks)
    top = scored.orderBy(F.desc("s"), F.asc("a"), F.asc("b")).limit(mk)
    w = Window.orderBy(F.desc("s"), F.asc("a"), F.asc("b"))
    ranked = top.select("a", "b", F.row_number().over(w).alias("rnk"))

    def canon(e):
        return (
            e.select("src", "dst")
            .filter(F.col("src") != F.col("dst"))
            .select(
                F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
            )
            .distinct()
        )

    new = canon(edges_full).join(canon(edges_train), ["a", "b"], "left_anti")
    hits = ranked.join(new, ["a", "b"], "left_semi").select(
        "rnk", F.lit(1).alias("hit")
    )
    flagged = ranked.select("rnk").join(hits, "rnk", "left").select(
        "rnk", F.coalesce("hit", F.lit(0)).alias("hit")
    )
    ksdf = edges_train.sparkSession.createDataFrame([(k,) for k in ks], "k int")
    return (
        flagged.crossJoin(F.broadcast(ksdf))
        .filter(F.col("rnk") <= F.col("k"))
        .groupBy("k")
        .agg(F.sum("hit").cast("long").alias("hits"))
        .select("k", "hits", F.round(F.col("hits") / F.col("k"), 6).alias("precision"))
    )


def linkpred_precision_sql(
    train_edges_with: str, full_edges_with: str, ks: tuple[int, ...] = LINKPRED_KS
) -> str:
    """DuckDB twin: ``train_edges_with`` / ``full_edges_with`` are full
    WITH-clause bodies each defining an `edges` CTE (name collisions are
    avoided by nesting them as subqueries)."""
    mk = max(ks)
    vals = ", ".join(f"({k})" for k in ks)
    return f"""
    WITH lp_scored AS (
        SELECT a, b, ROUND(aa_score, 6) AS s
        FROM (WITH {train_edges_with},\n{adamic_adar_sql()})
    ),
    lp_top AS (SELECT a, b, s FROM lp_scored ORDER BY s DESC, a, b LIMIT {mk}),
    lp_rnk AS (
        SELECT a, b, ROW_NUMBER() OVER (ORDER BY s DESC, a, b) AS rnk FROM lp_top
    ),
    lp_new AS (
        SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM (WITH {full_edges_with} SELECT DISTINCT src, dst FROM edges WHERE src <> dst)
        EXCEPT
        SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM (WITH {train_edges_with} SELECT DISTINCT src, dst FROM edges WHERE src <> dst)
    ),
    lp_flag AS (
        SELECT r.rnk,
               CASE WHEN EXISTS (SELECT 1 FROM lp_new n
                                 WHERE n.a = r.a AND n.b = r.b)
                    THEN 1 ELSE 0 END AS hit
        FROM lp_rnk r
    )
    SELECT k, SUM(hit)::BIGINT AS hits,
           ROUND(SUM(hit) / k, 6) AS precision
    FROM lp_flag CROSS JOIN (VALUES {vals}) AS kv(k)
    WHERE rnk <= k
    GROUP BY k
    """
