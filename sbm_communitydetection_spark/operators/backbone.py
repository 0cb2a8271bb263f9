"""Disparity-filter backbone extraction (Serrano, Boguñá, Vespignani,
PNAS 106(16), 2009) — statistically principled edge sparsification for
weighted multiscale graphs.

Transcript-derived actor graphs are exactly the kind of graph the
disparity filter was built for: a few hub actors (tools, coordinator
agents) carry enormous total weight, and naive "keep edges with
weight >= W" global thresholds either keep everything at the hubs or
nothing at the leaves.  The filter instead tests each edge AGAINST ITS
OWN ENDPOINT's weight distribution: under the null that a degree-k
vertex spreads its strength uniformly at random, the p-value of an
edge carrying fraction w/s of the strength is

    p = (1 - w/s)^(k-1)

and an edge survives if it is significant (p < alpha) from EITHER
endpoint's viewpoint.  The backbone preserves the multiscale structure
at a fraction of the edges — the principled input thinning before the
quadratic operators (triad census, clique counting) and a better
sample_edges than a uniform coin when weights matter.

Reference scope: the reference keeps accumulated integer edge weights
(src/graph.cpp:24-26 addEdge weight-accumulate) but never filters by
them; the disparity filter is a north-star extension over exactly that
weight bookkeeping (SURVEY.md §2.13 family).

Spark-first shape: degree/strength is one groupBy on the symmetric
table, the p-value is a per-edge closed-form expression after two
co-keyed joins, and the either-endpoint min is a canonical-pair
aggregate — no iteration, no window, rides the scan at any scale.

Determinism: p is computed with pow() on exact int64 (weight,
strength, degree) inputs and 6 dp-rounded BEFORE the alpha compare, so
the keep decision cannot ulp-flip between engines (both sides'
pow/round are applied to identical integers).  Pendant edges (an
endpoint of degree 1 has p = 1 by construction, which would isolate
the vertex) are kept when ``keep_pendants`` — the paper's connectivity
convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DISPARITY_ALPHA = 0.05


def disparity_filter(
    edges: DataFrame,
    alpha: float = DISPARITY_ALPHA,
    keep_pendants: bool = True,
) -> DataFrame:
    """(src, dst, weight, p_min) — surviving canonical edges (src < dst)
    of the symmetric weighted table under the disparity filter at
    significance `alpha`."""
    ds = edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("k"),
        F.sum("weight").cast("long").alias("s"),
    )
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .join(ds.select(F.col("id").alias("src"), "k", "s"), "src")
        .select(
            "src",
            "dst",
            "weight",
            "k",
            F.round(
                F.pow(
                    F.lit(1.0) - F.col("weight") / F.col("s"),
                    (F.col("k") - F.lit(1)).cast("double"),
                ),
                6,
            ).alias("p_dir"),
        )
    )
    canon = e.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        "weight",
        "k",
        "p_dir",
    )
    pairs = canon.groupBy("src", "dst").agg(
        F.max("weight").cast("long").alias("weight"),
        F.min("p_dir").alias("p_min"),
        F.min("k").cast("long").alias("k_min"),
    )
    cond = F.col("p_min") < alpha
    if keep_pendants:
        cond = cond | (F.col("k_min") == 1)
    return pairs.filter(cond).select("src", "dst", "weight", "p_min")


def disparity_filter_sql(
    alpha: float = DISPARITY_ALPHA, keep_pendants: bool = True
) -> str:
    """DuckDB twin as a CTE tail over a symmetrized `edges` CTE."""
    pend = " OR k_min = 1" if keep_pendants else ""
    return f"""df_deg AS (
    SELECT src AS id, COUNT(*)::BIGINT AS k, SUM(weight)::BIGINT AS s
    FROM edges GROUP BY src
),
df_e AS (
    SELECT LEAST(e.src, e.dst) AS src, GREATEST(e.src, e.dst) AS dst,
           e.weight, d.k,
           ROUND(pow(1.0 - e.weight / CAST(d.s AS DOUBLE), (d.k - 1)::DOUBLE), 6) AS p_dir
    FROM edges e JOIN df_deg d ON d.id = e.src
    WHERE e.src <> e.dst
),
df_pairs AS (
    SELECT src, dst, MAX(weight)::BIGINT AS weight,
           MIN(p_dir) AS p_min, MIN(k)::BIGINT AS k_min
    FROM df_e GROUP BY src, dst
)
SELECT src, dst, weight, p_min FROM df_pairs
WHERE p_min < {alpha}{pend}"""
