"""k-core peeling — iterative degree-threshold subgraph extraction.

No reference analogue (the reference's only subgraph notion is the
two-community FM pair); k-core is the standard link-graph density
filter a transcripts graph pipeline uses to isolate the interaction
core before community detection.

Semantics: the k-core is the maximal subgraph in which every vertex
has ≥ k distinct neighbors (simple-graph degree, self-loops dropped).
Computed by synchronous peeling: each round removes every vertex whose
current degree < k; the fixpoint is order-independent, so the
distributed synchronous rounds and any sequential peel agree exactly.

Plan shape per round: one semi-join of the (static) pair table against
the surviving-vertex set on EACH endpoint + one count aggregate — the
pair table is pre-partitioned once and never re-exchanged, only the
shrinking vertex set moves (same discipline as PR/LPA, plans/iterate).

`rounds` (fixed-round mode) exists for the DuckDB gate: the oracle is
the same peel unrolled (functions/sql_oracles.k_core_unrolled_sql);
convergence on the gate graph is verified in tests so the fixed unroll
equals the true fixpoint there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.iterate import (
    IterationDriver,
    partition_preserving_checkpoint,
    unpersist_checkpoint,
)


def k_core(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    rounds: int | None = None,
    driver: IterationDriver | None = None,
    max_iterations: int = 100,
) -> DataFrame:
    """survivors(id, degree) of the k-core (degree = within-core degree).

    edges: directed or symmetrized; treated as an undirected simple
    graph. rounds=None peels to the fixpoint; rounds=R runs exactly R
    synchronous peel rounds (gate parity mode)."""
    driver = driver or IterationDriver(spark, run_id=f"kcore{k}")
    sym = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    pairs = partition_preserving_checkpoint(
        sym.unionByName(sym.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .repartition("src")
    )

    verts = pairs.select(F.col("src").alias("id")).distinct()

    def step(state: DataFrame, i: int):
        surv_src = state.select(F.col("id").alias("src"))
        surv_dst = state.select(F.col("id").alias("dst"))
        deg = (
            pairs.join(surv_src.hint("SHUFFLE_HASH"), "src", "left_semi")
            .join(surv_dst.hint("SHUFFLE_HASH"), "dst", "left_semi")
            .groupBy("src")
            .agg(F.count("*").alias("degree"))
        )
        new = deg.filter(F.col("degree") >= k).select(
            F.col("src").alias("id"), "degree"
        )
        if rounds is not None:
            return new, float("inf")

        # converged when no vertex was peeled this round (cheap count on
        # the persisted output vs the previous state's size)
        prev_n = state.count()

        def removed(persisted: DataFrame) -> float:
            return float(prev_n - persisted.count())

        return new, removed

    init = verts.select("id", F.lit(-1).cast("long").alias("degree"))
    result = driver.run(
        init,
        step,
        max_iterations=rounds if rounds is not None else max_iterations,
        tolerance=-1.0 if rounds is not None else 0.0,
        metric_name="peeled",
        log_rows=rounds is None,
    )
    unpersist_checkpoint(pairs)
    return result.state
