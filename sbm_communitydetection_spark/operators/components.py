"""Connected components via large-star / small-star hashing.

The alternating large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014) — the
north-star CC algorithm (BASELINE.json).  Each round is two grouped
min-aggregations + joins; converges in O(log n) rounds to a star graph
whose centers are the component minima, so component ids are EXACT
(= min vertex id in the component), matching the determinism contract.

The reference has no explicit CC operator (its "components" are the
planted SBM communities); this is north-star scope (SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.iterate import IterationDriver


def _checksum(df: DataFrame) -> tuple[int, int]:
    row = df.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")), F.lit(0)).alias("h"),
    ).collect()[0]
    return row.n, int(row.h)


def _large_star(pairs: DataFrame) -> DataFrame:
    """For every u: connect all strictly-larger neighbors to min(N(u) ∪ {u})."""
    sym = pairs.unionByName(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    m = sym.groupBy("src").agg(F.min("dst").alias("mn"))
    m = m.select("src", F.least("src", "mn").alias("m"))
    return (
        sym.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(pairs: DataFrame) -> DataFrame:
    """Orient (u=max, v=min); connect all smaller neighbors AND u itself to
    the minimum of u's smaller neighborhood."""
    oriented = pairs.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    ).filter(F.col("u") != F.col("v"))
    m = oriented.groupBy("u").agg(F.min("v").alias("m"))
    linked = oriented.join(m, "u")
    out = linked.select(F.col("v").alias("src"), F.col("m").alias("dst")).unionByName(
        m.select(F.col("u").alias("src"), F.col("m").alias("dst"))
    )
    return out.filter(F.col("src") != F.col("dst")).distinct()


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    driver: IterationDriver | None = None,
    max_iterations: int = 30,
) -> DataFrame:
    """components(id, component) with component = min id in the component.

    `edges` may be directed or symmetrized; weights are ignored.
    `vertices` (optional, column `id`) contributes isolated vertices,
    which form singleton components.
    """
    driver = driver or IterationDriver(spark, run_id="cc")
    pairs = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()

    last = {"sum": None}

    def step(state: DataFrame, i: int):
        new = _small_star(_large_star(state))

        # callable metric: the (count, hash) checksum runs on the PERSISTED
        # round output — one cached scan, no recompute of the round plan
        def changed(persisted: DataFrame) -> float:
            n, h = _checksum(persisted)
            same = last["sum"] == (n, h)
            last["sum"] = (n, h)
            return 0.0 if same else 1.0

        return new, changed

    # log_rows=False: the checksum metric already scans the persisted round
    # output (and carries the row count inside it) — the separate
    # metrics-only count action would be a third whole job per round
    result = driver.run(
        pairs,
        step,
        max_iterations=max_iterations,
        tolerance=0.0,
        metric_name="edge_set_changed",
        log_rows=False,
    )
    stars = result.state  # (member, center) pairs; centers are component minima

    comp = stars.select(F.col("src").alias("id"), F.col("dst").alias("component")).unionByName(
        stars.select(F.col("dst").alias("id"), F.col("dst").alias("component"))
    )
    comp = comp.groupBy("id").agg(F.min("component").alias("component"))

    # from the UNFILTERED edges: a vertex mentioned only in self-loops
    # still exists and forms its own singleton component
    all_ids = edges.select(F.col("src").alias("id")).unionByName(
        edges.select(F.col("dst").alias("id"))
    )
    if vertices is not None:
        all_ids = all_ids.unionByName(vertices.select("id"))
    all_ids = all_ids.distinct()
    return all_ids.join(comp, "id", "left").select(
        "id", F.coalesce("component", "id").alias("component")
    )
