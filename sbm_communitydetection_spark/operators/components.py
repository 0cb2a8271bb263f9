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
    """For every u: connect all strictly-larger neighbors to min(N(u) ∪ {u}).

    Output is NOT deduplicated: the algorithm operates on the edge SET,
    duplicates are harmless to small-star's min-aggregate, and its final
    distinct dedups anyway — skipping the dedup here removes one full
    exchange of the pair set per round (measured ~15% off the CC wall).
    """
    sym = pairs.unionByName(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    m = sym.groupBy("src").agg(F.min("dst").alias("mn"))
    m = m.select("src", F.least("src", "mn").alias("m"))
    return (
        sym.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
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


# ---------------------------------------------------------------------------
# strongly connected components (directed) — forward-coloring + backward reach
# ---------------------------------------------------------------------------


def _min_forward_labels(
    spark: SparkSession,
    dedges: DataFrame,
    verts: DataFrame,
    run_id: str,
    max_iterations: int = 50,
) -> DataFrame:
    """(id, lbl) fixpoint of lbl(v) = min(lbl(v), min_{u->v} lbl(u)),
    lbl0 = id — i.e. lbl(v) = min vertex that can REACH v. Each superstep
    is one keyed join + min-aggregate (CC-shaped); O(directed diameter)
    rounds."""
    driver = IterationDriver(spark, run_id=run_id)
    last = {"sum": None}

    def step(state: DataFrame, i: int):
        incoming = (
            dedges.join(state.select(F.col("id").alias("src"), "lbl"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("lbl").alias("in_lbl"))
        )
        new = state.join(incoming, "id", "left").select(
            "id", F.least("lbl", F.coalesce("in_lbl", "lbl")).alias("lbl")
        )

        def changed(persisted: DataFrame) -> float:
            row = persisted.agg(
                F.coalesce(
                    F.sum(F.xxhash64("id", "lbl").cast("decimal(38,0)")), F.lit(0)
                ).alias("h")
            ).collect()[0]
            same = last["sum"] == row.h
            last["sum"] = row.h
            return 0.0 if same else 1.0

        return new, changed

    init = verts.select("id", F.col("id").alias("lbl"))
    return driver.run(
        init,
        step,
        max_iterations=max_iterations,
        tolerance=0.0,
        metric_name="label_set_changed",
        log_rows=False,
    ).state


def strongly_connected_components(
    spark: SparkSession,
    edges: DataFrame,
    max_outer: int = 20,
    max_inner: int = 50,
) -> DataFrame:
    """scc(id, scc) over a DIRECTED edge table, scc = min id in the SCC.

    The distributed coloring algorithm (Orzan 2004 / FW-BW family):

    1. colors: forward min-label fixpoint — color(v) = min vertex
       reaching v. Every SCC lies inside one color, and any v->color(v)
       path stays inside the color (min-ancestor argument), so
    2. within each color, the backward frontier fixpoint from the color
       ROOT along intra-color edges marks exactly SCC(root);
    3. assign those, drop them from the graph, repeat. Each round
       retires >= 1 SCC per color class (always the global minimum's),
       so rounds are few on real graphs (hub-heavy reply graphs resolve
       in 2-3).

    Every superstep is a keyed equi-join + aggregate on (src|dst|id) —
    the same shuffle shape as large-star/small-star CC; nothing is ever
    collected to the driver. No reference analogue (the reference graph
    is undirected); north-star §2.13 scope: reply graphs are directed,
    and "mutual-reply cores" are their natural community primitive.
    """
    dedges = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    remaining = (
        dedges.select(F.col("src").alias("id"))
        .unionByName(dedges.select(F.col("dst").alias("id")))
        .distinct()
    )
    assigned_parts: list[DataFrame] = []

    for outer in range(max_outer):
        if remaining.limit(1).count() == 0:
            break
        colors = _min_forward_labels(
            spark, dedges, remaining, run_id=f"scc_f{outer}", max_iterations=max_inner
        )
        # intra-color directed edges only (SCC paths never leave the color)
        ic = (
            dedges.join(colors.select(F.col("id").alias("src"), F.col("lbl").alias("cs")), "src")
            .join(colors.select(F.col("id").alias("dst"), F.col("lbl").alias("cd")), "dst")
            .filter(F.col("cs") == F.col("cd"))
            .select("src", "dst")
        )
        # backward frontier from each color root: reached = can reach root
        reached = colors.filter(F.col("id") == F.col("lbl")).select("id")
        prev_n = -1
        for _ in range(max_inner):
            n = reached.count()
            if n == prev_n:
                break
            prev_n = n
            step_up = (
                ic.join(reached.select(F.col("id").alias("dst")), "dst")
                .select(F.col("src").alias("id"))
                .distinct()
            )
            reached = reached.unionByName(step_up).distinct().localCheckpoint(eager=True)
        done = colors.join(reached, "id").select("id", F.col("lbl").alias("scc"))
        assigned_parts.append(done.localCheckpoint(eager=True))
        remaining = remaining.join(done.select("id"), "id", "left_anti").localCheckpoint(
            eager=True
        )
        dedges = (
            dedges.join(remaining.select(F.col("id").alias("src")), "src", "left_semi")
            .join(remaining.select(F.col("id").alias("dst")), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )

    # anything unresolved after max_outer (pathological chains) keeps id
    out = remaining.select("id", F.col("id").alias("scc"))
    for part in assigned_parts:
        out = out.unionByName(part)
    return out
