"""Triangle counting via degree-ordered orientation (north-star op).

Standard two-join formulation: orient every undirected edge from the
lower-(degree, id) endpoint to the higher one — each triangle then has
exactly one wedge (a→b, b→c) closed by (a→c), so

    triangles = oriented ⋈ oriented (on b)  ⋈  oriented (on (a, c))

The orientation bounds the wedge count by the graph's arboricity-ish
degeneracy (hub vertices get low OUT-degree), which is exactly the
skew-taming trick at 100 TB scale.  No reference analogue (SURVEY.md
§2.13); validated against a brute-force oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _oriented(edges: DataFrame) -> DataFrame:
    """Distinct edges oriented low(degree,id) → high(degree,id)."""
    pairs = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    sym = pairs.unionByName(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count("*").alias("deg")).withColumnRenamed("a", "id")
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    j = pairs.join(da, "a").join(db, "b")
    fwd = F.struct("deg_a", "a") < F.struct("deg_b", "b")
    return j.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )


def triangle_list(edges: DataFrame, oriented: DataFrame | None = None) -> DataFrame:
    """(x, y, z) — each triangle exactly once (as ids along the orientation).

    ``oriented``: optional precomputed (lo, hi) degree-oriented edge
    table — pass `read_bucketed_adjacency` over a table written by
    `sources.bucketed.write_oriented_adjacency` (VERDICT r3 #4): the
    orientation's distinct + two degree joins (and their exchanges)
    disappear from every run, and a `bucketBy(N, "lo")` layout feeds the
    wedge join's e2 side (keyed on lo) exchange-free straight off disk —
    the same across-jobs/restarts co-location trick the PR/LPA
    transition table uses.  When provided it must hold each undirected
    edge exactly once as (lo, hi) under the (degree, id) order."""
    o = oriented.select("lo", "hi") if oriented is not None else _oriented(edges)
    e1 = o.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    e2 = o.select(F.col("lo").alias("y"), F.col("hi").alias("z"))
    wedges = e1.join(e2, "y")
    e3 = o.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    return wedges.join(e3, ["x", "z"]).select("x", "y", "z")


def triangle_count(edges: DataFrame, oriented: DataFrame | None = None) -> DataFrame:
    """Single-row DataFrame: total triangle count."""
    return triangle_list(edges, oriented=oriented).agg(
        F.count("*").cast("long").alias("triangles")
    )


def local_clustering_coefficient(edges: DataFrame) -> DataFrame:
    """(id, lcc) — 2·tri(v) / (d(v)·(d(v)−1)) over DISTINCT neighbors;
    0.0 for degree < 2.

    Reuses the degree-ordered triangle list (one extra groupBy over the
    distinct-neighbor table, no new shuffle shape); the division is the
    only new work. Whole plan is Catalyst-side column math.
    """
    tri = triangle_counts_per_vertex(edges)
    deg = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").cast("long").alias("deg"))
    )
    return tri.join(deg, "id", "left").select(
        "id",
        F.when(
            F.coalesce("deg", F.lit(0)) >= 2,
            F.lit(2.0) * F.col("tri_count") / (F.col("deg") * (F.col("deg") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("lcc"),
    )


def triangle_counts_per_vertex(edges: DataFrame, vertices: DataFrame | None = None) -> DataFrame:
    """(id, tri_count) — triangles incident to each vertex; 0 for the rest."""
    tris = triangle_list(edges)
    member = (
        tris.select(F.col("x").alias("id"))
        .unionByName(tris.select(F.col("y").alias("id")))
        .unionByName(tris.select(F.col("z").alias("id")))
    )
    counts = member.groupBy("id").agg(F.count("*").cast("long").alias("tri_count"))
    ids = (
        vertices.select("id")
        if vertices is not None
        else edges.select(F.col("src").alias("id")).unionByName(edges.select(F.col("dst").alias("id"))).distinct()
    )
    return ids.join(counts, "id", "left").select(
        "id", F.coalesce("tri_count", F.lit(0)).cast("long").alias("tri_count")
    )


# ---------------------------------------------------------------------------
# directed triad motifs (cyclic vs transitive closed triples)
# ---------------------------------------------------------------------------


def directed_triad_census(edges: DataFrame, max_out_degree: int | None = None) -> DataFrame:
    """One row (n_cyclic, n_transitive) — closed directed triple counts
    over the simple digraph (distinct src→dst, self-loops dropped):

    * cyclic: a→b→c→a; each 3-cycle has 3 rotations, counted once by
      pinning a = min of the triple.
    * transitive (feed-forward): a→b, b→c, a→c with a,b,c distinct; the
      (source, middle, sink) roles make each instance unique already.

    The cyclic:transitive ratio is the classic reciprocity-of-flow motif
    signature of a reply digraph (feed-forward-heavy = broadcast
    hierarchies; cycle-heavy = conversational loops).

    Two keyed self-joins on the distinct edge list — the digraph
    analogue of the wedge formulation in triangle_list. Degree-ordered
    orientation does not apply to directed motifs, so hub wedges are the
    cost driver: a wedge center of out-degree d contributes O(d·in(d))
    rows, quadratic for a 10^7-degree hub.  ``max_out_degree`` is the
    in-op guard (VERDICT r2 #3 / ADVICE r2): vertices whose OUT-degree
    exceeds the cap are removed from the digraph before the joins (every
    triad role, so counts stay consistent — the census is then exact on
    the hub-filtered subgraph, the standard motif-analysis practice).
    None (default) = exact census; pass a cap (e.g. 10_000) on
    hub-skewed inputs, or compose with graph_ops.sample_edges for a
    sampled census."""
    d = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if max_out_degree is not None:
        # anti-join against the HUB set (not semi-join against the ok set:
        # a pure sink has no out-edges, so it never appears in the
        # out-degree aggregate and a semi-join would wrongly drop it)
        hubs = (
            d.groupBy("src")
            .agg(F.count("*").alias("out_deg"))
            .filter(F.col("out_deg") > max_out_degree)
            .select(F.col("src").alias("id"))
        )
        d = (
            d.join(hubs.select(F.col("id").alias("src")), "src", "left_anti")
            .join(hubs.select(F.col("id").alias("dst")), "dst", "left_anti")
            .select("src", "dst")
        )
    e1 = d.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = d.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e_ca = d.select(F.col("src").alias("c"), F.col("dst").alias("a"))
    wedges = e1.join(e2, "b").filter(F.col("a") != F.col("c"))
    cyc = (
        wedges.join(e_ca, ["c", "a"])
        .filter((F.col("a") < F.col("b")) & (F.col("a") < F.col("c")))
        .agg(F.count("*").cast("long").alias("n"))
    )
    e_ac = d.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tra = wedges.join(e_ac, ["a", "c"]).agg(F.count("*").cast("long").alias("n"))
    return cyc.select(F.col("n").alias("n_cyclic")).crossJoin(
        tra.select(F.col("n").alias("n_transitive"))
    )


# ---------------------------------------------------------------------------
# bipartite 4-cycle (butterfly) counting
# ---------------------------------------------------------------------------


def butterfly_count(
    incidence: DataFrame, max_right_degree: int | None = None
) -> DataFrame:
    """One row (n_wedge_pairs, n_butterflies) over a BIPARTITE incidence
    table ``(left, right)`` — butterflies are the 4-cycles
    (l1–r1–l2–r2–l1), the bipartite analogue of the triangle and the
    standard cohesion motif for two-mode networks (Sanei-Mehri et al.
    2018): b = Σ_{l1<l2} C(|N(l1) ∩ N(l2)|, 2).

    On the transcript graph the natural incidence is actor×tool (who
    invokes what): butterflies measure tool-usage overlap structure —
    two actors sharing two tools — which pure projections lose.
    n_wedge_pairs = Σ C(common, 1 choose pairs) intermediate (the
    co-occurrence pair mass), reported because it is the op's true cost.

    Scale shape: ONE self-join on the distinct incidence keyed by the
    RIGHT vertex (wedge center) + one (l1, l2) count aggregate + one
    scalar fold — the wedge formulation, never materializing 4-tuples.
    Right-hub vertices drive the cost quadratically (a tool invoked by
    10^5 actors yields 10^10 wedges), so ``max_right_degree`` removes
    right hubs before the join (exact on the filtered subgraph, as in
    directed_triad_census). Left hubs are harmless: a left vertex
    enters a wedge only via its co-membership, cost linear in degree."""
    inc = incidence.select("left", "right").distinct()
    if max_right_degree is not None:
        hubs = (
            inc.groupBy("right")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") > max_right_degree)
            .select("right")
        )
        inc = inc.join(hubs, "right", "left_anti")
    a = inc.select(F.col("left").alias("l1"), "right")
    b = inc.select(F.col("left").alias("l2"), "right")
    common = (
        a.join(b, "right")
        .filter(F.col("l1") < F.col("l2"))
        .groupBy("l1", "l2")
        .agg(F.count("*").alias("c"))
    )
    return common.agg(
        F.sum("c").cast("long").alias("n_wedge_pairs"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("n_butterflies"),
    )


def butterfly_count_sql() -> str:
    """DuckDB mirror over an `incidence(left, right)` CTE."""
    return """
    inc AS (SELECT DISTINCT "left", "right" FROM incidence),
    common AS (
        SELECT a."left" AS l1, b."left" AS l2, COUNT(*) AS c
        FROM inc a JOIN inc b ON a."right" = b."right" AND a."left" < b."left"
        GROUP BY 1, 2
    )
    SELECT SUM(c)::BIGINT AS n_wedge_pairs,
           SUM(c * (c - 1) / 2)::BIGINT AS n_butterflies
    FROM common
    """


def edge_embeddedness(edges: DataFrame) -> DataFrame:
    """(a, b, common, jaccard) — per-EDGE embeddedness: the number of
    common neighbors of the edge's endpoints and the Jaccard of their
    neighborhoods (Granovetter weak-tie analysis: embeddedness 0 edges
    are bridges between social contexts; high-Jaccard edges are
    intra-community).  The edge-level complement of the per-vertex
    local clustering coefficient.

    Shape: HUB-SAFE — common(a, b) = the number of triangles containing
    edge (a, b), so the counts come from the degree-ORIENTED
    triangle_list (Σd_out² wedge cost, the same orientation trick the
    exact counter uses) with each listed triangle exploded to its three
    canonical edges; an unoriented per-edge wedge join would pay d² on
    every hub.  Then one degree join per endpoint.  jaccard is rounded
    to 6 dp (a ratio of exact longs — the rounding only canonicalizes
    the decimal print)."""
    pairs = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    sym = pairs.unionByName(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count("*").alias("deg")).withColumnRenamed("a", "id")
    tri = triangle_list(edges)
    wed = (
        tri.select(
            F.explode(
                F.array(
                    F.struct(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")),
                    F.struct(F.least("x", "z").alias("a"), F.greatest("x", "z").alias("b")),
                    F.struct(F.least("y", "z").alias("a"), F.greatest("y", "z").alias("b")),
                )
            ).alias("e")
        )
        .select(F.col("e.a").alias("a"), F.col("e.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("common"))
    )
    out = (
        pairs.join(wed, ["a", "b"], "left")
        .join(deg.select(F.col("id").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            "a",
            "b",
            F.coalesce("common", F.lit(0)).alias("common"),
            F.round(
                F.coalesce("common", F.lit(0))
                / (F.col("da") + F.col("db") - F.coalesce("common", F.lit(0)) - F.lit(2)).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )
    # degenerate case: two vertices joined only to each other —
    # denominator 0, define jaccard 0.0 (no third parties to share)
    return out.select(
        "a",
        "b",
        "common",
        F.when(F.col("jaccard").isNull() | F.isnan("jaccard"), F.lit(0.0))
        .otherwise(F.col("jaccard"))
        .alias("jaccard"),
    )


def edge_embeddedness_sql() -> str:
    """DuckDB twin over the `edges` CTE (neighborhood Jaccard excludes
    the endpoints themselves: |N(a) ∩ N(b)| / |N(a) ∪ N(b) \\ {a,b}|)."""
    return """epairs AS (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges WHERE src <> dst
),
esym AS (
    SELECT a, b FROM epairs UNION ALL SELECT b, a FROM epairs
),
edeg AS (SELECT a AS id, COUNT(*)::BIGINT AS deg FROM esym GROUP BY a),
ewed AS (
    SELECT p.a, p.b, COUNT(*)::BIGINT AS common
    FROM epairs p
    JOIN esym s1 ON s1.a = p.a AND s1.b <> p.b
    JOIN esym s2 ON s2.a = p.b AND s2.b = s1.b
    GROUP BY p.a, p.b
)
SELECT p.a, p.b, COALESCE(w.common, 0)::BIGINT AS common,
       CASE WHEN da.deg + db.deg - COALESCE(w.common, 0) - 2 = 0 THEN 0.0
            ELSE ROUND(COALESCE(w.common, 0)::DOUBLE
                       / (da.deg + db.deg - COALESCE(w.common, 0) - 2), 6)
       END AS jaccard
FROM epairs p
LEFT JOIN ewed w ON w.a = p.a AND w.b = p.b
JOIN edeg da ON da.id = p.a
JOIN edeg db ON db.id = p.b"""


DOULION_PERMILLE = 300


def triangle_estimate_sampled(
    edges: DataFrame, permille: int = DOULION_PERMILLE, seed: int = 0
) -> DataFrame:
    """One-row (sampled_triangles, estimate) — DOULION (Tsourakakis et
    al., KDD 2009): count triangles on a p-sparsified graph and scale by
    1/p³.  With the deterministic portable-hash edge sample the estimate
    is reproducible AND oracle-checkable (same coin both engines); the
    estimator is unbiased with variance ~1/p³ · T, the standard
    accuracy/cost dial when the exact count's Σd² wedge join is too hot.

    Shape: the sample is a per-row filter on the scan (zero shuffle
    added); everything after is the exact counter on a permille/1000-
    sized edge set — the wedge join cost falls by ~p² and the heavy-hub
    orientation degree by ~p.  The coin flips on the CANONICAL pair
    (least, greatest) so each undirected edge is kept with exactly p
    regardless of how many directed rows represent it (a direction-
    sensitive coin would keep pairs with 1-(1-p)² and bias the
    estimator)."""
    from ..textops.portable import md5_long

    coin = md5_long(
        F.concat_ws(
            ":",
            F.lit(str(seed)),
            F.least("src", "dst").cast("string"),
            F.greatest("src", "dst").cast("string"),
        )
    )
    sampled = edges.filter(F.pmod(coin, F.lit(1000)) < permille)
    p = permille / 1000.0
    return triangle_count(sampled).select(
        F.col("triangles").alias("sampled_triangles"),
        F.round(F.col("triangles") / F.lit(p**3), 6).alias("estimate"),
    )


def triangle_estimate_sampled_sql(permille: int = DOULION_PERMILLE, seed: int = 0) -> str:
    """DuckDB twin over the `edges` CTE — same coin, same scaling."""
    p = permille / 1000.0
    return f"""spairs AS (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM edges
    WHERE src <> dst
      AND CAST(concat('0x', substr(md5('{seed}' || ':' || CAST(LEAST(src, dst) AS VARCHAR) || ':'
          || CAST(GREATEST(src, dst) AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 < {permille}
)
SELECT COUNT(*)::BIGINT AS sampled_triangles,
       ROUND(COUNT(*) / {p**3}, 6) AS estimate
FROM spairs p1
JOIN spairs p2 ON p1.b = p2.a
JOIN spairs p3 ON p3.a = p1.a AND p3.b = p2.b"""


# ---------------------------------------------------------------------------
# 4-cliques (motif family one step up from triangles)
# ---------------------------------------------------------------------------


def four_clique_count(edges: DataFrame) -> DataFrame:
    """Single-row (four_cliques) — K4 count over the undirected simple
    graph.  Community cores and templated boilerplate both show up as
    K4-dense regions; the K4/triangle ratio is a standard
    higher-order-clustering probe (Yin et al., KDD'17 motif framework).

    Counting scheme: every K4 has a unique TOP vertex d in the
    degree-(then id) orientation order; the other three form exactly one
    oriented triangle (x→y→z).  So: extend each listed triangle from its
    LOWEST vertex x (whose out-degree is degeneracy-bounded — the same
    skew-taming trick as triangle_list), then keep candidates where y→d
    and z→d also exist (two semi-joins).  Per-candidate cost is
    O(Σ_tri outdeg(x)), never hub-quadratic, and each K4 is counted
    exactly once.
    """
    o = _oriented(edges)
    tris = triangle_list(edges)
    cand = tris.join(o.select(F.col("lo").alias("x"), F.col("hi").alias("d")), "x")
    e_yd = o.select(F.col("lo").alias("y"), F.col("hi").alias("d"))
    e_zd = o.select(F.col("lo").alias("z"), F.col("hi").alias("d"))
    quads = cand.join(e_yd, ["y", "d"], "left_semi").join(
        e_zd, ["z", "d"], "left_semi"
    )
    return quads.agg(F.count("*").cast("long").alias("four_cliques"))


def four_clique_count_sql() -> str:
    """DuckDB twin over an `edges(src, dst, weight)` CTE: canonical
    a<b<c<d enumeration via triangle materialization + one-vertex
    extension (the naive 6-way self-join is quadratic in the dense
    core; this mirrors the Spark plan's triangle-first shape)."""
    return """
    und AS MATERIALIZED (
        SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM edges WHERE src <> dst
    ),
    tri AS MATERIALIZED (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM und e1
        JOIN und e2 ON e2.u = e1.u AND e2.v > e1.v
        JOIN und bc ON bc.u = e1.v AND bc.v = e2.v
    )
    SELECT COUNT(*)::BIGINT AS four_cliques
    FROM tri t
    JOIN und cd ON cd.u = t.c                  -- d > c by construction
    JOIN und bd ON bd.u = t.b AND bd.v = cd.v  -- (b, d)
    JOIN und ad ON ad.u = t.a AND ad.v = cd.v  -- (a, d)
    """


def clique_percolation_communities(spark, edges: DataFrame) -> DataFrame:
    """(id, community) — k-clique percolation communities for k = 3
    (Palla, Derényi, Farkas, Vicsek, Nature 435, 2005): two triangles
    belong to the same community iff they are connected through a chain
    of triangles sharing an edge; a VERTEX belongs to every community
    any of its triangles lands in — the engine's only OVERLAPPING
    community detector (an actor bridging two tightly-knit circles is
    legitimately a member of both, which every partition-based operator
    here must deny by construction).

    Composition of two already-gated primitives, no new join shapes:

      1. the degree-ordered triangle list (triangle_list above),
         canonicalized to a < b < c and hashed to a 60-bit tid;
      2. per shared EDGE, triangles are star-wired to the minimum tid
         on that edge — NOT all-pairs: an edge shared by t triangles
         emits t−1 star rows instead of t·(t−1)/2 pair rows, the same
         hub-safe contraction the CC operator itself applies (star
         wiring preserves exactly the connectivity the percolation
         needs);
      3. north-star connected_components over the (star) triangle
         graph; community = min tid, mapped back through the
         triangle→vertex incidence (3 rows per triangle, distinct).

    Output rows are (vertex, community) pairs; vertices in no triangle
    do not appear (percolation communities are defined on cliques).
    At 10^12 edges the triangle list dominates the cost exactly as
    triangle_count does; everything after it is linear in triangles.
    """
    from ..textops.portable import md5_long

    tri = triangle_list(edges).select(
        F.least("x", "y", "z").alias("a"),
        (F.col("x") + F.col("y") + F.col("z")
         - F.least("x", "y", "z") - F.greatest("x", "y", "z")).alias("b"),
        F.greatest("x", "y", "z").alias("c"),
    )
    tri = tri.withColumn(
        "tid", md5_long(F.concat_ws("_", F.col("a"), F.col("b"), F.col("c")))
    ).localCheckpoint(eager=True)

    def _ek(u, v):
        return md5_long(F.concat_ws("_", F.col(u), F.col(v)))

    inc = (
        tri.select(_ek("a", "b").alias("ekey"), "tid")
        .unionByName(tri.select(_ek("a", "c").alias("ekey"), "tid"))
        .unionByName(tri.select(_ek("b", "c").alias("ekey"), "tid"))
    )
    anchor = inc.groupBy("ekey").agg(F.min("tid").alias("mintid"))
    star = (
        inc.join(anchor, "ekey")
        .filter(F.col("tid") != F.col("mintid"))
        .select(F.col("mintid").alias("src"), F.col("tid").alias("dst"))
        .distinct()
    )
    from .components import connected_components

    comp = connected_components(
        spark, star, vertices=tri.select(F.col("tid").alias("id"))
    ).select(F.col("id").alias("tid"), F.col("component").alias("community"))

    members = (
        tri.select(F.col("a").alias("id"), "tid")
        .unionByName(tri.select(F.col("b").alias("id"), "tid"))
        .unionByName(tri.select(F.col("c").alias("id"), "tid"))
    )
    out = members.join(comp, "tid").select("id", "community").distinct()
    return out


def clique_percolation_sql(edges_table: str = "edges") -> str:
    """DuckDB twin over a symmetrized `edges` CTE: value-ordered triangle
    materialization (the four_clique_count_sql `tri` shape — the set of
    triangles is orientation-independent), identical tid/ekey hashing,
    star wiring, recursive min-reach closure over the (symmetrized)
    star graph."""
    from ..textops.portable import md5_long_sql

    tid = md5_long_sql("concat(a, '_', b, '_', c)")
    ek_ab = md5_long_sql("concat(a, '_', b)")
    ek_ac = md5_long_sql("concat(a, '_', c)")
    ek_bc = md5_long_sql("concat(b, '_', c)")
    et = edges_table
    return f"""cpc_und AS MATERIALIZED (
    SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
    FROM {et} WHERE src <> dst
),
cpc_tri AS MATERIALIZED (
    SELECT e1.u AS a, e1.v AS b, e2.v AS c, {tid} AS tid
    FROM cpc_und e1
    JOIN cpc_und e2 ON e2.u = e1.u AND e2.v > e1.v
    JOIN cpc_und bc ON bc.u = e1.v AND bc.v = e2.v
),
cpc_inc AS MATERIALIZED (
    SELECT {ek_ab} AS ekey, tid FROM cpc_tri
    UNION ALL SELECT {ek_ac}, tid FROM cpc_tri
    UNION ALL SELECT {ek_bc}, tid FROM cpc_tri
),
cpc_anchor AS (SELECT ekey, MIN(tid) AS mintid FROM cpc_inc GROUP BY ekey),
cpc_star AS MATERIALIZED (
    SELECT DISTINCT a.mintid AS src, i.tid AS dst
    FROM cpc_inc i JOIN cpc_anchor a ON a.ekey = i.ekey
    WHERE i.tid <> a.mintid
),
cpc_sym AS (
    SELECT src, dst FROM cpc_star
    UNION ALL SELECT dst, src FROM cpc_star
),
cpc_reach AS (
    SELECT tid AS u, tid AS v FROM cpc_tri
    UNION
    SELECT r.u, e.dst FROM cpc_reach r JOIN cpc_sym e ON r.v = e.src
),
cpc_comp AS (SELECT u AS tid, MIN(v) AS community FROM cpc_reach GROUP BY u),
cpc_members AS (
    SELECT a AS id, tid FROM cpc_tri
    UNION ALL SELECT b, tid FROM cpc_tri
    UNION ALL SELECT c, tid FROM cpc_tri
)
SELECT DISTINCT m.id, c.community
FROM cpc_members m JOIN cpc_comp c ON c.tid = m.tid"""
