"""Round-3 session-2 operators: tool chains, agent loops, SBM block
matrix, eigenvector centrality, n-gram coverage.

Hand-checkable micro-fixtures; the sf0.01 DuckDB oracle parity for each
op lives in __spark_entry__ (driver gates of the same names).
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F


def _transcript_df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )


T0 = dt.datetime(2026, 1, 1)


def test_tool_chains_skips_non_tool_turns(spark):
    from sbm_communitydetection_spark.operators.extract import tool_chains

    rows = [
        # c1: search, (no tool), fetch, search  -> chains search>fetch, fetch>search
        ("c1", 0, "a", "x", "search", T0),
        ("c1", 1, "b", "x", None, T0),
        ("c1", 2, "a", "x", "fetch", T0),
        ("c1", 3, "a", "x", "search", T0),
        # c2: search, fetch -> search>fetch again (support 2)
        ("c2", 0, "a", "x", "search", T0),
        ("c2", 1, "a", "x", "fetch", T0),
    ]
    got = {
        r.chain: (r.n_convs, r.n_occurrences)
        for r in tool_chains(_transcript_df(spark, rows), n=2, min_count=1).collect()
    }
    assert got == {"search>fetch": (2, 2), "fetch>search": (1, 1)}
    # min_count prunes the singleton chain
    pruned = {
        r.chain
        for r in tool_chains(_transcript_df(spark, rows), n=2, min_count=2).collect()
    }
    assert pruned == {"search>fetch"}


def test_tool_chains_trigrams(spark):
    from sbm_communitydetection_spark.operators.extract import tool_chains

    rows = [("c1", i, "a", "x", t, T0) for i, t in enumerate(["s", "f", "s", "f"])]
    got = {
        r.chain: r.n_occurrences
        for r in tool_chains(_transcript_df(spark, rows), n=3, min_count=1).collect()
    }
    assert got == {"s>f>s": 1, "f>s>f": 1}


def test_agent_loops_gaps_and_islands(spark):
    from sbm_communitydetection_spark.operators.extract import agent_loops

    rows = [
        # c1 tools: f f f s f f  -> max_run(f)=3 (the later ff is a NEW run)
        ("c1", 0, "a", "x", "f", T0),
        ("c1", 1, "a", "x", "f", T0),
        ("c1", 2, "a", "x", "f", T0),
        ("c1", 3, "a", "x", "s", T0),
        ("c1", 4, "a", "x", "f", T0),
        ("c1", 5, "a", "x", "f", T0),
        # c2: no repeats
        ("c2", 0, "a", "x", "f", T0),
        ("c2", 1, "a", "x", "s", T0),
    ]
    got = {
        (r.conv_id, r.tool): r.max_run
        for r in agent_loops(_transcript_df(spark, rows), min_repeats=2).collect()
    }
    assert got == {("c1", "f"): 3}
    # threshold 4 filters everything
    assert agent_loops(_transcript_df(spark, rows), min_repeats=4).count() == 0


def test_sbm_block_matrix_planted_recovery(spark):
    """On a planted 2-block graph the diagonal recovers p_in, the
    off-diagonal p_out."""
    from sbm_communitydetection_spark.functions.metrics import sbm_block_matrix
    from sbm_communitydetection_spark.operators.graph_ops import symmetrize

    # block 0 = {0,1,2}, block 1 = {3,4,5}; intra 0: all 3 pairs; intra 1:
    # 1 of 3 pairs; inter: 2 of 9 pairs
    raw = [(0, 1), (0, 2), (1, 2), (3, 4), (0, 3), (2, 5)]
    e = symmetrize(
        spark.createDataFrame([(a, b, 1) for a, b in raw], "src long, dst long, weight long")
    )
    labels = spark.createDataFrame(
        [(i, i // 3) for i in range(6)], "id long, label long"
    )
    got = {
        (r.r_label, r.s_label): (r.block_edges, r.block_pairs, r.p_hat)
        for r in sbm_block_matrix(e, labels).collect()
    }
    assert got[(0, 0)] == (3, 3, 1.0)
    assert got[(1, 1)] == (1, 3, pytest.approx(1 / 3, abs=1e-6))
    assert got[(0, 1)] == (2, 9, pytest.approx(2 / 9, abs=1e-6))


def test_sbm_block_matrix_empty_block_pair_present(spark):
    from sbm_communitydetection_spark.functions.metrics import sbm_block_matrix
    from sbm_communitydetection_spark.operators.graph_ops import symmetrize

    e = symmetrize(
        spark.createDataFrame([(0, 1, 1), (2, 3, 1)], "src long, dst long, weight long")
    )
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "id long, label long"
    )
    got = {
        (r.r_label, r.s_label): (r.block_edges, r.p_hat)
        for r in sbm_block_matrix(e, labels).collect()
    }
    # no inter-block edge, but the (0,1) cell still appears with p_hat 0
    assert got[(0, 1)] == (0, 0.0)


def test_eigenvector_centrality_star(spark):
    """Directed star a->hub (x3): hub absorbs all mass, spokes decay to 0."""
    from sbm_communitydetection_spark.operators.katz import eigenvector_centrality

    e = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0)], "src long, dst long"
    )
    got = {r.id: r.eig for r in eigenvector_centrality(spark, e, iterations=1).collect()}
    # after 1 step: hub 3, spokes 0 -> normalized hub = 4.0 (mean 1 over 4 verts)
    assert got[0] == pytest.approx(4.0, abs=1e-6)
    assert got[1] == got[2] == got[3] == 0.0
    # a DAG's mass goes extinct at step 2: zero vector, no crash
    got3 = {r.id: r.eig for r in eigenvector_centrality(spark, e, iterations=3).collect()}
    assert got3 == {0: 0.0, 1: 0.0, 2: 0.0, 3: 0.0}


def test_eigenvector_centrality_cycle_uniform(spark):
    from sbm_communitydetection_spark.operators.katz import eigenvector_centrality

    e = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    got = {r.id: r.eig for r in eigenvector_centrality(spark, e, iterations=5).collect()}
    assert got == {0: 1.0, 1: 1.0, 2: 1.0}


def test_ngram_coverage_bounds_and_determinism(spark):
    from sbm_communitydetection_spark.textops.analysis import ngram_coverage

    docs = spark.createDataFrame(
        [(i, "w%d common tail of words here now" % (i % 4)) for i in range(40)],
        "doc_id long, text string",
    )
    r1 = ngram_coverage(docs, n=3, val_permille=250).collect()[0]
    r2 = ngram_coverage(docs, n=3, val_permille=250).collect()[0]
    assert r1 == r2  # hash split, no RNG
    assert 0.0 <= r1.coverage <= 1.0
    assert r1.covered <= r1.val_shingles


def test_ngram_coverage_full_overlap(spark):
    from sbm_communitydetection_spark.textops.analysis import ngram_coverage

    # identical text everywhere -> every val shingle is covered
    docs = spark.createDataFrame(
        [(i, "the same five word sentence") for i in range(30)],
        "doc_id long, text string",
    )
    r = ngram_coverage(docs, n=3, val_permille=300).collect()[0]
    assert r.coverage == 1.0


def test_semdedup_flags_near_identical_in_cell(spark):
    """Two well-separated clusters; b is a near-copy of a -> b flagged,
    cluster exemplars and the far-off member kept."""
    from sbm_communitydetection_spark.textops.similarity import semdedup

    rows = [
        # cluster 0 around e1
        (1, [1.0, 0.0, 0.0, 0.0], 0),     # exemplar (closest to centroid)
        (2, [0.999, 0.01, 0.0, 0.0], 0),  # near-copy of 1 -> dup
        (3, [0.7, 0.7, 0.0, 0.0], 0),     # same cell, dissimilar -> kept
        # cluster 1 around e3
        (4, [0.0, 0.0, 1.0, 0.0], 1),
        (5, [0.0, 0.0, 0.999, 0.01], 1),  # near-copy of 4 -> dup
    ]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r.vec_id: (r.cell, r.is_dup, r.nn_cos) for r in semdedup(embs, threshold=0.99, dim=4).collect()}
    # exactly one of the near-copy pair {1,2} survives (the one nearer the
    # centroid ranks first); the dup's nn_cos is their mutual cosine
    assert got[1][1] != got[2][1]
    dup12 = got[1] if got[1][1] else got[2]
    keep12 = got[2] if got[1][1] else got[1]
    assert dup12[2] >= 0.99
    assert keep12[2] < 0.99  # kept: nothing better-ranked is that close
    assert not got[3][1]  # same cell, dissimilar -> kept
    assert got[4][1] != got[5][1]  # one of the second pair flagged too
    assert got[2][0] == got[1][0] and got[5][0] == got[4][0]
    # each cell's rank-1 exemplar reports nn_cos 0.0
    assert sorted(v[2] for v in got.values())[:1] == [0.0]
    # dedup keeps 3 of 5
    assert sum(1 for c, d, _ in got.values() if not d) == 3


def test_semdedup_deterministic_and_threshold_monotone(spark):
    from sbm_communitydetection_spark.textops.similarity import semdedup

    rows = [(i, [float(i % 3 == 0), 1.0, float(i) / 10, 0.5], i % 2) for i in range(12)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    a = sorted(map(tuple, semdedup(embs, threshold=0.9, dim=4).collect()))
    b = sorted(map(tuple, semdedup(embs, threshold=0.9, dim=4).collect()))
    assert a == b
    loose = sum(r.is_dup for r in semdedup(embs, threshold=0.8, dim=4).collect())
    tight = sum(r.is_dup for r in semdedup(embs, threshold=0.999, dim=4).collect())
    assert loose >= tight


def test_butterfly_count_hand_graph(spark):
    """K_{2,2} = exactly one butterfly; adding a pendant edge adds none."""
    from sbm_communitydetection_spark.operators.triangles import butterfly_count

    inc = spark.createDataFrame(
        [("u1", "w1"), ("u1", "w2"), ("u2", "w1"), ("u2", "w2"), ("u3", "w3")],
        "left string, right string",
    )
    r = butterfly_count(inc).collect()[0]
    # common(u1,u2) = 2 -> wedge pairs 2, butterflies C(2,2)=1
    assert (r.n_wedge_pairs, r.n_butterflies) == (2, 1)

    # K_{2,3}: common = 3 -> C(3,2) = 3 butterflies
    k23 = spark.createDataFrame(
        [(u, w) for u in ("a", "b") for w in ("x", "y", "z")], "left string, right string"
    )
    r2 = butterfly_count(k23).collect()[0]
    assert (r2.n_wedge_pairs, r2.n_butterflies) == (3, 3)


def test_butterfly_count_right_hub_guard(spark):
    """A right hub above the cap is excluded; counts shrink accordingly."""
    from sbm_communitydetection_spark.operators.triangles import butterfly_count

    rows = [("u%d" % i, "hub") for i in range(50)] + [
        ("u0", "w1"), ("u1", "w1"), ("u0", "w2"), ("u1", "w2")
    ]
    inc = spark.createDataFrame(rows, "left string, right string")
    full = butterfly_count(inc).collect()[0]
    capped = butterfly_count(inc, max_right_degree=10).collect()[0]
    assert full.n_wedge_pairs == 50 * 49 // 2 + 2
    assert capped.n_wedge_pairs == 2  # hub wedges gone
    assert capped.n_butterflies == 1


def test_stream_pagerank_converges_to_batch(spark):
    """With convergence-tight per-batch iteration counts, the warm-start
    stream vector equals batch PageRank on the final graph (1e-6)."""
    from sbm_communitydetection_spark.operators.graph_ops import symmetrize
    from sbm_communitydetection_spark.operators.pagerank import pagerank
    from sbm_communitydetection_spark.streaming.stream_driver import stream_pagerank

    raw = [(i, (i + 1) % 8) for i in range(8)] + [(0, 4), (2, 6), (1, 5)]
    e = symmetrize(
        spark.createDataFrame([(a, b, 1) for a, b in raw], "src long, dst long, weight long")
    )
    e = e.withColumn("edge_seq", (F.col("src") * 31 + F.col("dst")) % 100)
    streamed = {
        r.id: r.rank
        for r in stream_pagerank(
            spark, e, boundaries=[50, 101], iters_per_batch=60
        ).collect()
    }
    batch = {
        r.id: r.rank
        for r in pagerank(
            spark, e.select("src", "dst", "weight"), tolerance=-1.0, max_iterations=60
        ).collect()
    }
    assert set(streamed) == set(batch)
    for k in batch:
        assert abs(streamed[k] - batch[k]) < 1e-6, (k, streamed[k], batch[k])


def test_stream_pagerank_mass_and_determinism(spark):
    """Each batch renormalizes to total mass 1 (up to the plain-power
    recurrence's dangling leak: none on a symmetrized graph), and the
    fold is deterministic."""
    from sbm_communitydetection_spark.operators.graph_ops import symmetrize
    from sbm_communitydetection_spark.streaming.stream_driver import stream_pagerank

    raw = [(i, (i + 1) % 12) for i in range(12)] + [(0, 6), (3, 9)]
    e = symmetrize(
        spark.createDataFrame([(a, b, 1) for a, b in raw], "src long, dst long, weight long")
    )
    e = e.withColumn("edge_seq", (F.col("src") * 37 + F.col("dst") * 3) % 100)
    a = {r.id: r.rank for r in stream_pagerank(spark, e, boundaries=[80, 101], iters_per_batch=5).collect()}
    b = {r.id: r.rank for r in stream_pagerank(spark, e, boundaries=[80, 101], iters_per_batch=5).collect()}
    assert a == b
    # prefix graphs contain one direction of some undirected edges, so a
    # few vertices can dangle mid-stream; the FINAL batch is symmetrized
    # and iterated from a renormalized vector: mass stays within the
    # plain-power recurrence's few-step dangling leak of 1
    assert abs(sum(a.values()) - 1.0) < 0.2
    assert all(v >= 0 for v in a.values())


def test_greedy_coloring_proper_and_deterministic(spark):
    from sbm_communitydetection_spark.operators.mis import greedy_coloring

    # 5-cycle plus a pendant and a self-loop-only vertex
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (2, 5), (6, 6)]
    edges = spark.createDataFrame(
        [(a, b, 1) for a, b in pairs], "src long, dst long, weight long"
    )
    got = {r.id: r.color for r in greedy_coloring(spark, edges).collect()}
    assert set(got) == set(range(7))  # every vertex colored, incl. self-loop-only
    for a, b in pairs:
        if a != b:
            assert got[a] != got[b], f"monochromatic edge {a}-{b}"
    assert got[6] == 0  # unconstrained vertex takes color 0
    # odd cycle needs 3 colors; greedy mex keeps the palette dense
    assert max(got.values()) >= 2
    again = {r.id: r.color for r in greedy_coloring(spark, edges).collect()}
    assert again == got


def test_greedy_coloring_two_vertex_edge(spark):
    # regression: the loser of the only edge must still get colored after
    # its neighborhood empties (vacuous-winner path)
    from sbm_communitydetection_spark.operators.mis import greedy_coloring

    edges = spark.createDataFrame([(10, 20, 1)], "src long, dst long, weight long")
    got = {r.id: r.color for r in greedy_coloring(spark, edges).collect()}
    assert set(got) == {10, 20} and sorted(got.values()) == [0, 1]


def test_greedy_coloring_raises_on_round_cap(spark):
    from sbm_communitydetection_spark.operators.mis import greedy_coloring

    # a 6-path has decreasing-priority chains; max_rounds=1 cannot finish
    edges = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(6)], "src long, dst long, weight long"
    )
    with pytest.raises(RuntimeError, match="uncolored vertices remain"):
        greedy_coloring(spark, edges, max_rounds=1)


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np

    from sbm_communitydetection_spark.textops.similarity import embedding_covariance

    rng = np.random.default_rng(7)
    x = rng.normal(size=(40, 5)).astype(np.float32)
    embs = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    ).repartition(4)  # partial Grams must fold correctly across partitions
    got = {(r.i, r.j): r.cov for r in embedding_covariance(embs, dim=5).collect()}
    want = np.cov(x.astype(np.float64), rowvar=False, bias=True)
    assert len(got) == 15  # upper triangle of 5x5
    for (i, j), v in got.items():
        assert i <= j
        assert abs(v - want[i, j]) < 1e-9, (i, j, v, want[i, j])


def test_stream_triangles_incremental_exact(spark):
    from sbm_communitydetection_spark.streaming.stream_driver import stream_triangles

    # batch 0 (seq<10): wedge 1-2, 2-3          -> 0 triangles
    # batch 1 (seq<20): closes 1-3; adds 4-5    -> 1 triangle (1 new edge)
    # batch 2 (seq<30): 4-6 and 5-6 arrive together -> closes 4-5-6 (2 new
    #   edges) AND 7-8, 8-9, 7-9 all new        -> 3-new-edge triangle
    rows = [
        (1, 2, 0), (2, 3, 1),
        (1, 3, 10), (4, 5, 11),
        (4, 6, 20), (5, 6, 21), (7, 8, 22), (8, 9, 23), (7, 9, 24),
        (9, 9, 25),  # self-loop ignored
        (3, 1, 12),  # duplicate (reversed) of an earlier edge
    ]
    edges = spark.createDataFrame(rows, "src long, dst long, edge_seq long")
    got = {r.batch_id: r.triangles for r in stream_triangles(spark, edges, [10, 20, 30]).collect()}
    assert got == {0: 0, 1: 1, 2: 3}


def test_embedding_outliers_flags_blowout(spark):
    from sbm_communitydetection_spark.textops.similarity import embedding_outliers

    # 20 tight vectors + one with a blown-out coordinate
    rows = [(i, [0.1 * (i % 3), 1.0, -0.5]) for i in range(20)]
    rows.append((99, [50.0, 1.0, -0.5]))
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: (r.max_z, r.is_outlier) for r in embedding_outliers(embs, dim=3).collect()}
    assert got[99][1] is True
    assert sum(1 for z, o in got.values() if o) == 1  # only the blowout
    # constant dimensions (sigma=0) must not divide by zero
    assert all(z == z for z, _ in got.values())  # no NaN


def test_pca_top_component_dominant_axis(spark):
    import numpy as np

    from sbm_communitydetection_spark.textops.similarity import pca_top_component

    rng = np.random.default_rng(3)
    # variance 25 along axis 1, ~1 elsewhere -> top component ~ e_1
    x = rng.normal(size=(60, 4))
    x[:, 1] *= 5.0
    embs = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    got = {r.i: r.loading for r in pca_top_component(embs, dim=4).collect()}
    assert len(got) == 4
    assert abs(got[1]) > 0.95  # dominant axis carries the loading
    assert abs(sum(v * v for v in got.values()) - 1.0) < 1e-3  # unit norm
    assert got[1] > 0  # sign convention: largest-|loading| entry positive


def test_quality_lr_score_separates_langs(spark):
    from sbm_communitydetection_spark.textops.analysis import quality_lr_fit, quality_lr_score

    rows = [(i, "the quick brown fox " * 5, "en") for i in range(30)]
    rows += [(100 + i, "xx", "zh") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.doc_id: (r.p_en, r.keep) for r in quality_lr_score(docs).collect()}
    assert len(got) == 60
    en_p = [p for d, (p, _) in got.items() if d < 100]
    zh_p = [p for d, (p, _) in got.items() if d >= 100]
    assert min(en_p) > max(zh_p)  # longer English docs score higher
    # keep decision is exactly the rounded-p threshold
    for p, keep in got.values():
        assert keep == (p >= 0.5)
    # weights consumed by scoring are the fit's rounded outputs
    w = quality_lr_fit(docs).collect()[0]
    assert w["logloss"] < 0.7


def test_kmeans_lloyd_recovers_separated_clusters(spark):
    import numpy as np

    from sbm_communitydetection_spark.textops.similarity import kmeans_lloyd

    rng = np.random.default_rng(11)
    # two well-separated blobs in 3d
    a = rng.normal(0, 0.1, size=(25, 3)) + np.array([5.0, 0, 0])
    b = rng.normal(0, 0.1, size=(25, 3)) + np.array([-5.0, 0, 0])
    x = np.vstack([a, b])
    embs = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    cents = kmeans_lloyd(embs, n_cells=2, iters=5).collect()
    assert len(cents) == 6  # 2 cells x 3 dims
    x0 = sorted(r.c for r in cents if r.d == 0)
    assert abs(x0[0] - (-5.0)) < 0.2 and abs(x0[1] - 5.0) < 0.2


def test_walk_cooccurrence_symmetric_and_windowed(spark):
    from sbm_communitydetection_spark.operators.walks import walk_cooccurrence

    # a directed path graph forces the walk 0->1->2->3 (single neighbor each)
    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (2, 3, 1)], "src long, dst long, weight long"
    )
    got = {
        (r.center, r.context): r.n_pairs
        for r in walk_cooccurrence(
            spark, edges, start_mod=1000000, walks_per_vertex=1, length=3, window=2
        ).collect()
        # start_mod huge -> only vertex 0 starts (0 % m == 0)
    }
    # window 2 on walk [0,1,2,3]: pairs (0,1),(0,2),(1,2),(1,3),(2,3) + mirrors
    expect = {(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)}
    assert {(a, b) for a, b in got if a < b} == expect
    for a, b in expect:
        assert got[(a, b)] == got[(b, a)] == 1  # symmetric counts
    assert (0, 3) not in got  # outside the window


def test_msf_hand_graph(spark):
    from sbm_communitydetection_spark.operators.spanning import minimum_spanning_forest

    # two components: square 0-1-2-3 with a heavy diagonal, and edge 10-11
    rows = [
        (0, 1, 1), (1, 2, 2), (2, 3, 1), (3, 0, 5), (0, 2, 9),
        (10, 11, 7),
        (1, 0, 1),  # reverse duplicate collapses
    ]
    edges = spark.createDataFrame(rows, "src long, dst long, weight long")
    got = {(r.a, r.b): r.w for r in minimum_spanning_forest(spark, edges).collect()}
    # MSF: 0-1(1), 2-3(1), 1-2(2) for the square; 10-11(7) for the pair
    assert got == {(0, 1): 1, (2, 3): 1, (1, 2): 2, (10, 11): 7}


def test_msf_tie_break_unique(spark):
    from sbm_communitydetection_spark.operators.spanning import minimum_spanning_forest

    # triangle with ALL-equal weights: the (w,a,b) order keeps (0,1),(0,2)
    edges = spark.createDataFrame(
        [(0, 1, 3), (1, 2, 3), (0, 2, 3)], "src long, dst long, weight long"
    )
    got = sorted((r.a, r.b) for r in minimum_spanning_forest(spark, edges).collect())
    assert got == [(0, 1), (0, 2)]


def test_coverage_select_greedy_order(spark):
    from sbm_communitydetection_spark.textops.dedup import coverage_select_topk

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),      # 4 trigrams: abc bcd cde def
            (2, "a b c d"),          # 2, both inside doc 1's set
            (3, "x y z w"),          # 2 fresh
            (4, "a b c x y z"),      # abc bcx cxy xyz — 3 fresh after doc1
        ],
        "doc_id long, text string",
    )
    got = [(r.rank, r.doc_id, r.gain) for r in coverage_select_topk(docs, k=4).collect()]
    got.sort()
    assert got[0] == (1, 1, 4)          # doc 1 covers most first
    assert got[1][1] == 4 and got[1][2] == 3  # then doc 4's fresh grams
    total_gain = sum(g for _, _, g in got)
    # every distinct trigram is covered exactly once across the greedy picks
    from sbm_communitydetection_spark.textops.dedup import _doc_shingles

    n_distinct = _doc_shingles(docs).select("shingle").distinct().count()
    assert total_gain == n_distinct


def test_edge_embeddedness_hand_graph(spark):
    from sbm_communitydetection_spark.operators.triangles import edge_embeddedness

    # triangle 0-1-2 plus a bridge 2-3
    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (0, 2, 1), (2, 3, 1)], "src long, dst long, weight long"
    )
    got = {(r.a, r.b): (r.common, r.jaccard) for r in edge_embeddedness(edges).collect()}
    # N(0)={1,2} N(1)={0,2} N(2)={0,1,3} N(3)={2}
    assert got[(0, 1)] == (1, 1.0)  # inter {2}, union minus endpoints {2}
    assert got[(0, 2)] == (1, 0.5)
    assert got[(1, 2)] == (1, 0.5)
    assert got[(2, 3)] == (0, 0.0)  # the bridge: zero embeddedness


def test_chunk_windows_tail_and_short_doc(spark):
    from sbm_communitydetection_spark.textops.analysis import chunk_windows

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(30))),  # 30 tokens
            (2, "only three tokens"),                   # shorter than a chunk
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r.doc_id, r.chunk_idx, r.n_tokens)
        for r in chunk_windows(docs, chunk_tokens=24, stride=12).collect()
    )
    # doc 1: ceil((30-24)/12)+1 = 2 chunks: [0,24) full, [12,30) -> 18 tokens
    assert got == [(1, 0, 24), (1, 1, 18), (2, 0, 3)]
    # overlapping region tokens shared: hashes differ per chunk
    hashes = {
        (r.doc_id, r.chunk_idx): r.chunk_hash
        for r in chunk_windows(docs, chunk_tokens=24, stride=12).collect()
    }
    assert hashes[(1, 0)] != hashes[(1, 1)]


def test_span_corruption_deterministic_and_budget(spark):
    from sbm_communitydetection_spark.textops.analysis import span_corruption_spans

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(60))) for i in range(50)],
        "doc_id long, text string",
    )
    a = {(r.doc_id, r.span_idx): (r.start_tok, r.n_tok, r.span_hash)
         for r in span_corruption_spans(docs).collect()}
    b = {(r.doc_id, r.span_idx): (r.start_tok, r.n_tok, r.span_hash)
         for r in span_corruption_spans(docs).collect()}
    assert a == b  # RNG-free: identical across runs
    # ~15% of 20-span docs masked: 50 docs x 20 spans x 0.15 = 150 +- slack
    assert 90 <= len(a) <= 210
    for (doc, g), (start, n_tok, _) in a.items():
        assert start == g * 3 and n_tok == 3  # 60 % 3 == 0: all spans full


def test_triangle_estimate_unbiased_scaling(spark):
    from sbm_communitydetection_spark.operators.triangles import (
        triangle_count,
        triangle_estimate_sampled,
    )
    from pyspark.sql import functions as F

    edges = spark.range(3000).select(
        (F.xxhash64("id") % 120).alias("src"),
        (F.xxhash64("id", F.lit(1)) % 120).alias("dst"),
        F.lit(1).cast("long").alias("weight"),
    ).filter(F.col("src") != F.col("dst"))
    exact = triangle_count(edges).collect()[0].triangles
    r = triangle_estimate_sampled(edges, permille=700).collect()[0]
    # p=0.7 on a dense-ish graph: estimate within a loose factor of exact
    assert r.sampled_triangles > 0
    assert 0.3 * exact < r.estimate < 3.0 * exact
    # determinism: same coin, same estimate
    r2 = triangle_estimate_sampled(edges, permille=700).collect()[0]
    assert (r.sampled_triangles, r.estimate) == (r2.sampled_triangles, r2.estimate)


def test_kmeans_lloyd_kernel_matches_join(spark):
    import numpy as np

    from sbm_communitydetection_spark.textops.similarity import kmeans_lloyd

    rng = np.random.default_rng(23)
    x = rng.normal(size=(80, 6))
    embs = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    a = {(r.cell, r.d): r.c for r in kmeans_lloyd(embs, n_cells=4, iters=3).collect()}
    b = {(r.cell, r.d): r.c for r in kmeans_lloyd(embs, n_cells=4, iters=3, assign="kernel").collect()}
    assert a == b  # the Arrow-kernel assignment replays the join path exactly


def test_community_evolution_events(spark):
    from sbm_communitydetection_spark.functions.metrics import community_evolution

    # old community 1 continues as new 10; old 2 splits between 20/21;
    # old 3's members mostly land in big new 30 (shrink: old covered,
    # new community has grown past it)
    old = spark.createDataFrame(
        [(i, 1) for i in range(4)]
        + [(10 + i, 2) for i in range(5)]
        + [(20 + i, 3) for i in range(2)],
        "id long, label long",
    )
    new = spark.createDataFrame(
        [(i, 10) for i in range(4)]
        + [(10, 20), (11, 20), (12, 21), (13, 21), (14, 22)]
        + [(20, 30), (21, 30), (90, 30), (91, 30), (92, 30)],
        "id long, label long",
    )
    got = {r.old_label: (r.new_label, r.overlap, r.event)
           for r in community_evolution(old, new).collect()}
    assert got[1] == (10, 4, "continue")
    # old 2 splits 2/2/1 -> best overlap 2, tie to the smaller new label,
    # and frac_old 0.4 < 0.5 classifies it as a split
    assert got[2][2] == "split" and got[2][0] == 20
    assert got[3] == (30, 2, "shrink")


def test_source_log_odds_surfaces_distinctive_terms(spark):
    from sbm_communitydetection_spark.textops.analysis import source_log_odds

    # both sources share stopwords; each has a marker word
    rows = [(i, "the of and alpha " * 4, "en", "crawl", 0) for i in range(20)]
    rows += [(100 + i, "the of and bravo " * 4, "en", "books", 0) for i in range(20)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {(r.source, r.rank): (r.token, r.z) for r in source_log_odds(docs, k=2).collect()}
    assert got[("crawl", 1)][0] == "alpha"  # marker beats shared stopwords
    assert got[("books", 1)][0] == "bravo"
    assert got[("crawl", 1)][1] > 0


def test_event_transitions_probabilities(spark):
    import datetime as dtm

    from sbm_communitydetection_spark.operators.funnels import event_transitions

    t0 = dtm.datetime(2026, 1, 1)
    rows = [
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + dtm.timedelta(seconds=1), 1, "click", 0.0, "{}"),
        (3, t0 + dtm.timedelta(seconds=2), 1, "view", 0.0, "{}"),
        (4, t0, 2, "view", 0.0, "{}"),
        (5, t0 + dtm.timedelta(seconds=1), 2, "view", 0.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {(r.prev_type, r.event_type): (r.n, r.prob) for r in event_transitions(events).collect()}
    # view -> click (u1), click -> view (u1), view -> view (u2)
    assert got[("view", "click")] == (1, 0.5)
    assert got[("view", "view")] == (1, 0.5)
    assert got[("click", "view")] == (1, 1.0)


def test_props_field_stats_extracts_json(spark):
    import datetime as dtm

    from sbm_communitydetection_spark.operators.funnels import props_field_stats

    t0 = dtm.datetime(2026, 1, 1)
    rows = [
        (1, t0, 1, "view", 0.0, '{"k": 10}'),
        (2, t0, 1, "view", 0.0, '{"k": 20}'),
        (3, t0, 1, "click", 0.0, '{"other": 1}'),  # missing field -> not counted
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r.event_type: (r.n_with_field, r.avg_field, r.max_field)
           for r in props_field_stats(events).collect()}
    assert got["view"] == (2, 15.0, 20.0)
    assert got["click"][0] == 0


def test_source_health_report_rollup(spark):
    from sbm_communitydetection_spark.textops.pipeline import source_health_report

    rows = [
        (1, "the of and in words here", "en", "crawl", 0),
        (2, "the of and in words here", "en", "crawl", 0),   # exact dup of 1
        (3, "different text entirely okay", "en", "crawl", 0),
        (4, "texto distinto aqui", "es", "books", 0),
        (5, "otro texto distinto", "es", "books", 0),
        (6, "one english doc", "en", "books", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r.source: r for r in source_health_report(docs).collect()}
    assert got["crawl"].n_docs == 3 and got["crawl"].n_exact_dups == 1
    assert abs(got["crawl"].dup_rate - 1 / 3) < 1e-5
    assert got["books"].n_exact_dups == 0
    assert got["books"].top_lang == "es"  # plurality 2 es vs 1 en


def test_partition_quality_counts_cut_and_volume(spark):
    """2-part hand layout: vertices {1,2}→p0, {3}→p1. Edges (sym, w=1):
    1-2 internal to p0; 2-3 cut. p0: internal_w=2 (both directions),
    cut_w=1, volume=1 (vertex 2 → p1). p1: internal 0, cut 1, volume 1."""
    from sbm_communitydetection_spark.operators.partition_audit import (
        partition_quality,
    )

    pairs = [(1, 2), (2, 3)]
    rows = [(s, d, 1) for s, d in pairs] + [(d, s, 1) for s, d in pairs]
    edges = spark.createDataFrame(rows, "src long, dst long, weight long")
    assign = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1)], "id long, part long"
    )
    got = {
        r.part: (r.n_vertices, r.internal_w, r.cut_w, r.comm_volume)
        for r in partition_quality(edges, assign).collect()
    }
    assert got == {0: (2, 2, 1, 1), 1: (1, 0, 1, 1)}


def test_hash_partition_assignment_is_deterministic_and_total(spark):
    from sbm_communitydetection_spark.operators.partition_audit import (
        hash_partition_assignment,
    )

    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1)], "src long, dst long, weight long"
    )
    a1 = {r.id: r.part for r in hash_partition_assignment(edges, 4).collect()}
    a2 = {r.id: r.part for r in hash_partition_assignment(edges, 4).collect()}
    assert a1 == a2
    assert set(a1) == {1, 2, 3}
    assert all(0 <= p < 4 for p in a1.values())


def test_event_anomalies_flags_only_the_burst(spark):
    """User u1 has 5 quiet hours (1 event each) and one 10-event burst →
    only the burst window flags. User u2 is steady → nothing flags.
    User u3 has too few windows → excluded by min_windows."""
    from sbm_communitydetection_spark.operators.funnels import (
        HOUR_MS,
        event_anomalies,
    )

    rows = []
    eid = 0
    for h in range(5):  # u1 quiet baseline
        rows.append((eid, 1, "view", dt.datetime(2026, 1, 1, h), 0.0, "x")); eid += 1
    for i in range(10):  # u1 burst in hour 6
        rows.append((eid, 1, "view", dt.datetime(2026, 1, 1, 6, i), 0.0, "x")); eid += 1
    for h in range(6):  # u2 steady
        rows.append((eid, 2, "view", dt.datetime(2026, 1, 1, h), 0.0, "x")); eid += 1
    rows.append((eid, 3, "view", dt.datetime(2026, 1, 1, 0), 0.0, "x"))  # u3 sparse
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp, value double, props string",
    )
    got = [
        (r.user_id, r.window_start, r.cnt)
        for r in event_anomalies(ev, z=2, min_windows=5).collect()
    ]
    assert len(got) == 1
    u, w, c = got[0]
    assert u == 1 and c == 10
    assert w == int(dt.datetime(2026, 1, 1, 6).timestamp() * 1000) // HOUR_MS * HOUR_MS


# ---------------------------------------------------------------- fastrp


def test_fastrp_exact_hand_graph(spark):
    """Path graph 0—1—2 (unit weights): E_1(v) = Σ_nbr R(nbr), E_2(v) =
    Σ_nbr E_1(nbr) — replicate the coins by hand and check every cell,
    plus unit L2 norms on nonzero rows."""
    import hashlib

    from sbm_communitydetection_spark.operators.fastrp import fastrp_embeddings

    def coin(v, d):
        h = int(hashlib.md5(f"frp:{v}:{d}".encode()).hexdigest()[:15], 16) % 4
        return 1 if h == 0 else (-1 if h == 1 else 0)

    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 0, 1), (1, 2, 1), (2, 1, 1)],
        "src long, dst long, weight long",
    )
    dims, nbrs = 4, {0: [1], 1: [0, 2], 2: [1]}
    e1 = {(v, d): sum(coin(u, d) for u in nbrs[v]) for v in nbrs for d in range(dims)}
    e2 = {(v, d): sum(e1[(u, d)] for u in nbrs[v]) for v in nbrs for d in range(dims)}
    rows = fastrp_embeddings(edges, dims=dims, iters=2).collect()
    assert len(rows) == 3 * dims
    for r in rows:
        assert r.val == e2[(r.id, r.dim)], (r.id, r.dim)
    for v in nbrs:
        n2 = sum(e2[(v, d)] ** 2 for d in range(dims))
        got = sum(r.nval ** 2 for r in rows if r.id == v)
        assert got == pytest.approx(1.0 if n2 else 0.0, abs=1e-4)


def test_fastrp_scaled_parallel_on_regular_graph(spark):
    """On a regular graph D^{-1} is a scalar, so the scaled (random-walk)
    iterate must be exactly parallel to the exact integer iterate:
    normalized loadings agree to rounding."""
    from sbm_communitydetection_spark.operators.fastrp import fastrp_embeddings

    n = 8  # cycle: every vertex has degree 2
    es = [(i, (i + 1) % n, 1) for i in range(n)] + [
        ((i + 1) % n, i, 1) for i in range(n)
    ]
    edges = spark.createDataFrame(es, "src long, dst long, weight long")
    ex = {
        (r.id, r.dim): r.nval
        for r in fastrp_embeddings(edges, dims=6, iters=2).collect()
    }
    sc = {
        (r.id, r.dim): r.nval
        for r in fastrp_embeddings(edges, dims=6, iters=2, scaled=True).collect()
    }
    assert ex.keys() == sc.keys()
    for k in ex:
        assert sc[k] == pytest.approx(ex[k], abs=2e-6), k


def test_conv_prefix_dups_depth_and_groups(spark):
    """c1/c2/c3 share a 2-turn opening (c3 diverges at turn 2, c1/c2 at
    turn 2 vs 3 lengths differ); c4 is unique and silent; NULL text ==
    empty text never conflates distinct roles."""
    from sbm_communitydetection_spark.operators.extract import conv_prefix_dups

    rows = [
        ("c1", 0, "user", "hi", None, T0),
        ("c1", 1, "bot", "hello!", None, T0),
        ("c1", 2, "user", "q1", None, T0),
        ("c2", 0, "user", "hi", None, T0),
        ("c2", 1, "bot", "hello!", None, T0),
        ("c2", 2, "user", "q2", None, T0),
        ("c3", 0, "user", "hi", None, T0),
        ("c3", 1, "bot", "different", None, T0),
        ("c4", 0, "user", "unrelated", None, T0),
        # role/text boundary: role="user", text=None vs role="user", text=""
        ("c5", 0, "userx", None, None, T0),
        ("c6", 0, "user", "x", None, T0),
    ]
    t = _transcript_df(spark, rows)
    got = {r.conv_id: (r.shared_turns, r.n_convs) for r in conv_prefix_dups(t).collect()}
    assert got == {
        "c1": (2, 2),  # deepest shared depth: turns 0-1 with c2
        "c2": (2, 2),
        "c3": (1, 3),  # shares only turn 0 — with both c1 and c2
    }


# ---------------------------------------------------------------- trussness


def test_trussness_fixpoint_k5_triangle_bridge(spark):
    """K5 edges are 5-truss, a pendant triangle's edges are 3-truss, a
    bridge edge is 2-truss; the h-index fixpoint must find all three
    levels in one run (rounds=None)."""
    from itertools import combinations

    from sbm_communitydetection_spark.operators.kcore import trussness

    und = list(combinations(range(5), 2)) + [(4, 5), (4, 6), (5, 6), (6, 7)]
    edges = spark.createDataFrame(
        [(a, b, 1) for a, b in und] + [(b, a, 1) for a, b in und],
        "src long, dst long, weight long",
    )
    got = {(r.a, r.b): r.trussness for r in trussness(edges).collect()}
    for a, b in combinations(range(5), 2):
        assert got[(a, b)] == 5, (a, b)
    for pair in [(4, 5), (4, 6), (5, 6)]:
        assert got[pair] == 3, pair
    assert got[(6, 7)] == 2
    assert len(got) == len(und)


def test_influence_seeds_star_discount(spark):
    """Star + far clique: the star hub wins round 1; after the hub is
    seeded, its leaves are discounted so round 2 picks the clique
    vertex despite lower raw degree than... the leaves (deg 1) — pin
    instead that the hub's leaves never beat untouched clique members."""
    from itertools import combinations

    from sbm_communitydetection_spark.operators.graph_ops import influence_seeds

    und = [(0, i) for i in range(1, 8)]  # hub 0, leaves deg 1 (7 leaves)
    und += list(combinations(range(100, 105), 2))  # K5, deg 4 each
    edges = spark.createDataFrame(
        [(a, b, 1) for a, b in und] + [(b, a, 1) for a, b in und],
        "src long, dst long, weight long",
    )
    got = [(r.seed_rank, r.id) for r in influence_seeds(edges, k=3).orderBy("seed_rank").collect()]
    assert got[0] == (0, 0)  # hub: deg 7
    # rounds 2-3: K5 members (deg 4, undiscounted) beat all leaves
    assert got[1][1] == 100 and got[2][1] == 101


def test_threshold_cascade_chain_rounds_and_fixpoint(spark):
    """Line 0-1-2-3 with seed 0 and θ=50%: vertex 1 (neighbors {0,2},
    1/2 active) fires round 1, vertex 2 round 2, vertex 3 (neighbor {2},
    1/1) round 3 — one hop per round; fixpoint mode stops by itself.
    θ=60% > 1/2 freezes the cascade at the seed."""
    from sbm_communitydetection_spark.operators.graph_ops import threshold_cascade

    und = [(0, 1), (1, 2), (2, 3)]
    edges = spark.createDataFrame(
        [(a, b, 1) for a, b in und] + [(b, a, 1) for a, b in und],
        "src long, dst long, weight long",
    )
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {
        r.id: r.round_activated
        for r in threshold_cascade(edges, seeds, theta_permille=500).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
    frozen = threshold_cascade(edges, seeds, theta_permille=600).collect()
    assert {(r.id, r.round_activated) for r in frozen} == {(0, 0)}


def test_containment_asymmetric_quote(spark):
    """A short doc quoted whole inside a long one: containment of the
    short side ≈ 1, the reverse direction well below, and symmetric
    Jaccard would miss it at the same threshold."""
    from sbm_communitydetection_spark.textops.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    long_ = short + " " + " ".join(f"filler{i} pad{i} extra{i}" for i in range(20))
    d = spark.createDataFrame(
        [(100, short), (200, long_)], "doc_id long, text string"
    )
    cont = {(r.a, r.b): r.containment for r in containment_pairs(d, threshold=0.5).collect()}
    assert cont.get((100, 200), 0) >= 0.99  # short contained in long
    assert (200, 100) not in cont  # reverse direction dilutes away
    jac = ngram_jaccard_pairs(d, threshold=0.5).collect()
    assert not jac  # symmetric Jaccard misses the quote at 0.5


def test_events_transcripts_before_ms_snapshot(spark):
    """before_ms recomputes turn order over the surviving events only:
    the snapshot's turn_idx is dense from 0 even when later events are
    interleaved per user in the full table."""
    import pandas as pd

    from sbm_communitydetection_spark.sources.events_transcripts import (
        events_transcripts,
    )

    tmp = "/tmp/evt_snap_test"
    os.makedirs(tmp, exist_ok=True)
    pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": pd.to_datetime(
                ["2026-01-01 00:00:00", "2026-01-01 00:02:00",
                 "2026-01-01 00:01:00", "2026-01-01 00:03:00"]
            ),
            "user_id": [7, 7, 7, 7],
            "event_type": ["a", "b", "c", "d"],
            "value": [0.0] * 4,
            "props": ["p1", "p2", "p3", "p4"],
        }
    ).astype({"ts": "datetime64[ms]"}).to_parquet(f"{tmp}/events.parquet")
    full = events_transcripts(spark, tmp).orderBy("turn_idx").collect()
    assert [r.role for r in full] == ["a", "c", "b", "d"]  # ts order
    pivot = int(pd.Timestamp("2026-01-01 00:01:30").timestamp() * 1000)
    early = events_transcripts(spark, tmp, before_ms=pivot).orderBy("turn_idx").collect()
    assert [(r.turn_idx, r.role) for r in early] == [(0, "a"), (1, "c")]


def test_linkpred_precision_recovers_planted_holdout(spark):
    """Two K4 cliques with one edge hidden from the train split: the
    hidden intra-clique edge has two common neighbors in train (max AA),
    so precision@1-equivalent (k=(1,)) is 1.0 and the pair tops the
    ranking; a cross-clique pair never outranks it."""
    from itertools import combinations

    from sbm_communitydetection_spark.operators.linkpred import (
        linkpred_precision_at_k,
    )

    full_und = list(combinations(range(4), 2)) + list(combinations(range(10, 14), 2))
    hidden = (0, 1)
    train_und = [e for e in full_und if e != hidden]

    def df(pairs):
        return spark.createDataFrame(
            [(a, b, 1) for a, b in pairs] + [(b, a, 1) for a, b in pairs],
            "src long, dst long, weight long",
        )

    got = {
        r.k: (r.hits, r.precision)
        for r in linkpred_precision_at_k(df(train_und), df(full_und), ks=(1, 3)).collect()
    }
    assert got[1] == (1, 1.0)  # the hidden edge is the top prediction
    assert got[3][0] == 1  # and the only true edge in the top 3
