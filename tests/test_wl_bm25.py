"""Round-3 session-4 operators: WL color refinement, BM25 retrieval.

Hand-checkable micro-fixtures; the sf0.01 DuckDB oracle parity lives in
__spark_entry__ (driver gates of the same names).
"""

from __future__ import annotations

import math


def _edges(spark, pairs):
    """Symmetrized unit-weight edge table from an undirected pair list."""
    rows = [(s, d, 1) for s, d in pairs] + [(d, s, 1) for s, d in pairs]
    return spark.createDataFrame(rows, "src long, dst long, weight long")


def test_wl_path_partitions_by_structural_role(spark):
    """P4 (0-1-2-3): endpoints {0,3} and interior {1,2} are structurally
    equivalent pairs — WL must give each pair one shared color and the
    two pairs different colors."""
    from sbm_communitydetection_spark.operators.wl import wl_refinement

    colors = {
        r.id: r.color
        for r in wl_refinement(spark, _edges(spark, [(0, 1), (1, 2), (2, 3)])).collect()
    }
    assert colors[0] == colors[3]
    assert colors[1] == colors[2]
    assert colors[0] != colors[1]


def test_wl_isomorphic_graphs_share_histogram(spark):
    """Two vertex-relabeled copies of the same graph must produce the
    identical color histogram (the WL isomorphism screen)."""
    from sbm_communitydetection_spark.operators.wl import (
        wl_color_histogram,
        wl_refinement,
    )

    pairs = [(0, 1), (1, 2), (2, 0), (2, 3)]  # triangle + pendant
    relabeled = [(s + 100, d + 100) for s, d in pairs]
    h1 = {
        r.color: r.n
        for r in wl_color_histogram(
            wl_refinement(spark, _edges(spark, pairs))
        ).collect()
    }
    h2 = {
        r.color: r.n
        for r in wl_color_histogram(
            wl_refinement(spark, _edges(spark, relabeled))
        ).collect()
    }
    assert h1 == h2
    assert sum(h1.values()) == 4


def test_wl_distinguishes_star_from_path(spark):
    """K1,3 and P4 both have 4 vertices / 3 edges — after one round the
    color multisets must already differ (the star center sees 3 equal
    neighbor colors; no P4 vertex does)."""
    from sbm_communitydetection_spark.operators.wl import (
        wl_color_histogram,
        wl_refinement,
    )

    star = _edges(spark, [(0, 1), (0, 2), (0, 3)])
    path = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    hs = {
        r.color: r.n
        for r in wl_color_histogram(wl_refinement(spark, star, rounds=1)).collect()
    }
    hp = {
        r.color: r.n
        for r in wl_color_histogram(wl_refinement(spark, path, rounds=1)).collect()
    }
    assert hs != hp


def test_bm25_scores_match_hand_formula(spark):
    """3-doc corpus, 1 single-term query: the returned score must equal
    the Okapi/Lucene formula computed by hand."""
    from sbm_communitydetection_spark.textops.bm25 import BM25_B, BM25_K1, bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),  # tf(apple)=2, dl=3
            (2, "apple cherry"),  # tf(apple)=1, dl=2
            (3, "cherry cherry cherry"),  # no apple
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([(10, "apple")], "query_id long, text string")
    got = {
        (r.query_id, r.doc_id): r.score for r in bm25_topk(docs, qs, k=10).collect()
    }
    n, df, avgdl = 3.0, 2, (3 + 2 + 3) / 3.0
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))

    def s(tf, dl):
        return round(
            idf * tf * (BM25_K1 + 1) / (tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl)),
            6,
        )

    assert set(got) == {(10, 1), (10, 2)}  # doc 3 shares no term -> absent
    assert got[(10, 1)] == s(2, 3)
    assert got[(10, 2)] == s(1, 2)
    assert got[(10, 1)] > got[(10, 2)]  # higher tf wins at comparable dl


def test_bm25_topk_cut_and_doc_id_tiebreak(spark):
    """k=1 with two identically-scored docs keeps the lower doc_id."""
    from sbm_communitydetection_spark.textops.bm25 import bm25_topk

    docs = spark.createDataFrame(
        [(7, "x y"), (5, "x y"), (9, "z z")], "doc_id long, text string"
    )
    qs = spark.createDataFrame([(1, "x")], "query_id long, text string")
    rows = bm25_topk(docs, qs, k=1).collect()
    assert len(rows) == 1
    assert rows[0].doc_id == 5


def _coreness_peel_oracle(pairs):
    """Sequential min-degree peel — the textbook core-number algorithm."""
    adj: dict = {}
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    deg = {v: len(ns) for v, ns in adj.items()}
    core: dict = {}
    k = 0
    while deg:
        v = min(deg, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        for u in adj[v]:
            if u in deg:
                deg[u] -= 1
        del deg[v]
    return core


def test_coreness_clique_plus_chain(spark):
    """K4 on {0..3} with a chain 3-10-11: clique vertices have core 3,
    chain vertices core 1."""
    from sbm_communitydetection_spark.operators.kcore import coreness

    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 10), (10, 11)]
    got = {r.id: r.coreness for r in coreness(spark, _edges(spark, pairs)).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 10: 1, 11: 1}


def test_coreness_fixpoint_matches_sequential_peel(spark):
    """h-index fixpoint == sequential min-degree peel on a deterministic
    pseudo-random graph (60 vertices, hash-derived edges)."""
    from sbm_communitydetection_spark.operators.kcore import coreness

    pairs = sorted(
        {
            (min(a, b), max(a, b))
            for i in range(400)
            for a, b in [((i * i * 31 + 7) % 60, (i * 17 + i * i * 5 + 3) % 60)]
            if a != b
        }
    )
    got = {r.id: r.coreness for r in coreness(spark, _edges(spark, pairs)).collect()}
    assert got == _coreness_peel_oracle(pairs)


def test_coreness_fixed_rounds_converges_on_micro_graph(spark):
    """rounds=4 (the gate setting) already equals the fixpoint on the
    clique+chain fixture — evidence the unrolled oracle compares the
    converged decomposition, not a transient."""
    from sbm_communitydetection_spark.operators.kcore import coreness

    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 10), (10, 11)]
    fixed = {
        r.id: r.coreness
        for r in coreness(spark, _edges(spark, pairs), rounds=4).collect()
    }
    free = {r.id: r.coreness for r in coreness(spark, _edges(spark, pairs)).collect()}
    assert fixed == free


def test_textrank_hub_word_ranks_first(spark):
    """A word co-occurring with every other word (hub) must out-rank the
    leaf words, and the output honors k."""
    from sbm_communitydetection_spark.textops.textrank import textrank_keywords

    docs = spark.createDataFrame(
        [
            (1, "core alpha core beta core gamma"),
            (2, "core alpha core beta"),
            (3, "core gamma core alpha"),
        ],
        "doc_id long, text string",
    )
    out = textrank_keywords(
        spark, docs, k=3, n_iterations=5, min_pair_count=1
    ).collect()
    assert len(out) == 3
    assert out[0].word == "core"
    ranks = [r.rank for r in out]
    assert ranks == sorted(ranks, reverse=True)


def test_textrank_cooccurrence_edges_symmetrize_and_prune(spark):
    """Pair weight counts unordered co-occurrences; min_pair_count prunes;
    both directions are emitted."""
    from sbm_communitydetection_spark.textops.textrank import (
        word_cooccurrence_edges,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "b a")],
        "doc_id long, text string",
    )
    # adjacent pairs: (a,b)x2 + (b,a)x1 + (b,c)x1 from doc1, (b,a)x1 from doc2
    # → canonical {a,b}=4, {b,c}=1
    rows = {(r.src, r.dst): r.weight for r in word_cooccurrence_edges(docs, 2).collect()}
    assert rows == {("a", "b"): 4.0, ("b", "a"): 4.0}
