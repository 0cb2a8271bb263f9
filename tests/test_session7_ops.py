"""Semantic unit tests for the session-7 operator wave: ANF/HyperBall,
temporal reachability, Gopher rule flags, product quantization, PPR
sweep cut, spectral bisection.  (Engine-vs-DuckDB parity is gated by
the __spark_entry__ oracle entries; these tests pin the MEANING on
hand fixtures where the right answer is known by construction.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sbm_communitydetection_spark.operators import anf as ANF
from sbm_communitydetection_spark.operators import temporal as TEMP
from sbm_communitydetection_spark.operators.graph_ops import symmetrize
from sbm_communitydetection_spark.operators.pagerank import ppr_sweep_cut
from sbm_communitydetection_spark.operators.spectral import spectral_bisection
from sbm_communitydetection_spark.textops import analysis as TA
from sbm_communitydetection_spark.textops import similarity as TS


def _sym_edges(spark, pairs):
    return symmetrize(
        spark.createDataFrame(
            [(a, b, 1) for a, b in pairs], "src long, dst long, weight long"
        )
    )


def _path_graph(spark, n):
    return _sym_edges(spark, [(i, i + 1) for i in range(n - 1)])


# --- ANF / HyperBall -------------------------------------------------------


def test_anf_profile_monotone_and_saturating(spark):
    e = _path_graph(spark, 8)
    prof = {r["t"]: (r["sum_b"], r["est_reach"]) for r in ANF.anf_profile(spark, e, rounds=7).collect()}
    # masks only gain bits: both readouts are monotone non-decreasing
    for t in range(1, 8):
        assert prof[t][0] >= prof[t - 1][0]
        assert prof[t][1] >= prof[t - 1][1]
    # a path of 8 vertices has diameter 7: by t=7 every sketch has folded
    # every other vertex's register, so one more round changes nothing
    prof8 = {r["t"]: r["sum_b"] for r in ANF.anf_profile(spark, e, rounds=8).collect()}
    assert prof8[8] == prof8[7]


def test_anf_estimate_scales_with_reach(spark):
    # two disconnected 4-cliques: each vertex reaches 4 at t=1; the
    # estimate at t>=1 must exceed the t=0 (singleton) estimate clearly
    cliq = [(i, j) for i in range(4) for j in range(4) if i < j]
    cliq += [(i + 10, j + 10) for i, j in cliq]
    prof = {r["t"]: r["est_reach"] for r in ANF.anf_profile(spark, _sym_edges(spark, cliq), rounds=2).collect()}
    assert prof[1] > prof[0]
    # saturated at t=1 (cliques): t=2 adds nothing
    assert prof[2] == prof[1]


def test_hyperball_monotone_ball_and_positive_harmonic(spark):
    e = _path_graph(spark, 6)
    rows = ANF.hyperball_closeness(spark, e, rounds=3).collect()
    assert len(rows) == 6
    for r in rows:
        assert r["est_ball"] > 0
        assert r["harmonic_est"] >= 0
    # middle vertices reach more within 3 hops than endpoints
    by_id = {r["id"]: r["harmonic_est"] for r in rows}
    assert by_id[2] > by_id[0]
    assert by_id[3] > by_id[5]


def test_effective_diameter_path(spark):
    e = _path_graph(spark, 5)
    row = ANF.effective_diameter(spark, e, rounds=4, q=0.9).collect()[0]
    # 90% coverage of a 5-path needs several hops; must exceed 0 and be <= 4
    assert 1 <= row["eff_diameter"] <= 4


# --- temporal reachability -------------------------------------------------


def test_temporal_reachability_respects_time(spark):
    import datetime as dt

    def ts(ms):
        return dt.datetime(2024, 1, 1) + dt.timedelta(milliseconds=ms)

    rows = [
        # conv1: a -> b at t=1000 (b replies to a)
        ("c1", 0, "a", ts(0)), ("c1", 1, "b", ts(1000)),
        # conv2: b -> c at t=500 — BEFORE b learned (b knows at 1000)
        ("c2", 0, "b", ts(400)), ("c2", 1, "c", ts(500)),
        # conv3: b -> d at t=2000 — after b learned
        ("c3", 0, "b", ts(1900)), ("c3", 1, "d", ts(2000)),
    ]
    tr = spark.createDataFrame(
        [(c, i, r, "x", None, t) for (c, i, r, t) in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    arr = {r["actor"]: r["arrival_ms"] for r in TEMP.temporal_reachability(tr, ["a"], rounds=3).collect()}
    assert arr["a"] == 0
    assert arr["b"] == 1704067201000  # 2024-01-01 + 1000ms
    assert "c" not in arr  # time-respecting: contact happened too early
    assert arr["d"] == 1704067202000


def test_temporal_contacts_direction(spark):
    import datetime as dt

    tr = spark.createDataFrame(
        [("c1", 0, "x", "t", None, dt.datetime(2024, 1, 1)),
         ("c1", 1, "y", "t", None, dt.datetime(2024, 1, 1, 0, 0, 1))],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    c = TEMP.temporal_contacts(tr).collect()
    assert len(c) == 1 and c[0]["src"] == "x" and c[0]["dst"] == "y"


# --- Gopher rule flags -----------------------------------------------------


def test_gopher_rule_flags_semantics(spark):
    good = "the " + " ".join(f"word{i}" for i in range(60)) + " of a"
    short = "too short entirely"
    symbols = "the of " + "# " * 60 + " ".join(f"w{i}" for i in range(50))
    numeric = "the of " + " ".join(str(i) * 3 for i in range(60))
    docs = spark.createDataFrame(
        [(1, good, "en", "s", len(good)),
         (2, short, "en", "s", len(short)),
         (3, symbols, "en", "s", len(symbols)),
         (4, numeric, "en", "s", len(numeric))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["doc_id"]: r for r in TA.gopher_rule_flags(docs).collect()}
    assert out[1]["keep"]
    assert not out[2]["ok_words"] and not out[2]["keep"]
    assert not out[3]["ok_symbols"] and not out[3]["keep"]
    assert not out[4]["ok_alpha"] and not out[4]["keep"]


# --- product quantization --------------------------------------------------


def _blob_embs(spark, n_per=12, dim=16):
    rows = []
    for i in range(n_per):
        rows.append((i, [10.0 + 0.01 * i] * dim, 0))
        rows.append((100 + i, [-10.0 - 0.01 * i] * dim, 1))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_pq_codes_separate_blobs(spark):
    embs = _blob_embs(spark)
    codes, cents = TS.pq_train(embs, m=2, n_codes=2, iters=3, dim=16)
    rows = codes.collect()
    # within a subspace, all vectors of one blob share a code, and the
    # two blobs use different codes
    for sub in (0, 1):
        c0 = {r["code"] for r in rows if r["sub"] == sub and r["vec_id"] < 100}
        c1 = {r["code"] for r in rows if r["sub"] == sub and r["vec_id"] >= 100}
        assert len(c0) == 1 and len(c1) == 1 and c0 != c1


def test_pq_adc_topk_prefers_own_blob(spark):
    embs = _blob_embs(spark)
    # query_mod chosen so queries hit both blobs: vec_id % 4 == 1
    top = TS.pq_adc_topk(
        embs, k=5, m=2, n_codes=2, iters=3, dim=16, query_mod=4, query_rem=1
    ).collect()
    assert top, "no queries selected"
    for r in top:
        same_blob = (r["qid"] < 100) == (r["vec_id"] < 100)
        assert same_blob, f"{r['qid']} ranked cross-blob neighbor {r['vec_id']}"


# --- PPR sweep cut ---------------------------------------------------------


def test_ppr_sweep_cut_recovers_planted_clique(spark):
    # barbell: two 6-cliques joined by a single bridge edge
    k = 6
    left = [(i, j) for i in range(k) for j in range(k) if i < j]
    right = [(i + 10, j + 10) for (i, j) in left]
    e = _sym_edges(spark, left + right + [(0, 10)])
    seeds = spark.createDataFrame([(1,)], "id long")
    cut = ppr_sweep_cut(spark, e, seeds, rounds=8)
    members = {r["id"] for r in cut.collect()}
    assert members == set(range(k)), members


# --- spectral bisection ----------------------------------------------------


def test_spectral_bisection_splits_barbell(spark):
    k = 6
    left = [(i, j) for i in range(k) for j in range(k) if i < j]
    right = [(i + 10, j + 10) for (i, j) in left]
    e = _sym_edges(spark, left + right + [(0, 10)])
    sides = {r["id"]: r["side"] for r in spectral_bisection(spark, e, iters=30).collect()}
    s_left = {sides[i] for i in range(k)}
    s_right = {sides[i + 10] for i in range(k)}
    assert len(s_left) == 1 and len(s_right) == 1 and s_left != s_right


# --- wave 2: co-participation, backbone, DC-SBM, partition audit ----------


def test_actor_coparticipation_counts_and_guard(spark):
    import datetime as dt

    rows = []
    t0 = dt.datetime(2024, 1, 1)
    # conv A: x,y,z; conv B: x,y; conv C (big cast): a0..a4
    for i, r in enumerate(["x", "y", "z"]):
        rows.append(("A", i, r, "t", None, t0))
    for i, r in enumerate(["x", "y"]):
        rows.append(("B", i, r, "t", None, t0))
    for i in range(5):
        rows.append(("C", i, f"a{i}", "t", None, t0))
    tr = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    from sbm_communitydetection_spark.operators.extract import actor_coparticipation

    out = {(r["actor_a"], r["actor_b"]): r["n_convs"]
           for r in actor_coparticipation(tr).collect()}
    assert out[("x", "y")] == 2
    assert out[("x", "z")] == 1 and out[("y", "z")] == 1
    assert ("a0", "a1") in out
    # hub guard: cap below conv C's cast removes all its pairs
    capped = {(r["actor_a"], r["actor_b"])
              for r in actor_coparticipation(tr, max_conv_actors=4).collect()}
    assert ("a0", "a1") not in capped and ("x", "y") in capped


def test_disparity_filter_keeps_dominant_spoke(spark):
    from sbm_communitydetection_spark.operators.backbone import disparity_filter

    # hub 0 with one dominant edge (weight 60) and many weight-1 spokes
    pairs = [(0, 1, 60)] + [(0, i, 1) for i in range(2, 22)]
    e = symmetrize(
        spark.createDataFrame(pairs, "src long, dst long, weight long")
    )
    out = {(r["src"], r["dst"]): r["p_min"] for r in disparity_filter(e, alpha=0.05).collect()}
    assert (0, 1) in out          # dominant edge survives
    assert out[(0, 1)] < 0.05
    # weight-1 spokes survive only via the pendant convention
    # (their leaf endpoint has k=1); with pendants off they vanish
    out_np = {(r["src"], r["dst"]) for r in disparity_filter(e, alpha=0.05, keep_pendants=False).collect()}
    assert out_np == {(0, 1)}


def test_dcsbm_loglik_prefers_planted_partition(spark):
    from sbm_communitydetection_spark.functions.metrics import dcsbm_loglik_df

    # two 8-cliques + 2 bridges: planted labels beat a scrambled labeling
    k = 8
    left = [(i, j) for i in range(k) for j in range(k) if i < j]
    right = [(i + 10, j + 10) for (i, j) in left]
    e = _sym_edges(spark, left + right + [(0, 10), (1, 11)])
    verts = e.select(F.col("src").alias("id")).distinct()
    planted = verts.select("id", F.when(F.col("id") < 10, 0).otherwise(1).alias("label"))
    scrambled = verts.select("id", (F.col("id") % 2).alias("label"))
    ll_p = dcsbm_loglik_df(e, planted).collect()[0]["ll"]
    ll_s = dcsbm_loglik_df(e, scrambled).collect()[0]["ll"]
    assert ll_p > ll_s


# --- wave 3: clique percolation, multi-seed RWR ---------------------------


def test_clique_percolation_overlap(spark):
    from sbm_communitydetection_spark.operators.triangles import (
        clique_percolation_communities,
    )

    # two triangle-chains sharing the single vertex 2: vertex 2 must be
    # a member of BOTH communities (overlap a partition cannot express);
    # the chains themselves are edge-connected internally.
    left = [(0, 1), (1, 2), (0, 2), (0, 3), (1, 3)]       # triangles 012, 013... share edge 01
    right = [(2, 4), (4, 5), (2, 5), (4, 6), (5, 6)]      # triangles 245, 456 share edge 45
    e = _sym_edges(spark, left + right)
    rows = clique_percolation_communities(spark, e).collect()
    comm_of = {}
    for r in rows:
        comm_of.setdefault(r["id"], set()).add(r["community"])
    # vertex 2 sits in two distinct communities
    assert len(comm_of[2]) == 2
    # chain members agree within each side
    assert comm_of[0] == comm_of[1] == comm_of[3]
    assert comm_of[4] == comm_of[5] == comm_of[6]
    assert comm_of[0] != comm_of[4]
    # bridge-only vertices (no triangle) never appear
    e2 = _sym_edges(spark, left + [(3, 99)])
    ids = {r["id"] for r in clique_percolation_communities(spark, e2).collect()}
    assert 99 not in ids


def test_rwr_multi_seed_locality_and_self_rank(spark):
    from sbm_communitydetection_spark.operators.pagerank import rwr_multi_seed

    # two far-apart stars; seed 0 (mod 100) must rank its OWN star's
    # vertices, never the other star's
    star_a = [(0, i) for i in range(1, 6)]
    star_b = [(100, i + 200) for i in range(1, 6)]
    e = _sym_edges(spark, star_a + star_b + [(5, 300), (300, 301), (301, 205)])
    top = rwr_multi_seed(spark, e, seed_mod=100, seed_rem=0, rounds=3, k=4).collect()
    by_seed = {}
    for r in top:
        by_seed.setdefault(r["seed"], []).append(r)
    assert set(by_seed) == {0, 100, 300}
    for r in by_seed[0]:
        assert r["id"] not in {200, 201, 202, 203, 204, 205}
    # the seed always appears in its own top-k (restart mass keeps it
    # ranked), and a hub seed tops its own list
    for s, rows in by_seed.items():
        assert any(r["id"] == s for r in rows), (s, rows)
    hub_best = min(by_seed[0], key=lambda r: r["rnk"])
    assert hub_best["id"] == 0 and hub_best["rnk"] == 1


# --- wave 4: knn curve, robustness, landmark distance oracle --------------


def test_degree_knn_curve_star(spark):
    from sbm_communitydetection_spark.operators.graph_ops import degree_knn_curve

    e = _sym_edges(spark, [(0, i) for i in range(1, 8)])
    out = {r["k"]: (r["n_vertices"], r["knn_k"]) for r in degree_knn_curve(e).collect()}
    assert out[1] == (7, 7.0)   # leaves see only the hub (deg 7)
    assert out[7] == (1, 1.0)   # hub sees only leaves (deg 1)


def test_robustness_profile_hub_shatter(spark):
    from sbm_communitydetection_spark.operators.components import robustness_profile

    # star (hub 0, 10 leaves) + disjoint 5-clique: removing 1 hub
    # shatters the star into 10 singletons; the clique becomes the giant
    star = [(0, i) for i in range(1, 11)]
    cliq = [(i, j) for i in range(20, 25) for j in range(20, 25) if i < j]
    e = _sym_edges(spark, star + cliq)
    out = {r["n_removed"]: r for r in robustness_profile(spark, e, cuts=(0, 1)).collect()}
    assert out[0]["giant_size"] == 11 and out[0]["n_components"] == 2
    assert out[1]["n_vertices"] == 15
    assert out[1]["giant_size"] == 5          # the clique
    assert out[1]["n_components"] == 11       # clique + 10 singleton leaves


def test_landmark_oracle_sandwich(spark):
    from sbm_communitydetection_spark.operators.sssp import landmark_oracle_eval

    # cycle of 12 with landmark at 0 (0 % 12 == 0); probes u=1 (mod 97),
    # v=2: triangle-inequality sandwich must hold and d(1,2)=1
    e = _sym_edges(spark, [(i, (i + 1) % 12) for i in range(12)])
    rows = landmark_oracle_eval(
        spark, e, rounds=6, lm_mod=12, probe_mod=97, probe_rem_u=1, probe_rem_v=2
    ).collect()
    assert rows, "no probe pairs evaluated"
    for r in rows:
        assert r["est_lower"] <= r["d_exact"] <= r["est_upper"]
    d12 = {(r["u"], r["v"]): r for r in rows}[(1, 2)]
    assert d12["d_exact"] == 1.0
    # landmark 0 lies beside the 1-2 edge: upper bound = d(0,1)+d(0,2) = 3
    assert d12["est_upper"] == 3.0 and d12["est_lower"] == 1.0


# --- wave 5: matryoshka, Burt constraint, motif spectral ------------------


def test_matryoshka_recall_prefix_vs_suffix_signal(spark):
    # class signal lives ONLY in the last 8 dims; the first 8 dims are a
    # shared constant -> truncating to d=8 destroys the ranking, full
    # width recovers it
    rows = []
    for i in range(12):
        a = [1.0] * 8 + [5.0 + 0.01 * i] * 8
        b = [1.0] * 8 + [-5.0 - 0.01 * i] * 8
        rows.append((i, a, 0))
        rows.append((100 + i, b, 1))
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["d"]: r["mean_recall"] for r in TS.matryoshka_recall(
        embs, dims=(8, 16), k=5, query_mod=4, query_rem=1, full_dim=16
    ).collect()}
    assert out[16] == 1.0            # identity check: full dim vs itself
    assert out[8] < 1.0              # prefix-only truncation loses the signal


def test_burt_constraint_broker_vs_clique(spark):
    from sbm_communitydetection_spark.operators.graph_ops import burt_constraint

    # vertex 0 brokers two otherwise-disconnected contacts (star);
    # vertices 10-12 sit in a closed triangle (redundant ego nets)
    e = _sym_edges(spark, [(0, 1), (0, 2), (10, 11), (11, 12), (10, 12)])
    out = {r["id"]: r["constraint"] for r in burt_constraint(e).collect()}
    # broker: two independent contacts, C = 2*(1/2)^2 = 0.5
    assert abs(out[0] - 0.5) < 1e-6
    # triangle member: C = 2*(1/2 + 1/4)^2 = 1.125 > leaf C = 1.0 > broker
    assert abs(out[10] - 1.125) < 1e-6
    assert abs(out[1] - 1.0) < 1e-6   # leaf: single contact, p=1
    assert out[0] < out[1] < out[10]


def test_motif_spectral_splits_triangle_blocks(spark):
    from sbm_communitydetection_spark.operators.spectral import (
        motif_spectral_bisection,
    )

    # two triangle-rich blocks joined by a triangle-free bridge: the
    # bridge edge carries no triangles, so the motif graph splits clean
    k = 5
    left = [(i, j) for i in range(k) for j in range(k) if i < j]
    right = [(i + 10, j + 10) for (i, j) in left]
    e = _sym_edges(spark, left + right + [(0, 10)])
    sides = {r["id"]: r["side"] for r in motif_spectral_bisection(spark, e, iters=25).collect()}
    assert len(sides) == 2 * k  # bridge endpoints are IN blocks; all present
    s_left = {sides[i] for i in range(k)}
    s_right = {sides[i + 10] for i in range(k)}
    assert len(s_left) == 1 and len(s_right) == 1 and s_left != s_right


# --- wave 6: WL conversation kernel ---------------------------------------


def test_conv_wl_kernel_finds_isomorphic_conversations(spark):
    import datetime as dt

    from sbm_communitydetection_spark.operators.wl import conv_wl_kernel

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # c1 and c2: identical SHAPE (a->b->a->b ping-pong), different role
    # names in c2 — WL is structure-only, so they must score 1.0
    for i, r in enumerate(["a", "b", "a", "b", "a"]):
        rows.append(("c1", i, r, "t", None, t0))
    for i, r in enumerate(["x", "y", "x", "y", "x"]):
        rows.append(("c2", i, r, "t", None, t0))
    # c3: a 4-role chain — different shape entirely
    for i, r in enumerate(["p", "q", "r", "s", "p"]):
        rows.append(("c3", i, r, "t", None, t0))
    tr = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = {(r["conv_a"], r["conv_b"]): r["sim"]
           for r in conv_wl_kernel(spark, tr, rounds=2, min_sim=0.0).collect()}
    assert out[("c1", "c2")] == 1.0
    assert out.get(("c1", "c3"), 0.0) < 1.0
    assert out.get(("c2", "c3"), 0.0) < 1.0


# --- wave 7: semantic decontamination, tool latency attribution -----------


def test_semantic_decontamination_flags_paraphrase_neighbors(spark):
    # benchmark item = vec 7 (7 % 20 == 7); vec 1 is a near-copy of it,
    # vec 2 is orthogonal-ish
    rows = [
        (7, [1.0] * 8, 0),           # benchmark
        (1, [1.0] * 7 + [0.9], 0),   # paraphrase-close -> flagged
        (2, [1.0, -1.0] * 4, 1),     # unrelated -> clean
    ]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["vec_id"]: (r["max_cos"], r["flagged"])
           for r in TS.semantic_decontamination(embs, bench_mod=20, bench_rem=7,
                                                threshold=0.9).collect()}
    assert set(out) == {1, 2}        # benchmark rows never appear
    assert out[1][1] is True and out[1][0] > 0.99
    assert out[2][1] is False


def test_semantic_decontamination_zero_norm_is_guarded(spark):
    # ADVICE r3: a zero-norm embedding must contribute cosine 0.0 (not
    # NaN) on both engines; here both a zero-norm corpus row and a
    # zero-norm benchmark row exist.
    rows = [
        (7, [0.0] * 8, 0),           # zero-norm BENCHMARK item
        (27, [1.0] * 8, 0),          # nonzero benchmark item
        (1, [0.0] * 8, 0),           # zero-norm corpus row
        (2, [1.0] * 8, 1),           # exact copy of bench 27
    ]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["vec_id"]: (r["max_cos"], r["flagged"])
           for r in TS.semantic_decontamination(embs, bench_mod=20, bench_rem=7,
                                                threshold=0.9).collect()}
    assert set(out) == {1, 2}
    assert out[1] == (0.0, False)        # zero-norm corpus: guarded to 0.0
    assert out[2][0] == 1.0 and out[2][1] is True

    # DuckDB twin agrees on the same data (CASE WHEN mirror)
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register("embeddings", pd.DataFrame(
        {"vec_id": [r[0] for r in rows],
         "embedding": [r[1] for r in rows],
         "label": [r[2] for r in rows]}))
    got = {int(r[0]): (float(r[1]), bool(r[2]))
           for r in con.execute(TS.semantic_decontamination_sql(threshold=0.9)).fetchall()}
    assert got == {k: (v[0], v[1]) for k, v in out.items()}


def test_semantic_decontamination_ivf_fallback_matches_on_separable_data(spark):
    # Force the guarded broadcast to reject (max_broadcast_rows=0) so the
    # IVF-cell-restricted path runs (nprobe=1 pins the single-probe
    # semantics this test was written for).  With two well-separated
    # label clusters and per-label centroids, the 1-probe restriction
    # loses nothing: every corpus row must still appear (left-join back)
    # and the near-copy must be flagged.
    rows = [(7, [1.0] * 8, 0), (1, [1.0] * 7 + [0.9], 0), (2, [1.0, -1.0] * 4, 1)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    cents = TS.label_centroids(embs, dim=8)
    with pytest.warns(UserWarning, match="recall-bounded"):
        out = {r["vec_id"]: (r["max_cos"], r["flagged"])
               for r in TS.semantic_decontamination(
                   embs, bench_mod=20, bench_rem=7, threshold=0.9,
                   max_broadcast_rows=0, centroids=cents, nprobe=1).collect()}
    assert set(out) == {1, 2}            # vec 2's cell has no bench -> 0.0 row kept
    assert out[1][1] is True and out[1][0] > 0.99
    assert out[2] == (0.0, False)


def test_semantic_decontamination_multiprobe_recovers_boundary_pair(spark):
    """VERDICT r4 #3: the fallback's documented failure mode — a
    paraphrase pair split across a cell boundary — is recovered by
    nprobe=2 (the default).  Bench vec 7 lives in cell B; the corpus
    paraphrase's NEAREST centroid is A, second-nearest B, so 1-probe
    scores it against nothing while 2-probe flags it."""
    cents = spark.createDataFrame(
        [(0, 0, 1.0), (0, 1, 0.0), (1, 0, 0.8), (1, 1, 0.6)],
        "label long, d int, c double",
    )
    rows = [(7, [0.8, 0.6]), (1, [0.95, 0.31])]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(bench_mod=20, bench_rem=7, threshold=0.9,
              max_broadcast_rows=0, centroids=cents)
    with pytest.warns(UserWarning, match="recall-bounded"):
        one = {r["vec_id"]: (r["max_cos"], r["flagged"])
               for r in TS.semantic_decontamination(embs, nprobe=1, **kw).collect()}
    with pytest.warns(UserWarning, match="recall-bounded"):
        two = {r["vec_id"]: (r["max_cos"], r["flagged"])
               for r in TS.semantic_decontamination(embs, nprobe=2, **kw).collect()}
    assert one[1] == (0.0, False)            # single-probe misses the pair
    assert two[1][1] is True and two[1][0] > 0.94
    # multi-probe equals the exact broadcast path on this data
    exact = {r["vec_id"]: (r["max_cos"], r["flagged"])
             for r in TS.semantic_decontamination(
                 embs, bench_mod=20, bench_rem=7, threshold=0.9).collect()}
    assert two == exact


def test_tool_latency_attribution_buckets(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        # conv: turn0 (tool) -> turn1 after 10s; turn1 (no tool) -> turn2 after 2s
        ("c1", 0, "a", "t", "tool_1", ts(0)),
        ("c1", 1, "b", "t", None, ts(10)),
        ("c1", 2, "a", "t", None, ts(12)),
    ]
    tr = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    from sbm_communitydetection_spark.sources.events_transcripts import (
        tool_latency_attribution,
    )

    out = {r["after_tool"]: r for r in tool_latency_attribution(tr).collect()}
    assert out[True]["n_replies"] == 1 and out[True]["mean_latency_ms"] == 10000.0
    assert out[False]["n_replies"] == 1 and out[False]["mean_latency_ms"] == 2000.0


# --- wave 8: temporal motifs, Cheeger sweep -------------------------------


def test_temporal_triangles_respect_order_and_window(spark):
    import datetime as dt

    from sbm_communitydetection_spark.operators.temporal import temporal_triangles

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    # contacts are consecutive-turn pairs: build convs that realize them
    rows = [
        # c1: a->b at 10s (turn1 replies)
        ("c1", 0, "a", "t", None, ts(0)), ("c1", 1, "b", "t", None, ts(10)),
        # c2: b->c at 20s
        ("c2", 0, "b", "t", None, ts(15)), ("c2", 1, "c", "t", None, ts(20)),
        # c3: c->a at 30s  -> cyclic triangle within delta
        ("c3", 0, "c", "t", None, ts(25)), ("c3", 1, "a", "t", None, ts(30)),
        # c4: a->c at 40s  -> feed-forward (a->b, b->c, a->c ordered)
        ("c4", 0, "a", "t", None, ts(35)), ("c4", 1, "c", "t", None, ts(40)),
    ]
    tr = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    row = temporal_triangles(tr, delta_ms=60_000).collect()[0]
    assert row["n_cyclic"] == 1 and row["n_ffl"] == 1
    # a 15-second window excludes the later closures
    row2 = temporal_triangles(tr, delta_ms=15_000).collect()[0]
    assert row2["n_cyclic"] == 0 and row2["n_ffl"] == 0


def test_spectral_sweep_cut_beats_or_matches_sign_split_on_barbell(spark):
    from sbm_communitydetection_spark.operators.spectral import spectral_sweep_cut

    k = 6
    left = [(i, j) for i in range(k) for j in range(k) if i < j]
    right = [(i + 10, j + 10) for (i, j) in left]
    e = _sym_edges(spark, left + right + [(0, 10)])
    cut = spectral_sweep_cut(spark, e, iters=30).collect()
    members = {r["id"] for r in cut}
    phi = cut[0]["phi"]
    # the sweep finds one clique exactly; its conductance is 1/(2*15+1)
    assert members == set(range(k)) or members == {i + 10 for i in range(k)}
    assert abs(phi - 1.0 / 31.0) < 1e-6


def test_percolation_curve_monotone_and_coupled(spark):
    from sbm_communitydetection_spark.operators.components import percolation_curve

    # a 40-cycle: full retention (permille 1000) must give one giant
    # component of 40; the coupled-coin construction makes the series
    # monotone in kept edges and giant size
    e = _sym_edges(spark, [(i, (i + 1) % 40) for i in range(40)])
    out = {r["permille"]: r for r in percolation_curve(
        spark, e, permilles=(200, 600, 1000)
    ).collect()}
    assert out[1000]["n_edges_kept"] == 40
    assert out[1000]["giant_size"] == 40 and out[1000]["n_components"] == 1
    assert out[200]["n_edges_kept"] <= out[600]["n_edges_kept"] <= 40
    assert out[200]["giant_size"] <= out[600]["giant_size"] <= 40
    # vertex set is fixed: components + non-singletons account for all 40
    for p in (200, 600):
        assert out[p]["n_components"] >= 1
