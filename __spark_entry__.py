"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: sbm_communitydetection_spark (see SURVEY.md §2 for the
operator inventory each query exercises; textops/ for the
training-data pipeline operators).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sbm_communitydetection_spark.functions import sql_oracles as O  # noqa: E402
from sbm_communitydetection_spark.textops.portable import md5_long_sql  # noqa: E402
from sbm_communitydetection_spark.operators.frontier import (  # noqa: E402
    r_hop_neighborhood_sql as _frontier_sql,
)
from sbm_communitydetection_spark.operators.linkpred import (  # noqa: E402
    adamic_adar_sql as _aa_sql,
    jaccard_sql as _jac_sql,
    linkpred_precision_sql as _lp_eval_sql,
)
from sbm_communitydetection_spark.operators.betweenness import (  # noqa: E402
    betweenness_sql as _betw_sql,
)
from sbm_communitydetection_spark.operators.kcore import (  # noqa: E402
    k_truss_unrolled_sql as _ktruss_sql,
)
from sbm_communitydetection_spark.operators import kcore as KC  # noqa: E402
from sbm_communitydetection_spark.operators.walks import (  # noqa: E402
    neighbor_sample_sql as _nbrsample_sql,
    random_walks_sql as _walks_sql,
    walk_cooccurrence_sql as _cooc_sql,
    node2vec_walks_sql as _n2v_sql,
)
from sbm_communitydetection_spark.textops.similarity import (  # noqa: E402
    embedding_covariance_sql as _cov_sql,
    embedding_outliers_sql as _outliers_sql,
    pca_top_component_sql as _pca_sql,
)
from sbm_communitydetection_spark.operators.triangles import (  # noqa: E402
    edge_embeddedness_sql as _edge_emb_sql,
    triangle_estimate_sampled_sql as _tri_est_sql,
)
from sbm_communitydetection_spark.functions.metrics import (  # noqa: E402
    community_evolution_sql as _comm_evo_sql,
)
from sbm_communitydetection_spark.operators.funnels import (  # noqa: E402
    event_transitions_sql as _evt_trans_sql,
    props_field_stats_sql as _props_sql,
)
from sbm_communitydetection_spark.operators.spanning import (  # noqa: E402
    minimum_spanning_forest_sql as _msf_sql,
)
from sbm_communitydetection_spark.operators.mis import (  # noqa: E402
    greedy_coloring_sql as _coloring_sql,
    maximal_independent_set_sql as _mis_sql,
)
from sbm_communitydetection_spark.operators.densest import (  # noqa: E402
    densest_subgraph_sql as _densest_sql,
)
from sbm_communitydetection_spark.operators.matching import (  # noqa: E402
    maximal_matching_sql as _matching_sql,
)
from sbm_communitydetection_spark.operators.sssp import (  # noqa: E402
    distance_profile_sql as _distprof_sql,
    harmonic_centrality_sql as _harm_sql,
    shortest_paths_sql as _sssp_sql,
)
from sbm_communitydetection_spark.operators import graph_ops as G  # noqa: E402
from sbm_communitydetection_spark.sources.tpch_graph import (  # noqa: E402
    N_LABELS,
    derived_labels,
    lineitem_directed_edges_sql,
    lineitem_edges,
    lineitem_edges_sql,
    lineitem_mixed_digraph_sql,
)
from sbm_communitydetection_spark.operators.katz import (  # noqa: E402
    eigenvector_unrolled_sql,
    katz_unrolled_sql,
)
from sbm_communitydetection_spark.operators.extract import (  # noqa: E402
    agent_loops_oracle_sql as _agentloops_sql,
    tool_chains_oracle_sql as _toolchains_sql,
)
from sbm_communitydetection_spark.operators.triangles import (  # noqa: E402
    butterfly_count_sql as _butterfly_sql,
)
from sbm_communitydetection_spark.operators import funnels as FN  # noqa: E402
from sbm_communitydetection_spark.sources import events_transcripts as ET  # noqa: E402
from sbm_communitydetection_spark.textops import analysis as TA  # noqa: E402
from sbm_communitydetection_spark.textops import dedup as TD  # noqa: E402
from sbm_communitydetection_spark.textops import sketches as SK  # noqa: E402
from sbm_communitydetection_spark.textops import multimodal as TM  # noqa: E402
from sbm_communitydetection_spark.textops import pipeline as TP  # noqa: E402
from sbm_communitydetection_spark.textops import similarity as TS  # noqa: E402
from sbm_communitydetection_spark.textops import bm25 as BM  # noqa: E402
from sbm_communitydetection_spark.textops import textrank as TR  # noqa: E402
from sbm_communitydetection_spark.operators import partition_audit as PA  # noqa: E402
from sbm_communitydetection_spark.operators.triangles import (  # noqa: E402
    four_clique_count_sql as _four_clique_sql,
)
from sbm_communitydetection_spark.textops.fusion import (  # noqa: E402
    rrf_fused_topk_sql as _rrf_sql,
)
from sbm_communitydetection_spark.operators import wl as WL  # noqa: E402
from sbm_communitydetection_spark.operators.fastrp import (  # noqa: E402
    fastrp_sql as _fastrp_sql,
)
from sbm_communitydetection_spark.textops.bpe import (  # noqa: E402
    bpe_apply_sql as _bpe_apply_sql,
    bpe_train_sql as _bpe_sql,
)

PR_ITERS = 5
WL_ROUNDS = 3
CORENESS_ROUNDS = 4
LPA_ITERS = 3
SEEDED_LPA_ITERS = 4
BP_ITERS = 2
KCORE_K = 3
KCORE_ROUNDS = 4
KTRUSS_K = 4
KTRUSS_ROUNDS = 3
PPR_SRC_MOD = 100
HITS_ITERS = 4
AA_PROBE_MOD = 100
SSSP_SRC_MOD = 100
SSSP_ROUNDS = 3
BETW_SRC_MOD = 200
BETW_RADIUS = 2
WALK_START_MOD = 100
WALKS_PER_VERTEX = 2
WALK_LENGTH = 4
DECAY_HALF_LIFE_MS = 7 * 24 * 3600 * 1000  # one week
SESSION_GAP_MS = 24 * 3600 * 1000  # one day (median inter-turn gap ~7h)
TFIDF_K = 5
TOPNGRAM_K = 20
SAMPLE_RATES = {"en": 500, "zh": 250}  # permille kept per lang; rest 1000
BP_K = 6
BP_P_IN, BP_P_OUT, BP_NOISE = 0.7, 0.05, 0.3
N_TRUTH = 7  # second derived partition for pred-vs-truth metrics
COS_DUP_THRESHOLD = 0.35
ANN_K = 5
SEMDEDUP_THRESHOLD = 0.9
QUALITY_MIN = 0.3
# events-derived conversations are random flows over 5 roles × 7 tools, so
# genuine templates don't exist in the synthetic data; a low threshold with
# fine banding (2 rows/band → 16 bands: high recall at low similarity) keeps
# the gate result non-empty (LSH-band collisions verified by exact Jaccard)
STRUCT_DUP_THRESHOLD = 0.12
STRUCT_DUP_ROWS_PER_BAND = 2
# scale-safe default for the gate-exposed triad census (VERDICT r3 #5):
# wedge cost is O(out_deg · in_deg) per hub, so the shipped example caps
# out-degree; a no-op on the role digraph's handful of roles (values are
# identical with or without the cap at gate scale)
TRIAD_MAX_OUT_DEGREE = 10_000


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full synth→extract→
    analyze slice — generate SBM-planted transcripts, extract the link
    graph, return weighted-degree top-20 actors (SURVEY.md §7 Phase 1)."""
    from sbm_communitydetection_spark.operators.extract import extract_graph
    from sbm_communitydetection_spark.sources.transcripts import generate_transcripts

    # deterministic synthetic transcripts (no external data); sized ~sf0.001
    t, _, _ = generate_transcripts(spark, n=100, k=5, m=400, seed=42)
    vertices, edges = extract_graph(t)
    deg = G.weighted_degree(edges)
    return (
        vertices.join(deg, "id")
        .orderBy(F.desc("degree"), "actor_key")
        .select("actor_key", "kind", "degree")
        .limit(20)
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# -- graph core -------------------------------------------------------------


def _q_edges(spark, sf_dir):
    return lineitem_edges(spark, sf_dir).select("src", "dst", "weight")


def _q_degree(spark, sf_dir):
    return G.weighted_degree(lineitem_edges(spark, sf_dir)).select("id", "degree")


def _q_degree_histogram(spark, sf_dir):
    """log2-bucketed weighted-degree distribution — the graph-shape probe
    that decides salting thresholds and partition sizing at 100 TB
    (docs/SCALE.md 'Skew'). Two hash aggregates, no joins."""
    from pyspark.sql import functions as F

    deg = G.weighted_degree(lineitem_edges(spark, sf_dir))
    return (
        deg.select(F.floor(F.log2(F.col("degree").cast("double"))).cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vertices"))
    )


def _q_total_edges(spark, sf_dir):
    return G.total_edges(lineitem_edges(spark, sf_dir)).select(
        F.col("total_edges").cast("double").alias("total_edges")
    )


def _q_pagerank(spark, sf_dir):
    """Fixed-iteration weighted PageRank (tolerance=-1 forces exactly
    PR_ITERS supersteps to mirror the unrolled SQL oracle)."""
    from sbm_communitydetection_spark.operators.pagerank import pagerank

    ranks = pagerank(
        spark, lineitem_edges(spark, sf_dir), damping=0.85, tolerance=-1.0, max_iterations=PR_ITERS
    )
    return ranks.select("id", F.round("rank", 8).alias("rank"))


def _q_personalized_pagerank(spark, sf_dir):
    """Fixed-iteration PPR; reset set = vertices with id % PPR_SRC_MOD == 0
    (deterministic, mirrors the unrolled SQL oracle's member set)."""
    from sbm_communitydetection_spark.operators.pagerank import pagerank

    edges = lineitem_edges(spark, sf_dir)
    members = edges.select(F.col("src").alias("id")).distinct().filter(
        F.pmod(F.col("id"), F.lit(PPR_SRC_MOD)) == 0
    )
    ranks = pagerank(
        spark, edges, damping=0.85, tolerance=-1.0, max_iterations=PR_ITERS,
        reset_ids=members,
    )
    return ranks.select("id", F.round("rank", 8).alias("rank"))


def _q_katz(spark, sf_dir):
    """Fixed-iteration Katz centrality over the DIRECTED derived graph."""
    from sbm_communitydetection_spark.operators.katz import katz_centrality
    from sbm_communitydetection_spark.sources.tpch_graph import lineitem_directed_edges

    return katz_centrality(spark, lineitem_directed_edges(spark, sf_dir))


def _q_hits(spark, sf_dir):
    """Fixed-iteration HITS hubs/authorities over the DIRECTED derived
    graph (symmetric edges would collapse hub == auth)."""
    from sbm_communitydetection_spark.operators.hits import hits
    from sbm_communitydetection_spark.sources.tpch_graph import lineitem_directed_edges

    scores = hits(
        spark, lineitem_directed_edges(spark, sf_dir), tolerance=-1.0,
        max_iterations=HITS_ITERS,
    )
    return scores.select(
        "id", F.round("hub", 8).alias("hub"), F.round("auth", 8).alias("auth")
    )


def _q_local_clustering(spark, sf_dir):
    from sbm_communitydetection_spark.operators.triangles import local_clustering_coefficient

    return local_clustering_coefficient(lineitem_edges(spark, sf_dir)).select(
        "id", F.round("lcc", 8).alias("lcc")
    )


def _q_adamic_adar(spark, sf_dir):
    """Partner-lookup Adamic-Adar for the deterministic probe set
    (a % AA_PROBE_MOD == 0): non-adjacent pairs, common-neighbor count
    and AA score."""
    from sbm_communitydetection_spark.operators.linkpred import adamic_adar

    scores = adamic_adar(lineitem_edges(spark, sf_dir), probe_mod=AA_PROBE_MOD)
    return scores.select(
        "a", "b", "cn_count", F.round("aa_score", 6).alias("aa_score")
    )


def _q_jaccard(spark, sf_dir):
    """Partner-lookup Jaccard link prediction for the same probe set as
    adamic_adar: cn / (deg_a + deg_b − cn) over non-adjacent pairs."""
    from sbm_communitydetection_spark.operators.linkpred import jaccard_scores

    scores = jaccard_scores(lineitem_edges(spark, sf_dir), probe_mod=AA_PROBE_MOD)
    return scores.select("a", "b", "cn_count", F.round("jaccard", 6).alias("jaccard"))


def _q_harmonic_centrality(spark, sf_dir):
    """Landmark-sample harmonic centrality: Σ_lm 1/d(lm, v) after
    SSSP_ROUNDS relaxation rounds from landmarks id % SSSP_SRC_MOD == 0."""
    from sbm_communitydetection_spark.operators.sssp import harmonic_centrality

    edges = lineitem_edges(spark, sf_dir)
    srcs = edges.select(F.col("src").alias("id")).distinct().filter(
        F.pmod(F.col("id"), F.lit(SSSP_SRC_MOD)) == 0
    )
    return harmonic_centrality(spark, edges, srcs, rounds=SSSP_ROUNDS)


def _q_sssp(spark, sf_dir):
    """Fixed-round multi-source shortest paths (landmark distances) from
    the deterministic source set id % SSSP_SRC_MOD == 0."""
    from sbm_communitydetection_spark.operators.sssp import shortest_paths

    edges = lineitem_edges(spark, sf_dir)
    srcs = edges.select(F.col("src").alias("id")).distinct().filter(
        F.pmod(F.col("id"), F.lit(SSSP_SRC_MOD)) == 0
    )
    return shortest_paths(spark, edges, srcs, rounds=SSSP_ROUNDS)


def _q_betweenness(spark, sf_dir):
    """Radius-truncated Brandes betweenness from the deterministic source
    sample id % BETW_SRC_MOD == 0 (forward BFS + dependency accumulation,
    both fixed-round and oracle-unrolled)."""
    from sbm_communitydetection_spark.operators.betweenness import betweenness_approx

    edges = lineitem_edges(spark, sf_dir)
    srcs = edges.select(F.col("src").alias("id")).distinct().filter(
        F.pmod(F.col("id"), F.lit(BETW_SRC_MOD)) == 0
    )
    return betweenness_approx(spark, edges, srcs, radius=BETW_RADIUS)


def _q_random_walks(spark, sf_dir):
    """Deterministic weighted random walks (portable-hash sampling) —
    the node2vec corpus generator, bit-identical to the DuckDB oracle."""
    from sbm_communitydetection_spark.operators.walks import random_walks

    return random_walks(
        spark,
        lineitem_edges(spark, sf_dir),
        start_mod=WALK_START_MOD,
        walks_per_vertex=WALKS_PER_VERTEX,
        length=WALK_LENGTH,
    )


def _q_node2vec_walks(spark, sf_dir):
    """Second-order (node2vec) biased walks, p=4 / q=2 as integer bias
    multipliers — runtime per-(prev,cur) intervals, portable-hash picks,
    bit-identical to the unrolled DuckDB twin."""
    from sbm_communitydetection_spark.operators.walks import node2vec_walks

    return node2vec_walks(
        spark,
        lineitem_edges(spark, sf_dir),
        start_mod=WALK_START_MOD,
        walks_per_vertex=WALKS_PER_VERTEX,
        length=WALK_LENGTH,
    )


MIS_ROUNDS = 12
DENSEST_ROUNDS = 24  # SQL unroll bound; Spark peels to exhaustion
MATCHING_ROUNDS = 24  # SQL unroll bound; empty tail rounds no-op


def _q_substring_dup_flags(spark, sf_dir):
    """Exact substring-dedup signal at char-12-gram granularity (hashed
    grams; the scalable form of suffix-array substring dedup)."""
    return TD.substring_dup_flags(_docs(spark, sf_dir))


def _q_bipartite_check(spark, sf_dir):
    """Per-component bipartiteness via double-cover CC composition."""
    from sbm_communitydetection_spark.operators.components import bipartite_check

    return bipartite_check(spark, lineitem_edges(spark, sf_dir))


def _q_maximal_matching(spark, sf_dir):
    """Mutual-min-pointer maximal matching (edge-level MIS), portable
    hash priorities; DuckDB twin replays the identical rounds."""
    from sbm_communitydetection_spark.operators.matching import maximal_matching

    return maximal_matching(spark, lineitem_edges(spark, sf_dir))


def _q_densest_subgraph(spark, sf_dir):
    """Bahmani et al. parallel peeling (ε=1): densest-round vertex set
    with its density; DuckDB twin replays the identical rounds."""
    from sbm_communitydetection_spark.operators.densest import densest_subgraph

    return densest_subgraph(spark, lineitem_edges(spark, sf_dir))


def _q_mis(spark, sf_dir):
    """Luby maximal independent set, portable-hash priorities — the
    unrolled DuckDB twin replays the identical rounds."""
    from sbm_communitydetection_spark.operators.mis import maximal_independent_set

    return maximal_independent_set(
        spark, lineitem_edges(spark, sf_dir), max_rounds=MIS_ROUNDS
    )


def _q_embedding_covariance(spark, sf_dir):
    """Population covariance of the embedding column (upper triangle) —
    the PCA/whitening primitive; engine side ships batch-partial Grams
    (one Arrow pass, d^2-bounded shuffle), oracle expands pairs."""
    from sbm_communitydetection_spark.textops.similarity import embedding_covariance

    return embedding_covariance(_embs(spark, sf_dir))


def _q_embedding_outliers(spark, sf_dir):
    """Per-dimension z-score screening over the embedding corpus — the
    cheap pre-filter before the quadratic/ANN dedup stages; z rounded
    to 6 decimals before thresholding in both engines."""
    from sbm_communitydetection_spark.textops.similarity import embedding_outliers

    return embedding_outliers(_embs(spark, sf_dir))


def _q_pca_top_component(spark, sf_dir):
    """Top principal component via fixed power iteration on the
    partial-Gram covariance — identical unrolled arithmetic both sides,
    loadings rounded to 6 decimals at the end only."""
    from sbm_communitydetection_spark.textops.similarity import pca_top_component

    return pca_top_component(_embs(spark, sf_dir))


STREAM_TRI_BOUNDS = [200, 400, 600, 800, 1001]


def _q_stream_triangles(spark, sf_dir):
    """Incremental triangle maintenance over 5 cumulative batches; every
    batch's count must equal a full recount of the prefix (the oracle
    recounts, the engine only folds the delta)."""
    from sbm_communitydetection_spark.streaming.stream_driver import stream_triangles
    from sbm_communitydetection_spark.textops.portable import md5_long

    edges = lineitem_edges(spark, sf_dir).withColumn(
        "edge_seq",
        md5_long(
            F.concat_ws(
                ":",
                F.least("src", "dst").cast("string"),
                F.greatest("src", "dst").cast("string"),
            )
        )
        % 1000,
    )
    return stream_triangles(spark, edges, STREAM_TRI_BOUNDS)


COLOR_ROUNDS = 24
COLOR_SAMPLE_PERMILLE = 30


def _q_coloring(spark, sf_dir):
    """Jones–Plassmann greedy coloring with fixed portable-hash
    priorities (conflict-free update scheduling for batched mutations) —
    gated on the hash-sparsified subgraph (the dense 1000-vertex gate
    graph needs >100 colors, which would make the unrolled twin
    enormous; the op itself is parameter-free and general).  The
    unrolled DuckDB twin replays the identical rounds."""
    from sbm_communitydetection_spark.operators.mis import greedy_coloring

    sampled = G.sample_edges(
        lineitem_edges(spark, sf_dir), permille=COLOR_SAMPLE_PERMILLE
    )
    return greedy_coloring(spark, sampled, max_rounds=COLOR_ROUNDS)


NEIGHBOR_FANOUT = 3


def _q_neighbor_sample(spark, sf_dir):
    """Deterministic GraphSAGE-style fanout sampling: every vertex keeps
    NEIGHBOR_FANOUT neighbors by portable-hash priority — bounded
    minibatch adjacency for GNN training."""
    from sbm_communitydetection_spark.operators.walks import neighbor_sample

    return neighbor_sample(lineitem_edges(spark, sf_dir), fanout=NEIGHBOR_FANOUT)


def _q_distance_profile(spark, sf_dir):
    """Sampled reachability profile (effective-diameter read-off) from
    the SSSP landmark set."""
    from sbm_communitydetection_spark.operators.sssp import distance_profile

    edges = lineitem_edges(spark, sf_dir)
    srcs = edges.select(F.col("src").alias("id")).distinct().filter(
        F.pmod(F.col("id"), F.lit(SSSP_SRC_MOD)) == 0
    )
    return distance_profile(spark, edges, srcs, rounds=SSSP_ROUNDS)


def _q_assortativity(spark, sf_dir):
    return G.degree_assortativity(lineitem_edges(spark, sf_dir)).select(
        F.round("assortativity", 8).alias("assortativity")
    )


def _q_lpa(spark, sf_dir):
    from sbm_communitydetection_spark.operators.label_propagation import label_propagation

    res = label_propagation(
        spark, lineitem_edges(spark, sf_dir), max_iterations=LPA_ITERS, variant="plain", tolerance=-1.0
    )
    return res.state.select("id", "label")


def _q_seeded_lpa(spark, sf_dir):
    """Seed-expansion LPA: frozen seeds (id % 100 == 0, label id//100)
    propagate outward for SEEDED_LPA_ITERS synchronous rounds."""
    from sbm_communitydetection_spark.operators.label_propagation import (
        seeded_label_propagation,
    )

    edges = lineitem_edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .filter(F.col("id") % 100 == 0)
        .select("id", F.floor(F.col("id") / 100).cast("long").alias("label"))
    )
    res = seeded_label_propagation(spark, edges, seeds, n_iterations=SEEDED_LPA_ITERS)
    return res.state.select("id", "label")


def _q_bp(spark, sf_dir):
    """Fixed-iteration synchronous SBM belief propagation (D2 engine form);
    deterministic id%k side info, labels by logit argmax."""
    from sbm_communitydetection_spark.operators.belief_propagation import (
        belief_propagation,
        noisy_priors,
    )

    edges = lineitem_edges(spark, sf_dir)
    obs = edges.select(F.col("src").alias("id")).distinct().select(
        "id", F.pmod(F.col("id"), F.lit(BP_K)).cast("long").alias("label")
    )
    res = belief_propagation(
        spark,
        edges,
        noisy_priors(obs, BP_K, BP_NOISE),
        k=BP_K,
        p_in=BP_P_IN,
        p_out=BP_P_OUT,
        max_iterations=BP_ITERS,
        tolerance=-1.0,
    )
    return res.select("id", "label")


def _q_components(spark, sf_dir):
    from sbm_communitydetection_spark.operators.components import connected_components

    return connected_components(spark, lineitem_edges(spark, sf_dir)).select("id", "component")


def _q_stream_cc(spark, sf_dir):
    """Streaming CC: 5 ordered micro-batches folded by delta repair;
    final labels equal the full-recompute oracle over all edges."""
    from sbm_communitydetection_spark.streaming.stream_driver import (
        stream_connected_components,
    )
    from sbm_communitydetection_spark.textops.portable import md5_long

    edges = lineitem_edges(spark, sf_dir).withColumn(
        "edge_seq",
        md5_long(F.concat_ws(":", F.col("src").cast("string"), F.col("dst").cast("string")))
        % 1000,
    )
    return stream_connected_components(spark, edges, n_batches=5).select("id", "component")


def _q_cc_incremental(spark, sf_dir):
    """Dynamic-graph path: CC on 90% of the edges, then fold the held-out
    10% in via delta-proportional repair. The oracle is a FULL recompute
    over all edges — equality proves the repair is exact."""
    from sbm_communitydetection_spark.operators.components import (
        connected_components,
        incremental_components,
    )
    from sbm_communitydetection_spark.textops.portable import md5_long

    edges = lineitem_edges(spark, sf_dir)
    coin = (
        md5_long(F.concat_ws(":", F.col("src").cast("string"), F.col("dst").cast("string"))) % 10
    )
    labels = connected_components(spark, edges.filter(coin != 0))
    return incremental_components(spark, labels, edges.filter(coin == 0)).select(
        "id", "component"
    )


def _q_cc_decremental(spark, sf_dir):
    """Dynamic-graph removal path: CC over all edges, then REMOVE a
    deterministic 10% (canonical undirected coin) and repair only the
    components that lost an edge. The oracle is a FULL recompute over the
    surviving edges on the ORIGINAL vertex set — equality proves the
    affected-component-scoped repair (and the untouched carry-over) exact."""
    from sbm_communitydetection_spark.operators.components import (
        connected_components,
        decremental_components,
    )
    from sbm_communitydetection_spark.textops.portable import md5_long

    edges = lineitem_edges(spark, sf_dir)
    coin = (
        md5_long(
            F.concat_ws(
                ":",
                F.least("src", "dst").cast("string"),
                F.greatest("src", "dst").cast("string"),
            )
        )
        % 10
    )
    labels = connected_components(spark, edges)
    return decremental_components(spark, labels, edges, edges.filter(coin == 0)).select(
        "id", "component"
    )


def _q_k_core(spark, sf_dir):
    from sbm_communitydetection_spark.operators.kcore import k_core

    return k_core(spark, lineitem_edges(spark, sf_dir), k=KCORE_K, rounds=KCORE_ROUNDS)


def _q_k_truss(spark, sf_dir):
    """Fixed-round k-truss support peeling (edge-cohesion filter)."""
    from sbm_communitydetection_spark.operators.kcore import k_truss

    return k_truss(spark, lineitem_edges(spark, sf_dir), k=KTRUSS_K, rounds=KTRUSS_ROUNDS)


def _q_triangle_count(spark, sf_dir):
    from sbm_communitydetection_spark.operators.triangles import triangle_count

    return triangle_count(lineitem_edges(spark, sf_dir))


def _q_r_hop(spark, sf_dir):
    """Radius-bounded BFS ball (collectRNeighborhood, T6) from seeds id<5."""
    from sbm_communitydetection_spark.operators.frontier import r_hop_neighborhood

    edges = lineitem_edges(spark, sf_dir)
    seeds = edges.select(F.col("src").alias("id")).distinct().filter(F.col("id") < 5)
    return r_hop_neighborhood(edges, seeds, radius=2).select("id", "dist")


def _q_triangles_per_vertex(spark, sf_dir):
    from sbm_communitydetection_spark.operators.triangles import triangle_counts_per_vertex

    return triangle_counts_per_vertex(lineitem_edges(spark, sf_dir)).select("id", "tri_count")


# -- transcript extraction (input_hint pipeline, driver-gated) --------------


def _q_event_funnel(spark, sf_dir):
    """Strictly-ordered view->click->purchase conversion funnel."""
    from sbm_communitydetection_spark.operators.funnels import event_funnel

    return event_funnel(spark.read.parquet(f"{sf_dir}/events.parquet"))


def _q_retention_cohorts(spark, sf_dir):
    """Weekly retention matrix on integer epoch-week arithmetic."""
    from sbm_communitydetection_spark.operators.funnels import retention_cohorts

    return retention_cohorts(spark.read.parquet(f"{sf_dir}/events.parquet"))


def _q_latency_quantiles(spark, sf_dir):
    """Exact reply-gap p50/p90/p99 via histogram CDF (no global sort)."""
    from sbm_communitydetection_spark.operators.extract import latency_quantiles
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    return latency_quantiles(events_transcripts(spark, sf_dir))


def _q_tool_chains(spark, sf_dir):
    """Frequent length-2 tool-call sequences (agent trajectory mining)."""
    from sbm_communitydetection_spark.operators.extract import tool_chains
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    return tool_chains(events_transcripts(spark, sf_dir), n=2, min_count=2)


def _q_agent_loops(spark, sf_dir):
    """Stuck-agent detector: max consecutive same-tool run per conv×tool."""
    from sbm_communitydetection_spark.operators.extract import agent_loops
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    return agent_loops(events_transcripts(spark, sf_dir), min_repeats=2)


def _q_sbm_block_matrix(spark, sf_dir):
    """k×k SBM connectivity-matrix MLE given the derived partition."""
    from sbm_communitydetection_spark.functions.metrics import sbm_block_matrix

    edges, pred, _ = _metric_partitions(spark, sf_dir)
    return sbm_block_matrix(edges, pred)


def _q_eigenvector(spark, sf_dir):
    """Fixed-iteration power-iteration eigenvector centrality (mean-1 norm)."""
    from sbm_communitydetection_spark.operators.katz import eigenvector_centrality
    from sbm_communitydetection_spark.sources.tpch_graph import lineitem_directed_edges

    return eigenvector_centrality(spark, lineitem_directed_edges(spark, sf_dir))


def _q_ngram_coverage(spark, sf_dir):
    """Held-out-split n-gram coverage by the train split (leakage dual)."""
    return TA.ngram_coverage(_docs(spark, sf_dir))


def _q_semdedup(spark, sf_dir):
    """SemDeDup semantic dedup: centroid-cell rank + better-ranked cosine."""
    return TS.semdedup(_embs(spark, sf_dir), threshold=SEMDEDUP_THRESHOLD)


def _q_node_overlap(spark, sf_dir):
    """Q6 greedy max-intersection matching accuracy — Spark computes the
    k×k contingency, the greedy scan is driver-side on that tiny table
    (mirroring the reference); gated vs an unrolled greedy-pick oracle."""
    from sbm_communitydetection_spark.functions.metrics import node_overlap_accuracy

    _, pred, truth = _metric_partitions(spark, sf_dir)
    v = node_overlap_accuracy(pred, truth)
    return spark.createDataFrame([(round(v, 6),)], "node_overlap double")


def _q_symmetric_difference(spark, sf_dir):
    """Q2 greedy-matched symmetric difference / n."""
    from sbm_communitydetection_spark.functions.metrics import symmetric_difference

    _, pred, truth = _metric_partitions(spark, sf_dir)
    v = symmetric_difference(pred, truth)
    return spark.createDataFrame([(round(v, 6),)], "symmetric_difference double")


def _q_max_jaccard(spark, sf_dir):
    """Q7 greedy max-Jaccard matching, mean over max(k_t, k_p)."""
    from sbm_communitydetection_spark.functions.metrics import max_jaccard_sum

    _, pred, truth = _metric_partitions(spark, sf_dir)
    v = max_jaccard_sum(pred, truth)
    return spark.createDataFrame([(round(v, 6),)], "max_jaccard double")


STREAM_PR_BOUNDARIES = [250, 500, 750, 1001]
STREAM_PR_ITERS = 3


def _q_stream_pagerank(spark, sf_dir):
    """Warm-start batched PageRank: 4 cumulative prefixes of the ordered
    stream, carry-forward init, 3 power supersteps per batch."""
    from sbm_communitydetection_spark.streaming.stream_driver import stream_pagerank
    from sbm_communitydetection_spark.textops.portable import md5_long

    edges = lineitem_edges(spark, sf_dir).withColumn(
        "edge_seq",
        md5_long(F.concat_ws(":", F.col("src").cast("string"), F.col("dst").cast("string")))
        % 1000,
    )
    return stream_pagerank(
        spark, edges, boundaries=STREAM_PR_BOUNDARIES, iters_per_batch=STREAM_PR_ITERS
    )


def _q_matching_accuracy(spark, sf_dir):
    """Q9 optimal (Hungarian) assignment accuracy — gated vs an unrolled
    assignment-DP oracle (exact optimum, no greedy)."""
    from sbm_communitydetection_spark.functions.metrics import maximal_matching_accuracy

    _, pred, truth = _metric_partitions(spark, sf_dir)
    v = maximal_matching_accuracy(pred, truth)
    return spark.createDataFrame([(round(v, 6),)], "matching_accuracy double")


def _q_butterflies(spark, sf_dir):
    """Bipartite 4-cycle count over the actor×tool incidence graph."""
    from sbm_communitydetection_spark.operators.triangles import butterfly_count
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    t = events_transcripts(spark, sf_dir).filter(F.col("tool").isNotNull())
    inc = t.select(F.col("role").alias("left"), F.col("tool").alias("right"))
    return butterfly_count(inc)


def _q_conv_entropy(spark, sf_dir):
    """Role-distribution Shannon entropy per conversation (diversity cut)."""
    from sbm_communitydetection_spark.operators.extract import conv_entropy
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    return conv_entropy(events_transcripts(spark, sf_dir))


def _q_conv_stats(spark, sf_dir):
    from sbm_communitydetection_spark.operators.extract import conv_stats
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    return conv_stats(events_transcripts(spark, sf_dir))


def _q_role_transitions(spark, sf_dir):
    from sbm_communitydetection_spark.operators.extract import role_transitions
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    return role_transitions(events_transcripts(spark, sf_dir))


def _q_transcript_edges(spark, sf_dir):
    """Full transcripts→link-graph extraction (operators/extract.py) over
    the events-derived transcript table; ids mapped back to string actor
    keys so the DuckDB oracle (no xxhash64) can mirror it exactly."""
    from sbm_communitydetection_spark.operators.extract import extract_edges, extract_vertices
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    t = events_transcripts(spark, sf_dir)
    edges, verts = extract_edges(t), extract_vertices(t)
    return (
        edges.join(
            F.broadcast(verts.select(F.col("id").alias("src"), F.col("actor_key").alias("src_key"))),
            "src",
        )
        .join(
            F.broadcast(verts.select(F.col("id").alias("dst"), F.col("actor_key").alias("dst_key"))),
            "dst",
        )
        .select("src_key", "dst_key", "weight")
    )


def _q_turn_text(spark, sf_dir):
    """Per-turn text equality under stable turn ordering (input_hint
    invariant): text must survive the actor-annotation step byte-identical."""
    from sbm_communitydetection_spark.operators.extract import extract_turn_actors
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    return extract_turn_actors(events_transcripts(spark, sf_dir)).select(
        "conv_id", "turn_idx", "text"
    )


# -- graph DML / coarsening -------------------------------------------------


def _q_conductance(spark, sf_dir):
    edges = lineitem_edges(spark, sf_dir)
    return G.conductance(edges, derived_labels(edges)).select(
        "label", F.round("conductance", 8).alias("conductance")
    )


def _q_rich_club(spark, sf_dir):
    """Rich-club coefficient at exponentially spaced degree cuts."""
    return G.rich_club(lineitem_edges(spark, sf_dir))


def _q_graph_summary(spark, sf_dir):
    return G.graph_summary(lineitem_edges(spark, sf_dir)).select(
        "n_vertices",
        "n_edges",
        "max_degree",
        F.round("avg_degree", 8).alias("avg_degree"),
        F.round("density", 8).alias("density"),
    )


def _q_decayed_reply_edges(spark, sf_dir):
    """Recency-decayed reply-link extraction (half-life DECAY_HALF_LIFE_MS)."""
    from sbm_communitydetection_spark.operators.extract import decayed_reply_edges
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    return decayed_reply_edges(
        events_transcripts(spark, sf_dir), half_life_ms=DECAY_HALF_LIFE_MS
    )


def _q_actor_communities(spark, sf_dir):
    """Axis-A×B composition: exact connected components over the extracted
    transcript actor graph (string keys end-to-end)."""
    from sbm_communitydetection_spark.operators.components import connected_components
    from sbm_communitydetection_spark.operators.extract import extract_edges, extract_vertices
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    t = events_transcripts(spark, sf_dir)
    edges, verts = extract_edges(t), extract_vertices(t)
    keyed = (
        edges.join(
            F.broadcast(verts.select(F.col("id").alias("src"), F.col("actor_key").alias("sk"))),
            "src",
        )
        .join(
            F.broadcast(verts.select(F.col("id").alias("dst"), F.col("actor_key").alias("dk"))),
            "dst",
        )
        .select(F.col("sk").alias("src"), F.col("dk").alias("dst"), "weight")
    )
    return connected_components(spark, keyed).select("id", "component")


def _q_curation_keep_list(spark, sf_dir):
    """End-to-end curation decision: quality filter × near-dup
    survivorship × stratified sampling, with per-stage audit flags."""
    from sbm_communitydetection_spark.textops.pipeline import curation_keep_list

    return curation_keep_list(
        spark, _docs(spark, sf_dir), quality_min=QUALITY_MIN, rates_permille=SAMPLE_RATES
    )


def _q_transcript_structural_dups(spark, sf_dir):
    """Axis-B transcript curation: templated-conversation detection —
    MinHash-LSH near-dup over each conversation's STRUCTURAL fingerprint
    (turn-ordered role[:tool] token sequence), so scripted flows are
    caught before sampling even when per-turn text differs."""
    from sbm_communitydetection_spark.operators.extract import conv_structure_docs
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    docs = conv_structure_docs(events_transcripts(spark, sf_dir))
    return TD.minhash_lsh_dup_pairs(
        docs, threshold=STRUCT_DUP_THRESHOLD, rows_per_band=STRUCT_DUP_ROWS_PER_BAND
    )


def _q_reply_reciprocity(spark, sf_dir):
    """Weighted reciprocity of the directed reply graph — is the traffic
    mutual (dialogue) or broadcast-shaped? One scalar over the
    role-transition aggregate."""
    from sbm_communitydetection_spark.operators.extract import reply_reciprocity
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    return reply_reciprocity(events_transcripts(spark, sf_dir))


def _q_transcript_token_stats(spark, sf_dir):
    """Token counting over the transcripts payload itself (per turn) —
    the tokenizer-budget estimate a training pipeline runs before
    example assembly; doc_id = conv_id#turn_idx."""
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    t = events_transcripts(spark, sf_dir)
    docs = t.select(
        F.concat("conv_id", F.lit("#"), F.col("turn_idx").cast("string")).alias("doc_id"),
        "text",
    )
    return TA.token_stats(docs)


def _q_actor_scc(spark, sf_dir):
    """Strongly connected components over the DIRECTED role-transition
    graph — mutual-reply cores (who is in a genuine dialogue loop with
    whom), vs. actor_communities' undirected reachability."""
    from sbm_communitydetection_spark.operators.components import (
        strongly_connected_components,
    )
    from sbm_communitydetection_spark.operators.extract import role_transitions
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    d = role_transitions(events_transcripts(spark, sf_dir)).select(
        F.col("role_from").alias("src"), F.col("role_to").alias("dst")
    )
    return strongly_connected_components(spark, d)


def _q_condensation_layers(spark, sf_dir):
    """SCC condensation DAG of a mixed digraph (cyclic strata + strictly
    ordered cross-edges), each core stratified by its longest-path layer
    from the DAG sources — the scheduling order for per-SCC work."""
    from sbm_communitydetection_spark.operators.components import condensation_layers
    from sbm_communitydetection_spark.sources.tpch_graph import lineitem_mixed_digraph

    return condensation_layers(spark, lineitem_mixed_digraph(spark, sf_dir))


def _q_triad_census(spark, sf_dir):
    """Directed triad motifs of the role-transition digraph: cyclic
    (conversational loop) vs transitive (broadcast hierarchy) closed
    triples.  The shipped example passes the scale-safe hub cap
    (VERDICT r3 #5): wedge cost is quadratic in a hub's out-degree, so
    the gate-exposed query caps it at TRIAD_MAX_OUT_DEGREE on BOTH
    engines (a no-op on the role digraph's small degrees — values are
    unchanged — but callers copying this example inherit the guard)."""
    from sbm_communitydetection_spark.operators.extract import role_transitions
    from sbm_communitydetection_spark.operators.triangles import directed_triad_census
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    d = role_transitions(events_transcripts(spark, sf_dir)).select(
        F.col("role_from").alias("src"), F.col("role_to").alias("dst")
    )
    return directed_triad_census(d, max_out_degree=TRIAD_MAX_OUT_DEGREE)


def _q_reply_latency_stats(spark, sf_dir):
    """Reply-latency profile per directed role pair — same window pass
    as role_transitions with the inter-turn gap carried through."""
    from sbm_communitydetection_spark.operators.extract import reply_latency_stats
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    return reply_latency_stats(events_transcripts(spark, sf_dir))


def _q_tool_cooccurrence(spark, sf_dir):
    """Tool-affinity edge table: conversations invoking both tools, per
    unordered tool pair (keyed self-join — quadratic only within one
    conversation's distinct tool set)."""
    from sbm_communitydetection_spark.operators.extract import tool_cooccurrence
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    return tool_cooccurrence(events_transcripts(spark, sf_dir))


def _q_conv_influence(spark, sf_dir):
    """Axis-A×B composition #3: influence-weighted conversation scoring —
    actor PageRank over the extracted link graph, broadcast back onto the
    turn table, summed per conversation (the ranking half of an
    influence-aware training-mix keep rule)."""
    from sbm_communitydetection_spark.operators.extract import conv_influence
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    ranks = _q_user_influence(spark, sf_dir)
    return conv_influence(events_transcripts(spark, sf_dir), ranks)


TOPK_CONVS = 25


def _q_conv_keep_topk(spark, sf_dir):
    """The keep DECISION on top of conv_influence: top-K conversations by
    influence (deterministic conv_id tie-break). orderBy+limit compiles
    to TakeOrdered — per-partition top-K then a K-row driver merge, no
    global sort at any scale."""
    return (
        _q_conv_influence(spark, sf_dir)
        .orderBy(F.desc("influence"), "conv_id")
        .limit(TOPK_CONVS)
    )


def _q_session_stats(spark, sf_dir):
    """Time-gap sessionization (gap > SESSION_GAP_MS splits) + per-session
    rollup — the interaction-log preprocessing step (axis B)."""
    from sbm_communitydetection_spark.operators.extract import session_stats
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    return session_stats(events_transcripts(spark, sf_dir), gap_ms=SESSION_GAP_MS)


def _actor_keyed_edges(spark, sf_dir, before_ms=None):
    """Extracted, symmetrized transcript link graph on STRING actor keys
    (hashed ids joined back to keys so the DuckDB oracle mirrors).
    ``before_ms`` builds the graph as of that event-time instant."""
    from sbm_communitydetection_spark.operators.extract import extract_edges, extract_vertices
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    t = events_transcripts(spark, sf_dir, before_ms=before_ms)
    edges, verts = extract_edges(t), extract_vertices(t)
    return (
        edges.join(
            F.broadcast(verts.select(F.col("id").alias("src"), F.col("actor_key").alias("sk"))),
            "src",
        )
        .join(
            F.broadcast(verts.select(F.col("id").alias("dst"), F.col("actor_key").alias("dk"))),
            "dst",
        )
        .select(F.col("sk").alias("src"), F.col("dk").alias("dst"), "weight")
    )


LP_SPLIT_SQL = (
    md5_long_sql("concat(l_orderkey, ':', l_partkey)") + " % 5 <> 0"
)


def _q_linkpred_eval(spark, sf_dir):
    """Link-prediction eval protocol: hold out ~20% of lineitem
    interactions (portable hash coin), rank Adamic-Adar on the train
    graph, precision@{5,10,20} against the held-out edges."""
    from sbm_communitydetection_spark.operators.linkpred import linkpred_precision_at_k
    from sbm_communitydetection_spark.textops.portable import md5_long

    keep = (
        md5_long(F.concat_ws(":", F.col("l_orderkey"), F.col("l_partkey"))) % 5 != 0
    )
    train = lineitem_edges(spark, sf_dir, row_filter=keep)
    full = lineitem_edges(spark, sf_dir)
    return linkpred_precision_at_k(train, full)


def _q_actor_rank_drift(spark, sf_dir):
    """Temporal influence drift: PageRank over the actor graph AS OF the
    event-time midpoint vs over the full history — who is gaining or
    losing influence in the reply graph.  Pivot = (min+max epoch-ms)/2,
    computed identically in both engines; turn order is recomputed over
    the surviving early events (the snapshot as it actually stood)."""
    from sbm_communitydetection_spark.operators.pagerank import pagerank

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))  # NTZ + UTC session
    row = ev.agg(F.min(ms).alias("mn"), F.max(ms).alias("mx")).collect()[0]
    pivot = (row.mn + row.mx) // 2
    early = pagerank(
        spark,
        _actor_keyed_edges(spark, sf_dir, before_ms=pivot),
        damping=0.85,
        tolerance=-1.0,
        max_iterations=PR_ITERS,
    ).select("id", F.round("rank", 8).alias("rank_early"))
    full = pagerank(
        spark,
        _actor_keyed_edges(spark, sf_dir),
        damping=0.85,
        tolerance=-1.0,
        max_iterations=PR_ITERS,
    ).select("id", F.round("rank", 8).alias("rank_full"))
    return early.join(full, "id").select(
        "id",
        "rank_early",
        "rank_full",
        F.round(F.col("rank_full") - F.col("rank_early"), 8).alias("delta"),
    )


def _q_user_influence(spark, sf_dir):
    """Axis-A×B composition: fixed-iteration PageRank over the extracted
    transcript link graph (string actor keys) — 'who matters in the reply
    graph', the full extract→graph→algorithm pipeline in one query."""
    from sbm_communitydetection_spark.operators.pagerank import pagerank

    keyed = _actor_keyed_edges(spark, sf_dir)
    ranks = pagerank(spark, keyed, damping=0.85, tolerance=-1.0, max_iterations=PR_ITERS)
    return ranks.select("id", F.round("rank", 8).alias("rank"))


def _q_actor_lpa(spark, sf_dir):
    """Axis-A×B composition: synchronous weight-voting LPA over the
    extracted transcript actor graph (string keys, string labels —
    min-label tie-break is lexicographic in BOTH engines)."""
    from sbm_communitydetection_spark.operators.label_propagation import label_propagation

    res = label_propagation(
        spark,
        _actor_keyed_edges(spark, sf_dir),
        max_iterations=LPA_ITERS,
        variant="plain",
        tolerance=-1.0,
    )
    return res.state.select("id", "label")


COMM_REPS_K = 3
EDGE_SAMPLE_PERMILLE = 200


def _q_edge_sample(spark, sf_dir):
    """Deterministic uniform edge sampling (the documented lever for
    heavy motif queries) — portable-hash permille filter, no shuffle."""
    return G.sample_edges(
        lineitem_edges(spark, sf_dir), permille=EDGE_SAMPLE_PERMILLE
    ).select("src", "dst", "weight")


def _q_community_reps(spark, sf_dir):
    """Community summarization: top-K members per community by weighted
    degree (label-partitioned window rank, no global sort)."""
    edges = lineitem_edges(spark, sf_dir)
    return G.community_representatives(edges, derived_labels(edges), k=COMM_REPS_K)


def _q_community_stats(spark, sf_dir):
    edges = lineitem_edges(spark, sf_dir)
    return G.community_stats(edges, derived_labels(edges)).select("label", "e_in", "e_out", "size")


def _q_coarsen(spark, sf_dir):
    edges = lineitem_edges(spark, sf_dir)
    return G.coarsen(edges, derived_labels(edges)).select("src", "dst", "weight")


def _q_sync_communities(spark, sf_dir):
    """C2 incremental coarsen repair: disband labels {0,1}, repair the
    super-graph from the touched delta only; the oracle recomputes C1 from
    scratch under the post-disband labeling — equality proves the repair.
    (derived_labels satisfies the label-is-a-member-id invariant: vertex
    L has L % N_LABELS == L for L < N_LABELS.)"""
    edges = lineitem_edges(spark, sf_dir)
    labels = derived_labels(edges)
    coarse = G.coarsen(edges, labels)
    touched = labels.select("label").distinct().filter(F.col("label") < 2)
    repaired, _ = G.sync_communities(coarse, edges, labels, touched)
    return repaired.select("src", "dst", "weight")


def _q_canonical_relabel(spark, sf_dir):
    edges = lineitem_edges(spark, sf_dir)
    return G.canonical_relabel(derived_labels(edges)).select("id", "label")


def _q_edge_removal(spark, sf_dir):
    edges = lineitem_edges(spark, sf_dir)
    removals = edges.filter((F.col("src") * 31 + F.col("dst")) % 13 == 0)
    return G.remove_edges(edges, removals).select("src", "dst", "weight")


def _q_node_removal(spark, sf_dir):
    edges = lineitem_edges(spark, sf_dir)
    verts = edges.select(F.col("src").alias("id")).distinct()
    gone = verts.filter(F.col("id") % 97 == 0)
    _, e = G.remove_nodes(verts, edges, gone)
    return e.select("src", "dst", "weight")


def _q_edge_lookup(spark, sf_dir):
    edges = lineitem_edges(spark, sf_dir)
    verts = edges.select(F.col("src").alias("id")).distinct()
    probes = (
        verts.filter(F.col("id") < 5)
        .select(F.col("id").alias("src"))
        .crossJoin(verts.filter(F.col("id") < 20).select(F.col("id").alias("dst")))
    )
    return G.edge_weight_lookup(edges, probes).select("src", "dst", "weight")


# -- composite algorithm drivers (D1/D3/§2.10) gated on exact recovery ------
# The drivers themselves are not SQL-expressible, but on a strongly-
# separated planted-partition graph they recover the planted blocks
# EXACTLY, and after canonical relabel (C4) the truth is closed-form
# (sources/planted.py) — so the gate compares against a real DuckDB
# oracle instead of the r1/r2 rows-only check.  Workload-scale coverage
# of the same drivers lives in pytest (test_louvain, test_fm_refinement,
# test_streaming) and the bench.

from sbm_communitydetection_spark.operators.extract import (  # noqa: E402
    holdout_split_oracle_sql as _holdout_sql,
    pack_conversations_oracle_sql as _pack_sql,
)
from sbm_communitydetection_spark.sources.planted import (  # noqa: E402
    planted_truth_sql as _planted_sql,
)

PLANTED_N = 60
PLANTED_K = 3
PLANTED_P_IN_PM = 900
PLANTED_P_OUT_PM = 40
FM_N = 40
# BALANCED flip set (two nodes each direction): the FM kernel exchanges
# one node per side per swap, so side sizes are invariant — an unbalanced
# flip set would make the planted 20/20 partition unreachable.
FM_FLIPS = (3, 8, 15, 20)


def _q_louvain(spark, sf_dir):
    """DCD/Louvain multi-level modularity optimization (D1): exact planted
    recovery on the strong-separation config (scripts/overall_run.cpp:24-43
    semantics)."""
    from sbm_communitydetection_spark.operators.louvain import louvain
    from sbm_communitydetection_spark.sources.planted import planted_partition

    _, edges = planted_partition(spark, PLANTED_N, PLANTED_K, PLANTED_P_IN_PM, PLANTED_P_OUT_PM)
    res = louvain(spark, edges, max_levels=3, max_sweeps=12)
    return res.labels.select("id", "label")


def _q_fm_refine(spark, sf_dir):
    """ACD 2-way FM refinement (D3): starting from the planted 2-partition
    with a deterministic set of flipped nodes, one FM pass must move
    exactly the flipped nodes back (strong separation ⇒ the best move
    prefix is the flip set)."""
    from sbm_communitydetection_spark.operators.fm_refinement import fm_refine
    from sbm_communitydetection_spark.sources.planted import planted_partition

    verts, edges = planted_partition(spark, FM_N, 2, PLANTED_P_IN_PM, PLANTED_P_OUT_PM)
    start = verts.select(
        "id",
        F.when(F.col("id").isin(*FM_FLIPS), 1 - F.col("label"))
        .otherwise(F.col("label"))
        .cast("long")
        .alias("label"),
    )
    pairs = spark.createDataFrame([(0, 1)], "label_a long, label_b long")
    return fm_refine(spark, edges, start, pairs).select("id", "label")


def _q_stream_lpa(spark, sf_dir):
    """Batched edge-stream community tracking (§2.10): the final partition
    after consuming the planted graph's edge stream equals the planted
    partition (canonical relabel C4)."""
    from sbm_communitydetection_spark.sources.planted import planted_edge_stream
    from sbm_communitydetection_spark.streaming.stream_driver import stream_community_detection

    stream = planted_edge_stream(spark, PLANTED_N, PLANTED_K, PLANTED_P_IN_PM, PLANTED_P_OUT_PM)
    res = stream_community_detection(spark, stream, n_batches=2, supersteps_per_batch=10)
    return G.canonical_relabel(res.labels).select("id", "label")


PACK_BUDGET_TOKENS = 2048
SPLIT_VAL_PM = 50
SPLIT_TEST_PM = 50
STRATUM_TOPK = 3  # small so the quota BINDS at gate scale (~5 docs/stratum)


def _q_dpo_pairs(spark, sf_dir):
    """Preference-pair mining: same prompt, different responses, capped
    at 3 representatives per prompt before pairing."""
    from sbm_communitydetection_spark.operators.extract import dpo_pair_candidates

    return dpo_pair_candidates(ET.events_transcripts(spark, sf_dir), k_per_prompt=3)


def _q_conv_novelty(spark, sf_dir):
    """Cross-conversation bigram novelty (first-occurrence ownership by
    conversation start time) — templated-content curation signal."""
    from sbm_communitydetection_spark.operators.extract import conv_novelty
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    return conv_novelty(events_transcripts(spark, sf_dir))


def _q_stream_novelty(spark, sf_dir):
    """Streaming novelty fold: 5 start-ordered micro-batches through the
    owner store; union of emissions == the one-shot batch oracle."""
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts
    from sbm_communitydetection_spark.streaming.stream_novelty import stream_conv_novelty

    return stream_conv_novelty(spark, events_transcripts(spark, sf_dir), n_batches=5)


CTX_TURNS = 3


def _q_context_windows(spark, sf_dir):
    """Rolling ≤3-turn SFT context assembly (multi-turn generalization
    of prompt_response_pairs), one bounded window frame per turn."""
    from sbm_communitydetection_spark.operators.extract import context_windows
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    return context_windows(events_transcripts(spark, sf_dir), k=CTX_TURNS)


def _q_prompt_response_pairs(spark, sf_dir):
    """SFT pair extraction: adjacent cross-role turn pairs, text verbatim."""
    from sbm_communitydetection_spark.operators.extract import prompt_response_pairs
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    return prompt_response_pairs(events_transcripts(spark, sf_dir))


def _q_stratum_topk_sample(spark, sf_dir):
    """Fixed-quota per-stratum uniform sample (hash-ranked, WOR)."""
    return TA.stratum_topk_sample(_docs(spark, sf_dir), STRATUM_TOPK)


def _q_pack_conversations(spark, sf_dir):
    """Sequence packing: conv-level token budget assembly (axis B)."""
    from sbm_communitydetection_spark.operators.extract import pack_conversations
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    return pack_conversations(events_transcripts(spark, sf_dir), PACK_BUDGET_TOKENS)


def _q_holdout_split(spark, sf_dir):
    """Leakage-safe conversation-level train/val/test assignment."""
    from sbm_communitydetection_spark.operators.extract import holdout_split
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    return holdout_split(
        events_transcripts(spark, sf_dir), SPLIT_VAL_PM, SPLIT_TEST_PM
    )


def _q_repetition_stats(spark, sf_dir):
    """Gopher-style within-doc repetition signals (quality filtering)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    return TA.repetition_stats(docs)


def _q_stream_sessionize(spark, sf_dir):
    """applyInPandasWithState sessionizer (§2.10 custom stateful op): the
    transcript turns replayed in two ordered micro-batches; per-conv
    state (last_ms, session ordinal) carries across the drains, and the
    final output must equal the batch lag/running-sum sessionization
    (the DuckDB oracle)."""
    import shutil
    import tempfile

    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts
    from sbm_communitydetection_spark.streaming.stateful import stream_sessionize

    t = events_transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    base = tempfile.mkdtemp(prefix="spark_graft_sess_")
    try:
        import glob
        import os

        feed, out, ckpt = f"{base}/feed", f"{base}/out", f"{base}/ckpt"
        os.makedirs(feed)

        def land(df, name):
            # flat files in the feed dir (file-source listing semantics)
            staging = f"{base}/staging_{name}"
            df.coalesce(1).write.parquet(staging)
            shutil.copy(
                glob.glob(f"{staging}/part-*.parquet")[0], f"{feed}/{name}.parquet"
            )

        # two replay-ordered batches: all turn_idx < 2 first, the rest
        # second (per-conv order preserved — the ordering contract)
        land(t.filter(F.col("turn_idx") < 2), "b1")
        stream_sessionize(spark, feed, out, ckpt, SESSION_GAP_MS).awaitTermination()
        land(t.filter(F.col("turn_idx") >= 2), "b2")
        stream_sessionize(spark, feed, out, ckpt, SESSION_GAP_MS).awaitTermination()
        res = spark.read.parquet(out).select("conv_id", "turn_idx", "session_idx")
        res = res.localCheckpoint(eager=True)  # sever before cleanup
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return res


# -- skew path (salted join/aggregate — oracle = the PLAIN aggregation) -----


def _q_salted_a8(spark, sf_dir):
    from sbm_communitydetection_spark.operators.skew import (
        hub_vertices,
        salted_neighbor_community_weights,
    )

    edges = lineitem_edges(spark, sf_dir)
    labels = derived_labels(edges)
    hubs = hub_vertices(edges, degree_threshold=200.0)
    return salted_neighbor_community_weights(edges, labels, hubs).select(
        "src", "nbr_label", "score"
    )


# -- quality metrics (reference Q1-Q9, SQL-expressible subset) --------------


def _metric_partitions(spark, sf_dir):
    edges = lineitem_edges(spark, sf_dir)
    return edges, derived_labels(edges, N_LABELS), derived_labels(edges, N_TRUTH)


def _q_modularity(spark, sf_dir):
    from sbm_communitydetection_spark.functions.metrics import modularity

    edges, pred, _ = _metric_partitions(spark, sf_dir)
    return modularity(edges, pred).select(F.round("modularity", 8).alias("modularity"))


def _q_contingency(spark, sf_dir):
    from sbm_communitydetection_spark.functions.metrics import contingency

    _, pred, truth = _metric_partitions(spark, sf_dir)
    return contingency(pred, truth).select("t_label", "p_label", "cnt")


def _q_f1(spark, sf_dir):
    from sbm_communitydetection_spark.functions.metrics import pairwise_f1_df

    _, pred, truth = _metric_partitions(spark, sf_dir)
    return pairwise_f1_df(pred, truth)


def _q_embeddedness(spark, sf_dir):
    from sbm_communitydetection_spark.functions.metrics import embeddedness

    edges, pred, _ = _metric_partitions(spark, sf_dir)
    return embeddedness(edges, pred).select(F.round("embeddedness", 6).alias("embeddedness"))


def _q_edge_cls_acc(spark, sf_dir):
    from sbm_communitydetection_spark.functions.metrics import edge_classification_accuracy

    edges, pred, truth = _metric_partitions(spark, sf_dir)
    return edge_classification_accuracy(edges, pred, truth).select(
        F.round("edge_cls_acc", 8).alias("edge_cls_acc")
    )


def _q_log_likelihood(spark, sf_dir):
    from sbm_communitydetection_spark.functions.metrics import log_likelihood_df

    edges, pred, _ = _metric_partitions(spark, sf_dir)
    return log_likelihood_df(edges, pred)


def _q_nmi(spark, sf_dir):
    from sbm_communitydetection_spark.functions.metrics import nmi_df

    _, pred, truth = _metric_partitions(spark, sf_dir)
    return nmi_df(pred, truth)


def _q_modularity_density(spark, sf_dir):
    from sbm_communitydetection_spark.functions.metrics import modularity_variants

    edges, pred, _ = _metric_partitions(spark, sf_dir)
    return modularity_variants(edges, pred, use_split_penalty=True, use_density=True)


def _q_main_community(spark, sf_dir):
    edges = lineitem_edges(spark, sf_dir)
    return G.main_community(derived_labels(edges, N_LABELS))


# -- training-data pipeline: dedup ------------------------------------------


def _q_exact_dedup(spark, sf_dir):
    return TD.exact_dedup(_docs(spark, sf_dir))


BENCH_DOC_MOD = 20  # every 20th doc plays the "eval benchmark" corpus


def _q_decontamination(spark, sf_dir):
    """Eval-set decontamination: flag training docs sharing any word
    n-gram with the benchmark corpus (broadcast benchmark shingle set,
    inverted-index probe on the training side)."""
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % BENCH_DOC_MOD == 0)
    train = docs.filter(F.col("doc_id") % BENCH_DOC_MOD != 0)
    return TD.decontamination_flags(train, bench)


def _q_bloom_decontamination(spark, sf_dir):
    """Decontamination against a Bloom bitset of the benchmark shingles
    — the fixed-size scale path; flags (incl. false positives) are
    deterministic integer math, identical in both engines."""
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % BENCH_DOC_MOD == 0)
    train = docs.filter(F.col("doc_id") % BENCH_DOC_MOD != 0)
    return TD.bloom_decontamination(train, bench)


def _q_pii_scrub(spark, sf_dir):
    """Redaction pass with audit counts. The synthetic corpus carries no
    PII, so deterministic email/number spans are injected into every
    third doc first — the injection is part of the query (mirrored in
    the oracle), the operator itself is generic."""
    sid = F.col("doc_id").cast("string")
    injected = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                "text",
                F.lit(" reach me at user"),
                sid,
                F.lit("@example.com or 55512"),
                sid,
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return TA.pii_scrub(injected)


def _q_ngram_jaccard(spark, sf_dir):
    return TD.ngram_jaccard_pairs(_docs(spark, sf_dir))


def _q_minhash_sig(spark, sf_dir):
    return TD.minhash_signatures(_docs(spark, sf_dir))


def _q_minhash_lsh(spark, sf_dir):
    return TD.minhash_lsh_dup_pairs(_docs(spark, sf_dir))


def _q_cross_source_dup_matrix(spark, sf_dir):
    """Train/eval leakage signal: near-dup pair counts per source pair."""
    return TD.cross_source_dup_matrix(_docs(spark, sf_dir))


def _q_near_dup_clusters(spark, sf_dir):
    return TD.near_dup_clusters(spark, _docs(spark, sf_dir))


def _q_stream_dedup(spark, sf_dir):
    """Incremental LSH dedup over 3 arrival batches; the union of
    per-batch emissions must equal the one-shot batch LSH SQL oracle —
    the exactly-once cross-batch guarantee, driver-checked."""
    from pyspark.sql import functions as F

    from sbm_communitydetection_spark.textops.stream_dedup import stream_minhash_dedup

    docs = _docs(spark, sf_dir)
    batches = [docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == i) for i in range(3)]
    return stream_minhash_dedup(spark, batches)


def _q_simhash(spark, sf_dir):
    return TD.simhash(_docs(spark, sf_dir))


def _q_simhash_pairs(spark, sf_dir):
    return TD.simhash_dup_pairs(_docs(spark, sf_dir))


def _q_cos_dup_pairs(spark, sf_dir):
    return TD.embedding_cosine_dup_pairs(_embs(spark, sf_dir), COS_DUP_THRESHOLD)


def _q_simhash_banded_pairs(spark, sf_dir):
    # scale path; oracle is the EXACT all-pairs SQL at the same max_hamming
    # (banded recall is total by the pigeonhole guarantee)
    return TD.simhash_banded_dup_pairs(_docs(spark, sf_dir), max_hamming=3)


def _q_cos_bucketed_dup_pairs(spark, sf_dir):
    # scale path; oracle is the EXACT all-pairs threshold join. probes=5:
    # the 0.35 threshold admits pairs ~70° apart, so half the 10 cells
    # must be probed for total recall (see cosine_bucketed_dup_pairs doc)
    return TD.cosine_bucketed_dup_pairs(_embs(spark, sf_dir), COS_DUP_THRESHOLD, n_probes=5)


# -- training-data pipeline: similarity search ------------------------------


def _q_ann_topk(spark, sf_dir):
    return TS.cosine_topk(_embs(spark, sf_dir), ANN_K)


def _q_ivf_topk(spark, sf_dir):
    return TS.ivf_topk(_embs(spark, sf_dir), ANN_K)


def _q_quantize_embeddings(spark, sf_dir):
    """Symmetric per-vector int8 quantization of the embedding store
    (4x compression for the ANN path) with the reconstruction audit.
    Codes are pos-exploded for the gate (the value hash stringifies
    array cells engine-dependently); the operator itself returns the
    array column."""
    q = TS.quantize_embeddings(_embs(spark, sf_dir))
    return q.select(
        "vec_id", "scale", "max_abs_err", F.posexplode("codes").alias("pos", "code")
    )


# -- training-data pipeline: text analysis ----------------------------------

# Fixed Count-Min probe list: known corpus vocabulary plus one absent
# token ('zebra') proving the exact-or-over guarantee includes 0.
CMS_CANDIDATES = ["table", "row", "scan", "value", "spark", "zebra", "join", "window"]


def _q_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct-bigram estimate per source — no distinct
    shuffle; the oracle folds the identical 64 registers in DuckDB."""
    from sbm_communitydetection_spark.textops import sketches as SK

    return SK.hll_distinct(_docs(spark, sf_dir))


def _q_cms_heavy_hitters(spark, sf_dir):
    """Count-Min probe of a fixed candidate token list (d=3, w=256)."""
    from sbm_communitydetection_spark.textops import sketches as SK

    return SK.cms_probe(_docs(spark, sf_dir), CMS_CANDIDATES)


def _q_priority_sample(spark, sf_dir):
    """Weight-proportional per-source k-sample (priority sampling)."""
    from sbm_communitydetection_spark.textops import sketches as SK

    return SK.priority_sample(_docs(spark, sf_dir), k=5)


def _q_token_stats(spark, sf_dir):
    return TA.token_stats(_docs(spark, sf_dir))


def _q_top_ngrams(spark, sf_dir):
    return TA.top_ngrams(_docs(spark, sf_dir), k=TOPNGRAM_K)


def _q_tfidf_topk(spark, sf_dir):
    return TA.tfidf_topk(_docs(spark, sf_dir), k=TFIDF_K)


def _q_stratum_counts(spark, sf_dir):
    """Data-mixing audit: deterministic per-language downsampling
    (SAMPLE_RATES ‰), per-(lang, source) kept/total counts."""
    return TA.stratum_counts(_docs(spark, sf_dir), SAMPLE_RATES)


MIX_BUDGET = 250  # docs drawn by the α=0.5 temperature mix at gate scale


def _q_mixture_weights(spark, sf_dir):
    """α=0.5 temperature data-mixing weights + integer keep rates per
    (lang, source) stratum — exact integer arithmetic both engines."""
    return TA.mixture_weights(_docs(spark, sf_dir), MIX_BUDGET)


def _q_temperature_sample(spark, sf_dir):
    """The deterministic doc draw at the mixture_weights rates."""
    return TA.temperature_sample(_docs(spark, sf_dir), MIX_BUDGET)


def _q_ngram_lm_score(spark, sf_dir):
    """Corpus-trained bigram-LM quality score per doc (CCNet-style)."""
    return TA.ngram_lm_score(_docs(spark, sf_dir))


DSIR_TARGET_PERMILLE = 50


def _q_dsir_importance(spark, sf_dir):
    """DSIR importance log-weights; the gate's 'target domain' is a
    deterministic 5% doc_id coin (production passes the benchmark
    corpus as the target side)."""
    from sbm_communitydetection_spark.textops.portable import md5_long

    docs = _docs(spark, sf_dir)
    coin = md5_long(F.concat_ws(":", F.lit("dsir"), F.col("doc_id").cast("string"))) % 1000
    return TA.dsir_importance(docs, docs.filter(coin < DSIR_TARGET_PERMILLE))


def _q_token_pmi(spark, sf_dir):
    """Adjacent-bigram PMI collocations (min_count guards PMI noise)."""
    return TA.token_pmi(_docs(spark, sf_dir), min_count=20)


def _q_label_centroids(spark, sf_dir):
    """Per-label element-wise embedding mean (the IVF coarse quantizer
    table), pos-exploded so values hash identically across engines."""
    return TS.label_centroids(_embs(spark, sf_dir))


def _q_quality_lr_fit(spark, sf_dir):
    """Full-batch GD logistic fit (is-English on length features) —
    one map-side-combinable aggregate per step, 3 scalar floats to the
    driver per step, unrolled-CTE oracle walks the same trajectory."""
    return TA.quality_lr_fit(_docs(spark, sf_dir))


def _q_coreness(spark, sf_dir):
    """Full core decomposition via grouped h-index iteration — one run
    yields every vertex's core number (kcore.py:coreness); fixed-round
    gate parity vs the unrolled twin."""
    from sbm_communitydetection_spark.operators.kcore import coreness

    return coreness(spark, lineitem_edges(spark, sf_dir), rounds=CORENESS_ROUNDS)


def _q_wl_refinement(spark, sf_dir):
    """Weisfeiler-Lehman color refinement (structural fingerprints) —
    commutative-hash neighbor fold instead of sorted-concat, so a hub's
    color update is a map-side-combinable SUM (operators/wl.py)."""
    return WL.wl_refinement(spark, lineitem_edges(spark, sf_dir), rounds=WL_ROUNDS)


def _q_bm25_topk(spark, sf_dir):
    """Okapi BM25 top-k retrieval: deterministic query subset (doc_id %
    97 == 3) scored against the whole corpus; df computed for query
    terms only (broadcast semi-join), per-query window top-k."""
    docs = _docs(spark, sf_dir)
    qs = docs.filter(F.col("doc_id") % 97 == 3).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    return BM.bm25_topk(docs, qs, k=10)


def _q_readability_scores(spark, sf_dir):
    """Flesch reading-ease per document — three JVM regex passes."""
    return TA.readability_scores(_docs(spark, sf_dir))


def _q_influence_seeds(spark, sf_dir):
    """DegreeDiscount influence-maximization seed selection (k=5)."""
    return G.influence_seeds(lineitem_edges(spark, sf_dir), k=5)


# 3%: on the ~113-avg-degree gate graph the 5 hub seeds light their
# neighborhoods over several rounds without trivially flooding — 300‰
# froze at the seed set (recorded), which exercised no propagation
CASCADE_THETA_PM = 30
CASCADE_ROUNDS = 4


def _q_threshold_cascade(spark, sf_dir):
    """Linear-threshold cascade from the top-5-degree seed set — exact
    integer activation test, 4 unrolled rounds."""
    e = lineitem_edges(spark, sf_dir)
    nbrs = e.filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    seeds = (
        nbrs.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("d"))
        .orderBy(F.desc("d"), F.asc("id"))
        .limit(5)
        .select("id")
    )
    return G.threshold_cascade(
        e, seeds, theta_permille=CASCADE_THETA_PM, rounds=CASCADE_ROUNDS
    )


def _q_containment_pairs(spark, sf_dir):
    """Broder asymmetric containment dedup pairs (|∩|/|S_a| ≥ 0.6)."""
    return TD.containment_pairs(_docs(spark, sf_dir))


def _q_knn_graph_clusters(spark, sf_dir):
    """Mutual-kNN graph clustering: cosine ranking → mutual edges →
    north-star connected components; singletons keep their own id."""
    return TS.knn_graph_clusters(_embs(spark, sf_dir), k=5)


TRUSS_ROUNDS = 3


def _q_trussness(spark, sf_dir):
    """Full truss decomposition (edge h-index iteration), gate-parity
    mode: exactly TRUSS_ROUNDS synchronous rounds, twin-unrolled."""
    return KC.trussness(lineitem_edges(spark, sf_dir), rounds=TRUSS_ROUNDS)


def _q_label_assortativity(spark, sf_dir):
    """Newman's categorical assortativity (homophily scalar) over the
    derived label partition."""
    e = lineitem_edges(spark, sf_dir)
    return G.label_assortativity(e, derived_labels(e))


def _q_cluster_silhouette(spark, sf_dir):
    """Simplified (centroid-based) silhouette per vector over the gated
    kmeans_lloyd clustering — the O(n·k) quantizer-quality audit."""
    return TS.cluster_silhouette(_embs(spark, sf_dir))


def _q_bpe_train(spark, sf_dir):
    """Distributed BPE merge learning: 8 merges over the corpus's
    frequency-weighted distinct-word table."""
    from sbm_communitydetection_spark.textops.bpe import bpe_train

    return bpe_train(_docs(spark, sf_dir))


def _q_bpe_fertility(spark, sf_dir):
    """Tokenizer fertility audit: apply the 8 learned BPE merges to the
    corpus, per-doc token count and tokens-per-word."""
    from sbm_communitydetection_spark.textops.bpe import bpe_apply, bpe_train

    docs = _docs(spark, sf_dir)
    merges = [
        (r.left_sym, r.right_sym)
        for r in bpe_train(docs).orderBy("merge_idx").collect()
    ]
    return bpe_apply(docs, merges)


def _q_retrieval_metrics(spark, sf_dir):
    """recall@k / MRR@k / nDCG@k of the cosine ranking against label
    agreement — the per-refresh embedding-quality eval card."""
    return TS.retrieval_metrics(_embs(spark, sf_dir), k=10)


def _q_conv_prefix_dups(spark, sf_dir):
    """Templated-opening detection: maximal exact shared turn-prefix
    depth per conversation via 60-bit rolling chain hashes."""
    from sbm_communitydetection_spark.operators.extract import conv_prefix_dups

    return conv_prefix_dups(ET.events_transcripts(spark, sf_dir))


def _q_fastrp_embeddings(spark, sf_dir):
    """FastRP node embeddings, exact-integer variant: 2 hops of A·R
    over the symmetrized graph, dims=8, final L2-normalized loadings."""
    from sbm_communitydetection_spark.operators.fastrp import fastrp_embeddings

    return fastrp_embeddings(lineitem_edges(spark, sf_dir))


def _q_winnowing_fingerprints(spark, sf_dir):
    """MOSS winnowing fingerprints per document — window-min selection
    over word-shingle hashes, exchange-free JVM array math."""
    return TA.winnowing_fingerprints(_docs(spark, sf_dir))


def _q_knn_label_disagreement(spark, sf_dir):
    """Label-noise screen: vectors whose 5 nearest cosine neighbors
    nearly all carry a different label."""
    return TS.knn_label_disagreement(_embs(spark, sf_dir), k=5, max_agree=1)


def _q_event_anomalies(spark, sf_dir):
    """Per-user activity bursts: exact-integer z-test over hourly
    event-time windows against the user's own baseline."""
    return FN.event_anomalies(
        spark.read.parquet(f"{sf_dir}/events.parquet"), z=2, min_windows=5
    )


def _q_rrf_fused_topk(spark, sf_dir):
    """Hybrid retrieval: RRF fusion of the BM25 lexical ranking and the
    embedding-cosine semantic ranking for the deterministic query set."""
    from sbm_communitydetection_spark.textops.fusion import rrf_fused_topk

    docs = _docs(spark, sf_dir)
    qs = docs.filter(F.col("doc_id") % 97 == 3).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    return rrf_fused_topk(docs, _embs(spark, sf_dir), qs, k=10, depth=20)


def _q_four_clique_count(spark, sf_dir):
    """K4 motif count: oriented triangle list extended from its
    degeneracy-bounded lowest vertex, two semi-join closure checks."""
    from sbm_communitydetection_spark.operators.triangles import four_clique_count

    return four_clique_count(lineitem_edges(spark, sf_dir))


def _q_hard_negative_pairs(spark, sf_dir):
    """Contrastive hard-negative mining: coarse-band SimHash collisions
    that verify as non-duplicates (4 <= hamming <= 20)."""
    return TD.hard_negative_pairs(
        _docs(spark, sf_dir), min_hamming=4, max_hamming=20, n_bands=4
    )


def _q_split_leakage(spark, sf_dir):
    """Cross-split near-dup contamination audit: banded-SimHash pairs
    whose members drew different train/val/test coins."""
    return TP.split_leakage(_docs(spark, sf_dir), max_hamming=3)


def _q_partition_quality(spark, sf_dir):
    """Per-partition cut/balance/communication-volume audit of a
    portable-hash vertex layout over the link graph."""
    from sbm_communitydetection_spark.operators.partition_audit import (
        hash_partition_assignment,
        partition_quality,
    )

    e = lineitem_edges(spark, sf_dir)
    return partition_quality(e, hash_partition_assignment(e, num_parts=8))


def _q_turn_segments(spark, sf_dir):
    """TextTiling-style topic segmentation: consecutive-turn token
    Jaccard below 0.1 opens a new segment; per-segment rollup."""
    from sbm_communitydetection_spark.operators.extract import turn_segments
    from sbm_communitydetection_spark.sources.events_transcripts import events_transcripts

    return turn_segments(events_transcripts(spark, sf_dir), threshold=0.1)


def _q_textrank_keywords(spark, sf_dir):
    """TextRank corpus keywords: vocabulary-bounded co-occurrence graph
    (one corpus pass), fixed-iteration weighted PageRank via the
    full-scale operator, rounded-then-ranked top-k."""
    return TR.textrank_keywords(spark, _docs(spark, sf_dir), k=50, n_iterations=5)


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _q_source_health(spark, sf_dir):
    """Per-source corpus health card (volume, exact-dup burden, quality,
    token length, plurality language) — the read-before-mixing rollup,
    composing the gated dedup/quality primitives."""
    return TP.source_health_report(_docs(spark, sf_dir))


def _q_event_transitions(spark, sf_dir):
    """Per-user behavioral Markov chain over event types — one
    user-keyed window + a type-pair count."""
    from sbm_communitydetection_spark.operators.funnels import event_transitions

    return event_transitions(_events(spark, sf_dir))


def _q_props_field_stats(spark, sf_dir):
    """Semi-structured props handling: JSON field extract in whole-stage
    codegen, aggregate per event type."""
    from sbm_communitydetection_spark.operators.funnels import props_field_stats

    return props_field_stats(_events(spark, sf_dir))


def _q_source_log_odds(spark, sf_dir):
    """Fightin'-Words distinctive terms per source: prior-shrunk
    log-odds z, top-k per source (raw frequency would return
    stopwords) — the corpus-comparison / drift-fingerprint op."""
    return TA.source_log_odds(_docs(spark, sf_dir))


def _q_community_evolution(spark, sf_dir):
    """Dynamic community tracking: match each old community to the new
    community holding most of its members (two deterministic snapshot
    labelings: id %% 10 vs id %% 7), classify continue/shrink/split."""
    from sbm_communitydetection_spark.functions.metrics import community_evolution

    edges = lineitem_edges(spark, sf_dir)
    old = derived_labels(edges, n_labels=10)
    new = derived_labels(edges, n_labels=7)
    return community_evolution(old, new)


def _q_triangle_estimate(spark, sf_dir):
    """DOULION sampled triangle estimate — canonical-pair coin, exact
    1/p^3 scaling, reproducible and oracle-checkable."""
    from sbm_communitydetection_spark.operators.triangles import (
        triangle_estimate_sampled,
    )

    return triangle_estimate_sampled(lineitem_edges(spark, sf_dir))


def _q_span_corruption(spark, sf_dir):
    """T5-style RNG-free span-corruption mask selection — portable coin
    per (doc, span) so denoising targets regenerate anywhere."""
    return TA.span_corruption_spans(_docs(spark, sf_dir))


def _q_chunk_windows(spark, sf_dir):
    """Fixed-size token chunking with stride (retrieval-corpus /
    pretraining prep) — pure per-row JVM array math, one explode."""
    return TA.chunk_windows(_docs(spark, sf_dir))


def _q_edge_embeddedness(spark, sf_dir):
    """Per-edge embeddedness (common neighbors + neighborhood Jaccard)
    — the weak-tie / bridge-detection metric card at edge granularity."""
    from sbm_communitydetection_spark.operators.triangles import edge_embeddedness

    return edge_embeddedness(lineitem_edges(spark, sf_dir))


def _q_coverage_select(spark, sf_dir):
    """Greedy max-cover exemplar selection (facility-location recipe for
    training-subset picking): k rounds, each one covered-set anti-join +
    a scalar argmax; submodularity gives the (1-1/e) guarantee."""
    from sbm_communitydetection_spark.textops.dedup import coverage_select_topk

    return coverage_select_topk(_docs(spark, sf_dir))


MSF_ROUNDS = 4


def _q_msf(spark, sf_dir):
    """Boruvka minimum spanning forest — unique under the (w,a,b) total
    order, so the unrolled twin checks the exact edge set."""
    from sbm_communitydetection_spark.operators.spanning import minimum_spanning_forest

    return minimum_spanning_forest(spark, lineitem_edges(spark, sf_dir))


WALK_COOC_WINDOW = 2


def _q_walk_cooccurrence(spark, sf_dir):
    """Skip-gram pair counts over the deterministic walk corpus —
    embedding-training prep; lead()-based, no self-join on the engine
    side (the oracle's banded self-join is pair-set-identical)."""
    from sbm_communitydetection_spark.operators.walks import walk_cooccurrence

    return walk_cooccurrence(
        spark,
        lineitem_edges(spark, sf_dir),
        start_mod=WALK_START_MOD,
        walks_per_vertex=WALKS_PER_VERTEX,
        length=WALK_LENGTH,
        window=WALK_COOC_WINDOW,
    )


def _q_kmeans_lloyd(spark, sf_dir):
    """Fully distributed Lloyd k-means (the quantizer-training scale
    path): exploded-vector x broadcast-centroid assignment, rounded
    distances/centroids make the trajectory twin-exact."""
    from sbm_communitydetection_spark.textops.similarity import kmeans_lloyd

    return kmeans_lloyd(_embs(spark, sf_dir))


def _q_quality_lr_score(spark, sf_dir):
    """Inference side of the quality classifier: fitted weights come
    back as one driver row, scoring rides the scan as a pure per-row
    expression; p rounded to 6 dp before the keep threshold."""
    return TA.quality_lr_score(_docs(spark, sf_dir))


def _q_corpus_stats(spark, sf_dir):
    """One-row corpus health card (Zipf slope, hapax share, top1 mass)."""
    return TA.corpus_stats(_docs(spark, sf_dir))


def _q_boilerplate_strip(spark, sf_dir):
    """C4-style frequent-ngram strip (min_df=5 ≈ 1% of sf0.01 corpus)."""
    return TA.boilerplate_strip(_docs(spark, sf_dir), min_df=5)


def _q_text_quality(spark, sf_dir):
    return TA.text_quality(_docs(spark, sf_dir))


def _q_lang_id(spark, sf_dir):
    return TA.lang_id(_docs(spark, sf_dir))


def _q_doc_fingerprint(spark, sf_dir):
    return TA.doc_fingerprint(_docs(spark, sf_dir))


def _q_multimodal_decode(spark, sf_dir):
    return TM.decode_meta(TM.payload_table(_docs(spark, sf_dir)))


def _q_multimodal_resize(spark, sf_dir):
    return TM.resize_meta(TM.payload_table(_docs(spark, sf_dir)))


def _q_multimodal_frames(spark, sf_dir):
    return TM.frame_sample(TM.payload_table(_docs(spark, sf_dir)))


def _q_multimodal_features(spark, sf_dir):
    return TM.extract_features(TM.payload_table(_docs(spark, sf_dir)))


# --- session-7 wave: ANF/HyperBall, temporal reachability, Gopher rules,
# --- PQ, PPR sweep cut, spectral bisection -------------------------------


def _q_anf_profile(spark, sf_dir):
    """ANF neighborhood function (FM bitmask bit_or fold), rounds=3."""
    from sbm_communitydetection_spark.operators import anf as ANF

    return ANF.anf_profile(spark, lineitem_edges(spark, sf_dir), rounds=3)


def _q_effective_diameter(spark, sf_dir):
    from sbm_communitydetection_spark.operators import anf as ANF

    return ANF.effective_diameter(spark, lineitem_edges(spark, sf_dir), rounds=3)


def _q_hyperball_closeness(spark, sf_dir):
    """Per-vertex approximate harmonic centrality from the ANF sketches."""
    from sbm_communitydetection_spark.operators import anf as ANF

    return ANF.hyperball_closeness(spark, lineitem_edges(spark, sf_dir), rounds=2)


def _q_temporal_reachability(spark, sf_dir):
    """Earliest time-respecting arrival from the 'signup' actor."""
    from sbm_communitydetection_spark.operators import temporal as TEMP

    return TEMP.temporal_reachability(
        ET.events_transcripts(spark, sf_dir), ["signup"], rounds=4
    )


def _q_gopher_rule_flags(spark, sf_dir):
    return TA.gopher_rule_flags(_docs(spark, sf_dir))


def _q_pq_codes(spark, sf_dir):
    codes, _ = TS.pq_train(_embs(spark, sf_dir))
    return codes


def _q_pq_adc_topk(spark, sf_dir):
    return TS.pq_adc_topk(_embs(spark, sf_dir))


def _q_ppr_sweep_cut(spark, sf_dir):
    """ACL local-cluster sweep over the gated PPR trajectory."""
    from sbm_communitydetection_spark.operators.pagerank import ppr_sweep_cut

    edges = lineitem_edges(spark, sf_dir)
    members = edges.select(F.col("src").alias("id")).distinct().filter(
        F.pmod(F.col("id"), F.lit(PPR_SRC_MOD)) == 0
    )
    return ppr_sweep_cut(spark, edges, members, rounds=PR_ITERS)


def _q_spectral_bisection(spark, sf_dir):
    from sbm_communitydetection_spark.operators.spectral import spectral_bisection

    return spectral_bisection(spark, lineitem_edges(spark, sf_dir), iters=6)


def _q_actor_coparticipation(spark, sf_dir):
    """Bipartite projection of the actor×conversation incidence."""
    from sbm_communitydetection_spark.operators.extract import actor_coparticipation

    return actor_coparticipation(ET.events_transcripts(spark, sf_dir))


def _q_disparity_backbone(spark, sf_dir):
    """Serrano disparity-filter multiscale backbone of the lineitem graph."""
    from sbm_communitydetection_spark.operators.backbone import disparity_filter

    return disparity_filter(lineitem_edges(spark, sf_dir))


def _q_dcsbm_loglik(spark, sf_dir):
    """Degree-corrected SBM log-likelihood of the derived partition."""
    from sbm_communitydetection_spark.functions.metrics import dcsbm_loglik_df

    e = lineitem_edges(spark, sf_dir)
    return dcsbm_loglik_df(e, derived_labels(e))


CPC_PERMILLE = 100


def _cpc_sparsified_edges(spark, sf_dir):
    """Canonical-pair hash-sparsified lineitem graph (the greedy_coloring
    gate convention): one coin per UNDIRECTED pair so the kept subgraph
    is symmetric, mirrored verbatim in the oracle CTE."""
    e = lineitem_edges(spark, sf_dir).select("src", "dst")
    canon = e.filter(F.col("src") < F.col("dst"))
    kept = canon.filter(
        F.pmod(
            _cpc_coin(F.col("src"), F.col("dst")), F.lit(1000)
        )
        < CPC_PERMILLE
    )
    return kept.unionByName(
        kept.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).withColumn("weight", F.lit(1).cast("long"))


def _cpc_coin(a, b):
    from sbm_communitydetection_spark.textops.portable import md5_long

    return md5_long(F.concat_ws(":", F.lit("cp"), a.cast("string"), b.cast("string")))


def _q_percolation_curve(spark, sf_dir):
    """Bond-percolation giant-component curve (coupled thresholds)."""
    from sbm_communitydetection_spark.operators.components import percolation_curve

    return percolation_curve(spark, lineitem_edges(spark, sf_dir), permilles=(100, 300))


def _q_temporal_triangles(spark, sf_dir):
    """δ-temporal triangle motifs (cyclic vs feed-forward) over contacts."""
    from sbm_communitydetection_spark.operators import temporal as TEMP

    return TEMP.temporal_triangles(ET.events_transcripts(spark, sf_dir))


def _q_spectral_sweep_cut(spark, sf_dir):
    """Cheeger sweep over the Fiedler ordering of the gate graph."""
    from sbm_communitydetection_spark.operators.spectral import spectral_sweep_cut

    return spectral_sweep_cut(spark, lineitem_edges(spark, sf_dir), iters=6)


def _q_semantic_decontamination(spark, sf_dir):
    """Embedding-space benchmark-overlap flags (the paraphrase rung of
    the decontamination family)."""
    return TS.semantic_decontamination(_embs(spark, sf_dir))


def _q_tool_latency_attribution(spark, sf_dir):
    """Reply latency bucketed by previous-turn tool invocation."""
    return ET.tool_latency_attribution(ET.events_transcripts(spark, sf_dir))


def _q_conv_wl_kernel(spark, sf_dir):
    """WL subtree-kernel structural conversation similarity (rounds=1 at
    gate scale: radius-2 colors over a 5-role domain are already
    near-isomorphism classes — all-or-nothing sims — while radius-1
    keeps a graded similarity worth hashing)."""
    return WL.conv_wl_kernel(spark, ET.events_transcripts(spark, sf_dir), rounds=1)


def _q_matryoshka_recall(spark, sf_dir):
    """Matryoshka truncation eval card over the embedding store."""
    return TS.matryoshka_recall(_embs(spark, sf_dir))


def _q_burt_constraint(spark, sf_dir):
    """Burt structural-holes constraint per actor."""
    return G.burt_constraint(lineitem_edges(spark, sf_dir))


def _q_motif_spectral(spark, sf_dir):
    """Benson triangle-motif spectral bisection on the sparsified gate
    subgraph (the motif graph needs triangles; reuses the clique-
    percolation sparsifier so both motif gates see the same subgraph)."""
    from sbm_communitydetection_spark.operators.spectral import (
        motif_spectral_bisection,
    )

    return motif_spectral_bisection(spark, _cpc_sparsified_edges(spark, sf_dir))


def _q_degree_knn_curve(spark, sf_dir):
    """Pastor-Satorras average-nearest-neighbor-degree curve."""
    return G.degree_knn_curve(lineitem_edges(spark, sf_dir))


def _q_robustness_profile(spark, sf_dir):
    """Targeted hub-removal shatter curve (Albert-Jeong-Barabási)."""
    from sbm_communitydetection_spark.operators.components import robustness_profile

    return robustness_profile(spark, lineitem_edges(spark, sf_dir))


def _q_landmark_oracle_eval(spark, sf_dir):
    """Distance-oracle quality card: landmark sandwich vs exact probes."""
    from sbm_communitydetection_spark.operators.sssp import landmark_oracle_eval

    return landmark_oracle_eval(spark, lineitem_edges(spark, sf_dir), rounds=4)


def _q_rwr_topk(spark, sf_dir):
    """Per-seed random-walk-with-restart top-k similarity."""
    from sbm_communitydetection_spark.operators.pagerank import rwr_multi_seed

    return rwr_multi_seed(spark, lineitem_edges(spark, sf_dir), rounds=3)


def _q_clique_percolation(spark, sf_dir):
    """k=3 clique percolation (overlapping communities) on the
    hash-sparsified gate subgraph."""
    from sbm_communitydetection_spark.operators.triangles import (
        clique_percolation_communities,
    )

    return clique_percolation_communities(spark, _cpc_sparsified_edges(spark, sf_dir))


def _q_spectral_partition_quality(spark, sf_dir):
    """partition_quality audit of the spectral bisection — the measuring
    stick (edge cut / balance / comm volume) applied to the principled
    2-way layout, comparable side-by-side with the hash-layout
    `partition_quality` gate entry."""
    from sbm_communitydetection_spark.operators.spectral import spectral_bisection

    e = lineitem_edges(spark, sf_dir)
    assign = spectral_bisection(spark, e, iters=6).select(
        "id", F.col("side").alias("part")
    )
    return PA.partition_quality(e, assign)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.13 plus
    the training-data pipeline ops (textops/).

    ORDERING CONTRACT (VERDICT r2 #1, mechanized r4 per VERDICT r3 #6):
    the round driver records oracle rows for only the FIRST 50 entries.
    The _WINDOW_FIRST list below IS the window — edit it, not the
    literal's order.  Window priority (VERDICT r3 #1): (a) every op in
    _CHANGED_SINCE_VERIFIED — code or oracle changed since its last
    driver row (module-level assert enforces these are windowed);
    (b) entries with no driver CORRECTNESS row yet (judge-green only),
    weakest/newest evidence first.  _LAST_VERIFIED records each
    entry's most recent driver CORRECTNESS row (r1..r4) or judge
    driver_sim re-run (judge-r2..judge-r4 — the r4 VERDICT's
    full-suite 222/222 run upgraded every non-driver-rowed entry to
    judge-r4); tests/test_window.py audits the allocation
    mechanically."""
    d = {
        # NOTE: the literal's order below is historical (round-3 layout);
        # the served order is _WINDOW_FIRST + remainder.  Wave comments
        # describe when each entry landed, not current window membership.
        # (a0) session-7 wave — driver-checked r3 (CORRECTNESS_r03 50/50)
        "anf_profile": _q_anf_profile,  # FM-sketch neighborhood function
        "effective_diameter": _q_effective_diameter,  # ANF 0.9-coverage readout
        "hyperball_closeness": _q_hyperball_closeness,  # all-vertex harmonic est
        "temporal_reachability": _q_temporal_reachability,  # time-respecting BFS
        "gopher_rule_flags": _q_gopher_rule_flags,  # hard quality rule set
        "pq_codes": _q_pq_codes,  # product-quantization codebook assignment
        "pq_adc_topk": _q_pq_adc_topk,  # asymmetric-distance ANN top-k
        "ppr_sweep_cut": _q_ppr_sweep_cut,  # ACL local community sweep
        "spectral_bisection": _q_spectral_bisection,  # deflated power iteration
        "actor_coparticipation": _q_actor_coparticipation,  # bipartite projection
        "disparity_backbone": _q_disparity_backbone,  # multiscale edge backbone
        "dcsbm_loglik": _q_dcsbm_loglik,  # degree-corrected SBM model score
        "clique_percolation": _q_clique_percolation,  # overlapping communities
        "rwr_topk": _q_rwr_topk,  # per-seed random-walk-with-restart similarity
        "degree_knn_curve": _q_degree_knn_curve,  # degree-mixing curve
        "robustness_profile": _q_robustness_profile,  # hub-removal shatter curve
        "landmark_oracle_eval": _q_landmark_oracle_eval,  # distance-oracle card
        "matryoshka_recall": _q_matryoshka_recall,  # truncation eval card
        "burt_constraint": _q_burt_constraint,  # structural-holes brokerage
        "motif_spectral": _q_motif_spectral,  # triangle-motif spectral cut
        "conv_wl_kernel": _q_conv_wl_kernel,  # structural conversation retrieval
        "semantic_decontamination": _q_semantic_decontamination,  # paraphrase leaks
        "tool_latency_attribution": _q_tool_latency_attribution,  # tool stall audit
        "temporal_triangles": _q_temporal_triangles,  # δ-temporal motif census
        "spectral_sweep_cut": _q_spectral_sweep_cut,  # Cheeger sweep readout
        "percolation_curve": _q_percolation_curve,  # bond-percolation phases
        "spectral_partition_quality": _q_spectral_partition_quality,  # layout audit
        # (a) new-this-round oracles: planted exact-recovery gates replace
        # the rows-only checks for the composite drivers
        "greedy_coloring": _q_coloring,  # Jones–Plassmann, new this session
        "stream_triangles": _q_stream_triangles,  # incremental == full recount per batch
        "kmeans_lloyd": _q_kmeans_lloyd,  # distributed Lloyd, new this session
        "minimum_spanning_forest": _q_msf,  # Boruvka rounds, new this session
        "louvain_communities": _q_louvain,  # D1
        "fm_refine_pair": _q_fm_refine,  # D3
        "stream_lpa": _q_stream_lpa,  # §2.10
        # (a) new ops this round
        "stream_sessionize": _q_stream_sessionize,  # applyInPandasWithState
        "repetition_stats": _q_repetition_stats,  # Gopher repetition signals
        "pack_conversations": _q_pack_conversations,  # sequence packing
        "holdout_split": _q_holdout_split,  # leakage-safe split assignment
        "cc_incremental": _q_cc_incremental,  # delta-proportional CC repair
        "cc_decremental": _q_cc_decremental,  # affected-component-scoped repair
        "stream_cc": _q_stream_cc,  # micro-batch CC fold == full recompute
        "mixture_weights": _q_mixture_weights,  # α=0.5 temperature mix rates
        "temperature_sample": _q_temperature_sample,  # deterministic doc draw
        "ngram_lm_score": _q_ngram_lm_score,  # bigram-LM perplexity proxy
        "bloom_decontamination": _q_bloom_decontamination,  # bitset hygiene
        "prompt_response_pairs": _q_prompt_response_pairs,  # SFT pair extract
        "dpo_pairs": _q_dpo_pairs,  # preference-pair mining (new r3)
        "context_windows": _q_context_windows,  # multi-turn SFT assembly
        "conv_novelty": _q_conv_novelty,  # first-occurrence bigram ownership
        "stream_novelty": _q_stream_novelty,  # incremental fold == batch op
        "stratum_topk_sample": _q_stratum_topk_sample,  # per-stratum quota WOR
        "dsir_importance": _q_dsir_importance,  # hashed-ngram importance weights
        "node2vec_walks": _q_node2vec_walks,  # second-order biased walks
        "maximal_independent_set": _q_mis,  # Luby rounds, hash priorities
        "densest_subgraph": _q_densest_subgraph,  # parallel peeling approx
        "maximal_matching": _q_maximal_matching,  # mutual-min edge rounds
        "bipartite_check": _q_bipartite_check,  # double-cover CC composition
        "substring_dup_flags": _q_substring_dup_flags,  # char-kgram exact dedup
        "hll_distinct": _q_hll_distinct,  # portable HLL sketch (new r3)
        "cms_heavy_hitters": _q_cms_heavy_hitters,  # Count-Min probe (new r3)
        "priority_sample": _q_priority_sample,  # weighted k-sample (new r3)
        # (a) implementation changed this round (ADVICE/VERDICT fixes)
        "conv_influence": _q_conv_influence,  # left-join rank fix (ADVICE)
        "actor_scc": _q_actor_scc,  # SCC frontier-delta + convergence guard
        "seeded_lpa": _q_seeded_lpa,  # frozen-seed expansion (new r3)
        # (b) never driver-checked (r2 CORRECTNESS window ended at 50)
        # connected_components changed this round (partition-local
        # contraction + scale tuning) — VERDICT r2 item 4 wants its green
        # in CORRECTNESS_r03 by name; conductance (untouched since its r2
        # judge-era code, re-verified by this round's full driver_sim
        # builder runs) rotates out for it
        "connected_components": _q_components,
        "coarsen": _q_coarsen,  # C1
        "sync_communities": _q_sync_communities,  # C2
        "edge_removal": _q_edge_removal,  # G5
        "node_removal": _q_node_removal,  # G8
        "edge_weight_lookup": _q_edge_lookup,  # G6
        # quality metrics (nmi + density never had a driver row;
        # modularity/pairwise_f1 carry r1 driver greens and rotate out)
        "nmi": _q_nmi,  # normalized mutual information
        "modularity_density": _q_modularity_density,  # A5
        # training-data pipeline: dedup (ngram_jaccard_pairs carries an
        # r1 driver green and rotates out below)
        "minhash_lsh_dup_pairs": _q_minhash_lsh,
        "near_dup_clusters": _q_near_dup_clusters,  # LSH pairs → CC → canonical survivor
        "curation_keep_list": _q_curation_keep_list,  # quality × dedup × sampling decision
        "simhash_banded_dup_pairs": _q_simhash_banded_pairs,
        "decontamination_flags": _q_decontamination,  # eval-set n-gram hygiene
        # session-3 extras past the 50-entry window (driver_sim-verified
        # this session; first in line for the round-4 rotation)
        "embedding_outliers": _q_embedding_outliers,  # z-score pre-filter, new this session
        "pca_top_component": _q_pca_top_component,  # unrolled power iteration, new this session
        "walk_cooccurrence": _q_walk_cooccurrence,  # skip-gram prep, new this session
        "coverage_select_topk": _q_coverage_select,  # greedy max-cover, new this session
        "edge_embeddedness": _q_edge_embeddedness,  # weak-tie metric, new this session
        "chunk_windows": _q_chunk_windows,  # RAG/pretraining chunking, new this session
        "span_corruption_spans": _q_span_corruption,  # T5 denoising prep, new this session
        "triangle_estimate_sampled": _q_triangle_estimate,  # DOULION, new this session
        "community_evolution": _q_community_evolution,  # dynamic tracking, new this session
        "source_log_odds": _q_source_log_odds,  # Fightin Words, new this session
        "event_transitions": _q_event_transitions,  # behavioral Markov chain, new this session
        "source_health_report": _q_source_health,  # per-source rollup, new this session
        "props_field_stats": _q_props_field_stats,  # JSON props extract, new this session
        "quality_lr_score": _q_quality_lr_score,  # classifier inference, new this session
        "embedding_covariance": _q_embedding_covariance,  # PCA primitive, new this session  # rotated past the window: transitively evidenced by pca_top_component
        "canonical_relabel": _q_canonical_relabel,  # C4 (judge r3 wishlist)  # rotated past the window: r1-driver-green AND judge-verified r2
        # training-data pipeline: similarity search
        "ann_ivf_topk": _q_ivf_topk,
        # training-data pipeline: text analysis + multimodal plumbing
        "multimodal_features": _q_multimodal_features,
        "conv_keep_topk": _q_conv_keep_topk,  # downstream of conv_influence (rotated out of the 50-window: r02-green, its upstream fix is in-window)
        # (c) headline perf canaries — CC contraction + PR crossover work
        # lands this round; keep their correctness under the hard signal
        # ---------------- driver window (50) ends here ----------------
        # (d) long-green remainder: driver-verified in r1/r2. The two
        # headline canaries rotate out to make room for the new r3 ops:
        # pagerank's default path is unchanged this round (crossover sweep
        # was measurement-only) and connected_components runs inside the
        # in-window cc_decremental / cc_incremental / stream_cc gates
        # against the same recursive-CTE oracle.
        # ---- positions 51+: NEXT IN LINE for the r4 window rotation ----
        # Entries 51-60 are the round-3 late additions (token_pmi ..
        # latency_quantiles). The 50-slot window above is saturated with
        # the VERDICT-r2-item-1 mandated set (never-driver-checked r2 ops,
        # the four r1 hash-fixes, and everything changed this round), so
        # these new ops queue here; each one's parity is attested by the
        # full-suite driver_sim gate (judge: `tools/driver_sim.py --only
        # <name>`), and they rotate into the window first thing next round.
        "token_pmi": _q_token_pmi,
        "boilerplate_strip": _q_boilerplate_strip,
        "condensation_layers": _q_condensation_layers,
        "corpus_stats": _q_corpus_stats,
        "quality_lr_fit": _q_quality_lr_fit,
        "cross_source_dup_matrix": _q_cross_source_dup_matrix,
        "conv_entropy": _q_conv_entropy,
        "katz_centrality": _q_katz,
        "label_centroids": _q_label_centroids,
        "latency_quantiles": _q_latency_quantiles,
        # Entries below are the round-3 session-4 additions — same queue.
        "wl_refinement": _q_wl_refinement,  # structural-fingerprint colors
        "bm25_topk": _q_bm25_topk,  # retrieval scoring / hard-negative mining
        "coreness": _q_coreness,  # full core decomposition (h-index rounds)
        "textrank_keywords": _q_textrank_keywords,  # text×graph composition
        "turn_segments": _q_turn_segments,  # lexical-cohesion topic cuts
        "partition_quality": _q_partition_quality,  # layout cost audit
        "split_leakage": _q_split_leakage,  # cross-split contamination
        "hard_negative_pairs": _q_hard_negative_pairs,  # contrastive mining
        "four_clique_count": _q_four_clique_count,  # K4 motif census
        "rrf_fused_topk": _q_rrf_fused_topk,  # hybrid-retrieval fusion
        "event_anomalies": _q_event_anomalies,  # per-user burst z-test
        "knn_label_disagreement": _q_knn_label_disagreement,  # mislabel screen
        "readability_scores": _q_readability_scores,  # Flesch curation signal
        # Entries below are the round-3 session-6 additions — same queue.
        "winnowing_fingerprints": _q_winnowing_fingerprints,  # MOSS local fingerprints
        "fastrp_embeddings": _q_fastrp_embeddings,  # CIKM'19 graph-ML features
        "conv_prefix_dups": _q_conv_prefix_dups,  # scripted-opening detection
        "retrieval_metrics": _q_retrieval_metrics,  # embedding eval card
        "bpe_train": _q_bpe_train,  # tokenizer merge learning
        "bpe_fertility": _q_bpe_fertility,  # tokenize + fertility audit
        "cluster_silhouette": _q_cluster_silhouette,  # clustering-quality audit
        "label_assortativity": _q_label_assortativity,  # homophily scalar
        "trussness": _q_trussness,  # full truss decomposition
        "influence_seeds": _q_influence_seeds,  # IC-model seed selection
        "threshold_cascade": _q_threshold_cascade,  # diffusion-reach evaluation
        "containment_pairs": _q_containment_pairs,  # asymmetric dedup signal
        "knn_graph_clusters": _q_knn_graph_clusters,  # textops × graph composition
        "actor_rank_drift": _q_actor_rank_drift,  # temporal influence drift
        "linkpred_eval": _q_linkpred_eval,  # holdout precision@k protocol
        # Entries below are the round-3 session-2 additions — same queue.
        "tool_chains": _q_tool_chains,
        "agent_loops": _q_agent_loops,
        "sbm_block_matrix": _q_sbm_block_matrix,
        "eigenvector_centrality": _q_eigenvector,
        "ngram_coverage": _q_ngram_coverage,
        "semdedup": _q_semdedup,
        "butterfly_count": _q_butterflies,
        "node_overlap_accuracy": _q_node_overlap,
        "symmetric_difference": _q_symmetric_difference,
        "max_jaccard_sum": _q_max_jaccard,
        "maximal_matching_accuracy": _q_matching_accuracy,
        "stream_pagerank": _q_stream_pagerank,
        "event_funnel": _q_event_funnel,
        "retention_cohorts": _q_retention_cohorts,
        "rich_club": _q_rich_club,
        "conductance": _q_conductance,
        "pagerank_fixed_iters": _q_pagerank,
        # rotated out for the r3 sketches + canonical_relabel: each has a
        # driver green already (modularity/pairwise_f1/ngram_jaccard r1;
        # triad_census r2 — its r3 hub-guard parameter defaults off, so
        # the r2 row attests the default path)
        "modularity": _q_modularity,  # Q1/A3/A4
        "pairwise_f1": _q_f1,  # Q3
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "triad_census": _q_triad_census,  # directed census hub guard
        # graph_summary rotates out for seeded_lpa: untouched since its
        # r2 judge driver_sim green, re-verified by the full builder
        # driver_sim run this round
        "graph_summary": _q_graph_summary,
        # stream_dedup_pairs rotates out for dpo_pairs: r2 judge green,
        # untouched this round (the LSH verify fix was ported FROM it)
        "stream_dedup_pairs": _q_stream_dedup,  # incremental LSH == batch LSH
        # tfidf_topk / top_ngrams / stratum_counts rotate out for
        # node2vec_walks + MIS + context_windows: judge-verified green in
        # r2 (driver_sim re-run), implementation untouched since
        "tfidf_topk": _q_tfidf_topk,
        "top_ngrams": _q_top_ngrams,
        "stratum_counts": _q_stratum_counts,
        "main_community": _q_main_community,  # T3 — judge-verified r2, untouched
        "pii_scrub": _q_pii_scrub,  # judge-verified r2, untouched since
        "cosine_bucketed_dup_pairs": _q_cos_bucketed_dup_pairs,  # judge-verified r2
        "embedding_quantize": _q_quantize_embeddings,  # judge-verified r2
        "multimodal_resize_meta": _q_multimodal_resize,  # r2 family, untouched
        "multimodal_frame_sample": _q_multimodal_frames,  # r2 family, untouched
        "edge_extract_symmetrize": _q_edges,  # G2/G3
        "weighted_degree": _q_degree,  # A1
        "degree_histogram": _q_degree_histogram,  # skew probe
        "total_edges": _q_total_edges,  # G10/A2
        "personalized_pagerank": _q_personalized_pagerank,
        "hits_fixed_iters": _q_hits,
        "local_clustering": _q_local_clustering,
        "adamic_adar": _q_adamic_adar,
        "jaccard_linkpred": _q_jaccard,
        "sssp_multi_source": _q_sssp,
        "harmonic_centrality": _q_harmonic_centrality,
        "betweenness_approx": _q_betweenness,
        "random_walks": _q_random_walks,
        "neighbor_sample": _q_neighbor_sample,  # GNN fanout sampling
        "distance_profile": _q_distance_profile,  # effective-diameter profile
        "degree_assortativity": _q_assortativity,
        "label_propagation_fixed_iters": _q_lpa,
        "belief_propagation_fixed_iters": _q_bp,  # D2/A9/A10
        "k_core": _q_k_core,  # fixed-round peel (gate parity mode)
        "k_truss": _q_k_truss,  # fixed-round edge-support peel
        "triangle_count": _q_triangle_count,
        "triangles_per_vertex": _q_triangles_per_vertex,
        "r_hop_neighborhood": _q_r_hop,  # T6 radius-bounded BFS
        # transcript extraction (input_hint pipeline)
        "transcript_reply_edges": _q_transcript_edges,  # extract.py end-to-end
        "transcript_turn_text": _q_turn_text,  # per-turn text equality
        "conv_stats": _q_conv_stats,
        "decayed_reply_edges": _q_decayed_reply_edges,  # per-conversation rollup
        "role_transitions": _q_role_transitions,  # who-replies-to-whom counts
        "user_influence": _q_user_influence,  # extract→graph→PageRank composition
        "session_stats": _q_session_stats,  # time-gap sessionization rollup
        "transcript_structural_dups": _q_transcript_structural_dups,  # templated convs
        "reply_reciprocity": _q_reply_reciprocity,  # mutual-vs-broadcast scalar
        "transcript_token_stats": _q_transcript_token_stats,  # per-turn token budget
        "reply_latency_stats": _q_reply_latency_stats,  # per-pair reply latency
        "tool_cooccurrence": _q_tool_cooccurrence,  # tool-affinity edge table
        "actor_lpa": _q_actor_lpa,  # extract→graph→LPA composition
        "actor_communities": _q_actor_communities,  # extract→graph→CC composition
        "salted_neighbor_weights": _q_salted_a8,  # A8 via skew path
        "community_stats": _q_community_stats,  # A4/A6
        "community_representatives": _q_community_reps,  # top-K per community
        "edge_sample": _q_edge_sample,  # deterministic uniform edge sample
        # (d) rotated out of the window this round (r1-driver-green,
        # implementation untouched since; rotate back in r4)
        "contingency": _q_contingency,  # J6 (nmi/pairwise_f1 share the path)
        "exact_dedup": _q_exact_dedup,
        "token_stats": _q_token_stats,
        "lang_id": _q_lang_id,
        "doc_fingerprint": _q_doc_fingerprint,
        "text_quality": _q_text_quality,
        "ann_cosine_topk": _q_ann_topk,
        "embeddedness": _q_embeddedness,  # Q5
        "edge_classification_accuracy": _q_edge_cls_acc,  # Q8
        "log_likelihood": _q_log_likelihood,  # Q4
        "minhash_signatures": _q_minhash_sig,
        "simhash": _q_simhash,
        "simhash_dup_pairs": _q_simhash_pairs,
        "embedding_cosine_dup_pairs": _q_cos_dup_pairs,
        "multimodal_decode": _q_multimodal_decode,
    }
    head = [k for k in _WINDOW_FIRST if k in d]
    return {k: d[k] for k in head} | {k: v for k, v in d.items() if k not in head}


# the driver's 50-entry CORRECTNESS window, by evidence priority.
# ROUND-5 ROTATION (VERDICT r4 #1, final round): (a) the four ops whose
# operator functions change this round (nprobe multi-probe IVF, fallback
# warning, delta-append fold snapshots) — windowed per the r4 #4
# discipline even though their GATE paths are value-identical; (b) the
# 15 formerly-no-evidence entries (first judge-verified only in the r4
# full-suite run); (c) the four judge-r2-only stragglers; (d) judge-r3
# entries newest-wave-first until the window is 50 deep.  The 14
# entries left WITHOUT a driver CORRECTNESS row at project end
# (maximal_matching, substring_dup_flags, hll_distinct,
# cms_heavy_hitters, eigenvector_centrality, semdedup,
# node_overlap_accuracy, symmetric_difference, max_jaccard_sum,
# maximal_matching_accuracy, stream_pagerank, conductance,
# graph_summary, main_community) each carry a judge-r4 full-suite
# driver_sim green (VERDICT r4: 222/222 OK at sf0.01); two window slots
# went to re-checking changed driver-rowed ops instead
# (semantic_decontamination r4, ann_ivf_topk r1), which is what the
# change-window rule demands.
_WINDOW_FIRST = [
    "semantic_decontamination",
    "ann_ivf_topk",
    "stream_dedup_pairs",
    "stream_novelty",
    "repetition_stats",
    "prompt_response_pairs",
    "context_windows",
    "stratum_topk_sample",
    "node2vec_walks",
    "bipartite_check",
    "priority_sample",
    "agent_loops",
    "sbm_block_matrix",
    "ngram_coverage",
    "butterfly_count",
    "event_funnel",
    "retention_cohorts",
    "rich_club",
    "tfidf_topk",
    "top_ngrams",
    "stratum_counts",
    "pii_scrub",
    "temporal_triangles",
    "spectral_sweep_cut",
    "percolation_curve",
    "fastrp_embeddings",
    "retrieval_metrics",
    "bpe_train",
    "bpe_fertility",
    "trussness",
    "linkpred_eval",
    "wl_refinement",
    "bm25_topk",
    "coreness",
    "textrank_keywords",
    "four_clique_count",
    "katz_centrality",
    "pack_conversations",
    "holdout_split",
    "cc_incremental",
    "stream_cc",
    "mixture_weights",
    "temperature_sample",
    "ngram_lm_score",
    "bloom_decontamination",
    "dpo_pairs",
    "conv_novelty",
    "dsir_importance",
    "maximal_independent_set",
    "densest_subgraph",
]

# Most recent value-level verification per entry (VERDICT r3 #6):
# "rN" = all-green driver CORRECTNESS row in that round; "judge-rN" =
# judge driver_sim re-run green that round; None = never checked by
# anyone (self-reported builder driver_sim greens only).  Updated each
# round from CORRECTNESS_r{N}.json + the VERDICT's judge re-run list.
_LAST_VERIFIED: dict[str, str | None] = {
    "anf_profile": "r3", "effective_diameter": "r3", "hyperball_closeness": "r3",
    "temporal_reachability": "r3", "gopher_rule_flags": "r3", "pq_codes": "r3",
    "pq_adc_topk": "r3", "ppr_sweep_cut": "r3", "spectral_bisection": "r3",
    "actor_coparticipation": "r3", "disparity_backbone": "r3", "dcsbm_loglik": "r3",
    "clique_percolation": "r3", "rwr_topk": "r3", "degree_knn_curve": "r3",
    "robustness_profile": "r3", "landmark_oracle_eval": "r3",
    "matryoshka_recall": "r3", "burt_constraint": "r3", "motif_spectral": "r3",
    "conv_wl_kernel": "r3", "semantic_decontamination": "r4",
    "tool_latency_attribution": "r3", "temporal_triangles": "judge-r4",
    "spectral_sweep_cut": "judge-r4", "percolation_curve": "judge-r4",
    "spectral_partition_quality": "r3", "greedy_coloring": "r3",
    "stream_triangles": "r3", "kmeans_lloyd": "r3", "minimum_spanning_forest": "r3",
    "louvain_communities": "r3", "fm_refine_pair": "r3", "stream_lpa": "r3",
    "stream_sessionize": "r3", "repetition_stats": "judge-r4",
    "pack_conversations": "judge-r4", "holdout_split": "judge-r4",
    "cc_incremental": "judge-r4", "cc_decremental": "r4", "stream_cc": "judge-r4",
    "mixture_weights": "judge-r4", "temperature_sample": "judge-r4",
    "ngram_lm_score": "judge-r4", "bloom_decontamination": "judge-r4",
    "prompt_response_pairs": "judge-r4", "dpo_pairs": "judge-r4",
    "context_windows": "judge-r4", "conv_novelty": "judge-r4",
    "stream_novelty": "judge-r4", "stratum_topk_sample": "judge-r4",
    "dsir_importance": "judge-r4", "node2vec_walks": "judge-r4",
    "maximal_independent_set": "judge-r4", "densest_subgraph": "judge-r4",
    "maximal_matching": "judge-r4", "bipartite_check": "judge-r4",
    "substring_dup_flags": "judge-r4", "hll_distinct": "judge-r4",
    "cms_heavy_hitters": "judge-r4", "priority_sample": "judge-r4",
    "conv_influence": "r4", "actor_scc": "r4", "seeded_lpa": "r4",
    "connected_components": "r4", "coarsen": "r3", "sync_communities": "r3",
    "edge_removal": "r3", "node_removal": "r3", "edge_weight_lookup": "r3",
    "nmi": "r3", "modularity_density": "r3", "minhash_lsh_dup_pairs": "r3",
    "near_dup_clusters": "r3", "curation_keep_list": "r3",
    "simhash_banded_dup_pairs": "r3", "decontamination_flags": "r3",
    "embedding_outliers": "r4", "pca_top_component": "r4", "walk_cooccurrence": "r4",
    "coverage_select_topk": "r4", "edge_embeddedness": "r4", "chunk_windows": "r4",
    "span_corruption_spans": "r4", "triangle_estimate_sampled": "r4",
    "community_evolution": "r4", "source_log_odds": "r4", "event_transitions": "r4",
    "source_health_report": "r4", "props_field_stats": "r4", "quality_lr_score": "r4",
    "embedding_covariance": "r4", "canonical_relabel": "r3", "ann_ivf_topk": "r1",
    "multimodal_features": "r3", "conv_keep_topk": "r4", "token_pmi": "r4",
    "boilerplate_strip": "r4", "condensation_layers": "r4", "corpus_stats": "r4",
    "quality_lr_fit": "r4", "cross_source_dup_matrix": "r4", "conv_entropy": "r4",
    "katz_centrality": "judge-r4", "label_centroids": "r4", "latency_quantiles": "r4",
    "wl_refinement": "judge-r4", "bm25_topk": "judge-r4", "coreness": "judge-r4",
    "textrank_keywords": "judge-r4", "turn_segments": "r4", "partition_quality": "r4",
    "split_leakage": "r4", "hard_negative_pairs": "r4",
    "four_clique_count": "judge-r4", "rrf_fused_topk": "r4", "event_anomalies": "r4",
    "knn_label_disagreement": "r4", "readability_scores": "r4",
    "winnowing_fingerprints": "r4", "fastrp_embeddings": "judge-r4",
    "conv_prefix_dups": "r4", "retrieval_metrics": "judge-r4", "bpe_train": "judge-r4",
    "bpe_fertility": "judge-r4", "cluster_silhouette": "r4",
    "label_assortativity": "r4", "trussness": "judge-r4", "influence_seeds": "r4",
    "threshold_cascade": "r4", "containment_pairs": "r4", "knn_graph_clusters": "r4",
    "actor_rank_drift": "r4", "linkpred_eval": "judge-r4", "tool_chains": "r4",
    "agent_loops": "judge-r4", "sbm_block_matrix": "judge-r4",
    "eigenvector_centrality": "judge-r4", "ngram_coverage": "judge-r4",
    "semdedup": "judge-r4", "butterfly_count": "judge-r4",
    "node_overlap_accuracy": "judge-r4", "symmetric_difference": "judge-r4",
    "max_jaccard_sum": "judge-r4", "maximal_matching_accuracy": "judge-r4",
    "stream_pagerank": "judge-r4", "event_funnel": "judge-r4",
    "retention_cohorts": "judge-r4", "rich_club": "judge-r4",
    "conductance": "judge-r4", "pagerank_fixed_iters": "r2", "modularity": "r1",
    "pairwise_f1": "r1", "ngram_jaccard_pairs": "r1", "triad_census": "r4",
    "graph_summary": "judge-r4", "stream_dedup_pairs": "judge-r4",
    "tfidf_topk": "judge-r4", "top_ngrams": "judge-r4", "stratum_counts": "judge-r4",
    "main_community": "judge-r4", "pii_scrub": "judge-r4",
    "cosine_bucketed_dup_pairs": "r3", "embedding_quantize": "r3",
    "multimodal_resize_meta": "r3", "multimodal_frame_sample": "r3",
    "edge_extract_symmetrize": "r2", "weighted_degree": "r2", "degree_histogram": "r2",
    "total_edges": "r2", "personalized_pagerank": "r2", "hits_fixed_iters": "r2",
    "local_clustering": "r2", "adamic_adar": "r2", "jaccard_linkpred": "r2",
    "sssp_multi_source": "r2", "harmonic_centrality": "r2", "betweenness_approx": "r2",
    "random_walks": "r2", "neighbor_sample": "r2", "distance_profile": "r2",
    "degree_assortativity": "r2", "label_propagation_fixed_iters": "r2",
    "belief_propagation_fixed_iters": "r2", "k_core": "r2", "k_truss": "r2",
    "triangle_count": "r2", "triangles_per_vertex": "r2", "r_hop_neighborhood": "r2",
    "transcript_reply_edges": "r2", "transcript_turn_text": "r2", "conv_stats": "r2",
    "decayed_reply_edges": "r2", "role_transitions": "r2", "user_influence": "r2",
    "session_stats": "r2", "transcript_structural_dups": "r2",
    "reply_reciprocity": "r2", "transcript_token_stats": "r2",
    "reply_latency_stats": "r2", "tool_cooccurrence": "r2", "actor_lpa": "r2",
    "actor_communities": "r2", "salted_neighbor_weights": "r2",
    "community_stats": "r2", "community_representatives": "r2", "edge_sample": "r2",
    "contingency": "r1", "exact_dedup": "r1", "token_stats": "r1", "lang_id": "r1",
    "doc_fingerprint": "r1", "text_quality": "r1", "ann_cosine_topk": "r1",
    "embeddedness": "r1", "edge_classification_accuracy": "r1", "log_likelihood": "r1",
    "minhash_signatures": "r1", "simhash": "r1", "simhash_dup_pairs": "r1",
    "embedding_cosine_dup_pairs": "r1", "multimodal_decode": "r1",
}

# Ops whose IMPLEMENTATION OR ORACLE changed after the round recorded in
# _LAST_VERIFIED (the stale-evidence set).  The assert below is the
# mechanism VERDICT r3 #6 asked for: a changed op can never silently sit
# outside the driver window — add it here when you touch it, and it must
# be windowed (or re-verified) before the round ships.
_CHANGED_SINCE_VERIFIED = [
    "semantic_decontamination",  # r5 nprobe fallback + ADVICE fallback warning
    "ann_ivf_topk",              # r5 nprobe multi-probe parameter
    "stream_dedup_pairs",        # r5 delta-append pairs_cum fold snapshots
    "stream_novelty",            # r5 delta-append out_cum fold snapshots
]

assert set(_CHANGED_SINCE_VERIFIED) <= set(_WINDOW_FIRST[:50]), (
    "changed-since-verified ops outside the driver CORRECTNESS window: "
    f"{sorted(set(_CHANGED_SINCE_VERIFIED) - set(_WINDOW_FIRST[:50]))}"
)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (same parquet views)."""
    edges_cte = "WITH " + lineitem_edges_sql()
    from sbm_communitydetection_spark.operators import anf as ANF
    from sbm_communitydetection_spark.operators import temporal as TEMP
    from sbm_communitydetection_spark.operators.spectral import (
        spectral_bisection_sql,
        spectral_cte_parts as _spectral_parts,
    )
    from sbm_communitydetection_spark.operators.backbone import (
        disparity_filter_sql as _disparity_sql,
    )
    from sbm_communitydetection_spark.functions.metrics import (
        dcsbm_loglik_sql as _dcsbm_sql,
    )
    from sbm_communitydetection_spark.operators.triangles import (
        clique_percolation_sql as _cpc_sql,
    )
    from sbm_communitydetection_spark.operators.components import (
        percolation_curve_sql as _percolation_sql,
        robustness_profile_sql as _robustness_sql,
    )
    from sbm_communitydetection_spark.operators.sssp import (
        landmark_oracle_eval_sql as _lm_oracle_sql,
    )
    from sbm_communitydetection_spark.operators.spectral import (
        motif_spectral_sql as _motif_spectral_sql,
        spectral_sweep_cut_sql as _spectral_sweep_sql,
    )

    return {
        # session-7 wave
        "anf_profile": edges_cte + ",\n" + ANF.anf_profile_sql(3),
        "effective_diameter": edges_cte + ",\n" + ANF.effective_diameter_sql(3),
        "hyperball_closeness": edges_cte + ",\n" + ANF.hyperball_sql(2),
        "temporal_reachability": TEMP.temporal_reachability_sql(["signup"], rounds=4),
        "gopher_rule_flags": TA.gopher_rule_flags_sql(),
        "pq_codes": TS.pq_codes_sql(),
        "pq_adc_topk": TS.pq_adc_topk_sql(),
        "ppr_sweep_cut": edges_cte
        + ",\n"
        + O.ppr_sweep_cut_sql(PR_ITERS, src_mod=PPR_SRC_MOD),
        "spectral_bisection": edges_cte + ",\n" + spectral_bisection_sql(6),
        "actor_coparticipation": ET.actor_coparticipation_oracle_sql(),
        "disparity_backbone": edges_cte + ",\n" + _disparity_sql(),
        "dcsbm_loglik": edges_cte + ",\n" + _dcsbm_sql(N_LABELS),
        "clique_percolation": edges_cte.replace("WITH ", "WITH RECURSIVE ", 1)
        + f""",
cpc_coin_kept AS (
    SELECT src, dst FROM edges
    WHERE src < dst
      AND ({md5_long_sql("concat('cp', ':', src, ':', dst)")}) % 1000 < {CPC_PERMILLE}
),
cpc_edges AS (
    SELECT src, dst FROM cpc_coin_kept
    UNION ALL SELECT dst, src FROM cpc_coin_kept
),
"""
        + _cpc_sql(edges_table="cpc_edges"),
        "rwr_topk": edges_cte + ",\n" + O.rwr_multi_seed_sql(rounds=3),
        "degree_knn_curve": edges_cte + ",\n" + G.degree_knn_curve_sql(),
        "robustness_profile": edges_cte.replace("WITH ", "WITH RECURSIVE ", 1)
        + ",\n"
        + _robustness_sql(),
        "landmark_oracle_eval": edges_cte + ",\n" + _lm_oracle_sql(rounds=4),
        "matryoshka_recall": TS.matryoshka_recall_sql(),
        "conv_wl_kernel": WL.conv_wl_kernel_sql(rounds=1),
        "semantic_decontamination": TS.semantic_decontamination_sql(),
        "tool_latency_attribution": ET.tool_latency_attribution_sql(),
        "temporal_triangles": TEMP.temporal_triangles_sql(),
        "spectral_sweep_cut": edges_cte + ",\n" + _spectral_sweep_sql(6),
        "percolation_curve": edges_cte.replace("WITH ", "WITH RECURSIVE ", 1)
        + ",\n"
        + _percolation_sql(permilles=(100, 300)),
        "burt_constraint": edges_cte + ",\n" + G.burt_constraint_sql(),
        "motif_spectral": edges_cte
        + f""",
cpc_coin_kept AS (
    SELECT src, dst FROM edges
    WHERE src < dst
      AND ({md5_long_sql("concat('cp', ':', src, ':', dst)")}) % 1000 < {CPC_PERMILLE}
),
cpc_edges AS (
    SELECT src, dst, 1::BIGINT AS weight FROM cpc_coin_kept
    UNION ALL SELECT dst, src, 1::BIGINT FROM cpc_coin_kept
),
"""
        + _motif_spectral_sql().replace("FROM edges WHERE src <> dst", "FROM cpc_edges WHERE src <> dst", 1),
        "spectral_partition_quality": edges_cte
        + ",\n"
        + ",\n".join(_spectral_parts(6))
        + f",\nassignment AS (SELECT id, (CASE WHEN ROUND(x, 6) >= 0 THEN 1 ELSE 0 END)::BIGINT AS part FROM spx6),\n"
        + PA.partition_quality_body_sql(),
        # graph core + north-star algorithms
        "edge_extract_symmetrize": edges_cte + "SELECT src, dst, weight FROM edges",
        "weighted_degree": edges_cte
        + "SELECT src AS id, SUM(weight)::BIGINT AS degree FROM edges GROUP BY src",
        "degree_histogram": edges_cte
        + """,
deg AS (SELECT SUM(weight)::BIGINT AS degree FROM edges GROUP BY src)
SELECT FLOOR(LOG2(degree::DOUBLE))::BIGINT AS bucket, COUNT(*)::BIGINT AS n_vertices
FROM deg GROUP BY bucket""",
        "total_edges": edges_cte + "SELECT (SUM(weight) / 2.0)::DOUBLE AS total_edges FROM edges",
        "pagerank_fixed_iters": edges_cte + ",\n" + O.pagerank_unrolled_sql(PR_ITERS),
        "personalized_pagerank": edges_cte
        + ",\n"
        + O.ppr_unrolled_sql(PR_ITERS, src_mod=PPR_SRC_MOD),
        "hits_fixed_iters": "WITH "
        + lineitem_directed_edges_sql()
        + ",\n"
        + O.hits_unrolled_sql(HITS_ITERS),
        "katz_centrality": "WITH "
        + lineitem_directed_edges_sql()
        + ",\n"
        + katz_unrolled_sql(),
        "local_clustering": edges_cte + ",\n" + O.local_clustering_sql(),
        "adamic_adar": edges_cte + ",\n" + _aa_sql(AA_PROBE_MOD),
        "jaccard_linkpred": edges_cte + ",\n" + _jac_sql(AA_PROBE_MOD),
        "sssp_multi_source": edges_cte
        + ",\n"
        + _sssp_sql(SSSP_ROUNDS, SSSP_SRC_MOD),
        "harmonic_centrality": edges_cte
        + ",\n"
        + _harm_sql(SSSP_ROUNDS, SSSP_SRC_MOD),
        "betweenness_approx": edges_cte
        + ",\n"
        + _betw_sql(BETW_RADIUS, BETW_SRC_MOD),
        "random_walks": edges_cte
        + ",\n"
        + _walks_sql(WALK_START_MOD, WALKS_PER_VERTEX, WALK_LENGTH),
        "node2vec_walks": edges_cte
        + ",\n"
        + _n2v_sql(WALK_START_MOD, WALKS_PER_VERTEX, WALK_LENGTH),
        "maximal_independent_set": edges_cte + ",\n" + _mis_sql(MIS_ROUNDS),
        "embedding_covariance": _cov_sql(),
        "embedding_outliers": _outliers_sql(),
        "pca_top_component": _pca_sql(),
        "stream_triangles": edges_cte + ",\n" + O.stream_triangles_sql(STREAM_TRI_BOUNDS, """CAST(concat('0x', substr(md5(CAST(a AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 15)) AS BIGINT) % 1000"""),
        "greedy_coloring": edges_cte
        + f""",
sedges AS (
    SELECT src, dst, weight FROM edges
    WHERE CAST(concat('0x', substr(md5('0' || ':' || CAST(src AS VARCHAR) || ':'
          || CAST(dst AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 < {COLOR_SAMPLE_PERMILLE}
),
"""
        + _coloring_sql(COLOR_ROUNDS, edges_table="sedges"),
        "densest_subgraph": edges_cte + ",\n" + _densest_sql(DENSEST_ROUNDS),
        "maximal_matching": edges_cte + ",\n" + _matching_sql(MATCHING_ROUNDS),
        "bipartite_check": edges_cte.replace("WITH ", "WITH RECURSIVE ", 1)
        + ",\n"
        + O.bipartite_check_sql(),
        "substring_dup_flags": TD.substring_dup_flags_sql(),
        "neighbor_sample": edges_cte + ",\n" + _nbrsample_sql(NEIGHBOR_FANOUT),
        "distance_profile": edges_cte + ",\n" + _distprof_sql(SSSP_ROUNDS, SSSP_SRC_MOD),
        "degree_assortativity": edges_cte
        + """,
nbrs AS (SELECT src, dst FROM edges WHERE src <> dst),
deg AS (SELECT src AS id, COUNT(*)::BIGINT AS deg FROM nbrs GROUP BY src),
p AS (
    SELECT dx.deg AS x, dy.deg AS y
    FROM nbrs n JOIN deg dx ON n.src = dx.id JOIN deg dy ON n.dst = dy.id
),
s AS (
    SELECT COUNT(*)::DOUBLE AS m, SUM(x)::DOUBLE AS sx, SUM(y)::DOUBLE AS sy,
           SUM(x * y)::DOUBLE AS sxy, SUM(x * x)::DOUBLE AS sxx, SUM(y * y)::DOUBLE AS syy
    FROM p
)
SELECT ROUND((m * sxy - sx * sy) / (SQRT(m * sxx - sx * sx) * SQRT(m * syy - sy * sy)), 8)
       AS assortativity
FROM s""",
        "label_propagation_fixed_iters": edges_cte + ",\n" + O.lpa_unrolled_sql(LPA_ITERS),
        "seeded_lpa": edges_cte + ",\n" + O.seeded_lpa_unrolled_sql(SEEDED_LPA_ITERS),
        "belief_propagation_fixed_iters": edges_cte
        + ",\n"
        + O.bp_unrolled_sql(BP_ITERS, BP_K, BP_P_IN, BP_P_OUT, BP_NOISE, BP_K),
        "connected_components": edges_cte.replace("WITH ", "WITH RECURSIVE ", 1)
        + ",\n"
        + O.components_recursive_sql(),
        # incremental repair must equal a FULL recompute over all edges
        "cc_incremental": edges_cte.replace("WITH ", "WITH RECURSIVE ", 1)
        + ",\n"
        + O.components_recursive_sql(),
        "stream_cc": edges_cte.replace("WITH ", "WITH RECURSIVE ", 1)
        + ",\n"
        + O.components_recursive_sql(),
        # scoped repair after removal must equal a full recompute over the
        # surviving edges (canonical undirected coin mirrors the Spark side)
        "cc_decremental": edges_cte.replace("WITH ", "WITH RECURSIVE ", 1)
        + ",\n"
        + O.components_decremental_sql(
            md5_long_sql(
                "concat(CAST(LEAST(src, dst) AS VARCHAR), ':', "
                "CAST(GREATEST(src, dst) AS VARCHAR))"
            )
            + " % 10"
        ),
        "k_core": edges_cte + ",\n" + O.k_core_unrolled_sql(KCORE_K, KCORE_ROUNDS),
        "k_truss": edges_cte + ",\n" + _ktruss_sql(KTRUSS_K, KTRUSS_ROUNDS),
        "triangle_count": edges_cte + ",\n" + O.triangle_count_sql(),
        "triangles_per_vertex": edges_cte + ",\n" + O.triangle_per_vertex_sql(),
        "r_hop_neighborhood": edges_cte + ",\n" + _frontier_sql(2),
        # transcript extraction (events-derived input_hint table)
        "transcript_reply_edges": ET.reply_edges_oracle_sql(),
        "transcript_turn_text": ET.turn_text_oracle_sql(),
        "conv_stats": ET.conv_stats_oracle_sql(),
        "decayed_reply_edges": ET.decayed_reply_edges_oracle_sql(DECAY_HALF_LIFE_MS),
        "role_transitions": ET.role_transitions_oracle_sql(),
        "user_influence": "WITH "
        + ET.actor_edges_cte_sql()
        + ",\n"
        + O.pagerank_unrolled_sql(PR_ITERS),
        "actor_lpa": "WITH "
        + ET.actor_edges_cte_sql()
        + ",\n"
        + O.lpa_unrolled_sql(LPA_ITERS),
        "session_stats": ET.session_stats_oracle_sql(SESSION_GAP_MS),
        "stream_sessionize": ET.sessionize_oracle_sql(SESSION_GAP_MS),
        "repetition_stats": TA.repetition_stats_sql(),
        "pack_conversations": "WITH "
        + ET.transcripts_cte_sql()
        + ",\n"
        + _pack_sql(PACK_BUDGET_TOKENS),
        "holdout_split": "WITH "
        + ET.transcripts_cte_sql()
        + "\n"
        + _holdout_sql(SPLIT_VAL_PM, SPLIT_TEST_PM),
        "transcript_structural_dups": "WITH "
        + ET.transcripts_cte_sql()
        + ",\n"
        + ET.conv_structure_docs_cte_sql()
        + ",\n"
        + TD.lsh_dup_pairs_over_cte_sql(
            "conv_docs",
            threshold=STRUCT_DUP_THRESHOLD,
            rows_per_band=STRUCT_DUP_ROWS_PER_BAND,
        ),
        "reply_reciprocity": ET.reply_reciprocity_oracle_sql(),
        "reply_latency_stats": ET.reply_latency_stats_oracle_sql(),
        "triad_census": "WITH "
        + ET.transcripts_cte_sql()
        + """,
    lagged AS (
        SELECT LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS src,
               role AS dst
        FROM transcripts
    ),
    dedges0 AS (
        SELECT DISTINCT src, dst FROM lagged
        WHERE src IS NOT NULL AND src <> dst
    ),
    -- hub cap mirror (TRIAD_MAX_OUT_DEGREE): drop vertices whose
    -- out-degree exceeds the cap from every triad role, same as the
    -- engine's max_out_degree anti-joins
    hubs AS (
        SELECT src AS id FROM dedges0 GROUP BY src
        HAVING COUNT(*) > """ + str(TRIAD_MAX_OUT_DEGREE) + """
    ),
    dedges AS (
        SELECT src, dst FROM dedges0
        WHERE src NOT IN (SELECT id FROM hubs)
          AND dst NOT IN (SELECT id FROM hubs)
    ),
    wedges AS (
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM dedges e1 JOIN dedges e2 ON e1.dst = e2.src
        WHERE e1.src <> e2.dst
    )
    SELECT
        (SELECT COUNT(*)::BIGINT FROM wedges w
         JOIN dedges e ON e.src = w.c AND e.dst = w.a
         WHERE w.a < w.b AND w.a < w.c) AS n_cyclic,
        (SELECT COUNT(*)::BIGINT FROM wedges w
         JOIN dedges e ON e.src = w.a AND e.dst = w.c) AS n_transitive""",
        "actor_scc": "WITH RECURSIVE "
        + ET.transcripts_cte_sql()
        + """,
    lagged AS (
        SELECT LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS src,
               role AS dst
        FROM transcripts
    ),
    dedges AS (
        SELECT DISTINCT src, dst FROM lagged
        WHERE src IS NOT NULL AND src <> dst
    ),
    verts AS (SELECT src AS id FROM dedges UNION SELECT dst FROM dedges),
    reach(src, dst) AS (
        SELECT src, dst FROM dedges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN dedges e ON r.dst = e.src
    ),
    mutual AS (
        SELECT a.src AS u, a.dst AS v
        FROM reach a JOIN reach b ON a.src = b.dst AND a.dst = b.src
    )
    SELECT v.id, LEAST(v.id, COALESCE(MIN(m.v), v.id)) AS scc
    FROM verts v LEFT JOIN mutual m ON m.u = v.id
    GROUP BY v.id""",
        "condensation_layers": "WITH RECURSIVE "
        + lineitem_mixed_digraph_sql()
        + """,
    verts AS (SELECT src AS id FROM dedges UNION SELECT dst FROM dedges),
    reach(src, dst) AS (
        SELECT src, dst FROM dedges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN dedges e ON r.dst = e.src
    ),
    mutual AS (
        SELECT a.src AS u, a.dst AS v
        FROM reach a JOIN reach b ON a.src = b.dst AND a.dst = b.src
    ),
    sccmap AS (
        SELECT v.id, LEAST(v.id, COALESCE(MIN(m.v), v.id)) AS scc
        FROM verts v LEFT JOIN mutual m ON m.u = v.id
        GROUP BY v.id
    ),
    cedges AS (
        SELECT DISTINCT s.scc AS src, d.scc AS dst
        FROM dedges e JOIN sccmap s ON e.src = s.id
                      JOIN sccmap d ON e.dst = d.id
        WHERE s.scc <> d.scc
    ),
    cnodes AS (SELECT DISTINCT scc FROM sccmap),
    paths(node, depth) AS (
        SELECT scc, 0 FROM cnodes
        WHERE scc NOT IN (SELECT dst FROM cedges)
        UNION ALL
        SELECT e.dst, p.depth + 1 FROM paths p JOIN cedges e ON e.src = p.node
    )
    SELECT p.node AS scc, MAX(p.depth)::BIGINT AS layer, m.n_members
    FROM paths p
    JOIN (SELECT scc, COUNT(*)::BIGINT AS n_members FROM sccmap GROUP BY scc) m
      ON m.scc = p.node
    GROUP BY p.node, m.n_members""",
        "tool_cooccurrence": ET.tool_cooccurrence_oracle_sql(),
        "conv_influence": "WITH "
        + ET.actor_edges_cte_sql()
        + ",\n"
        + O.pagerank_unrolled_sql(PR_ITERS, final_cte="ranks")
        + """
SELECT t.conv_id, ROUND(SUM(COALESCE(r.rank, 0)), 6) AS influence
FROM transcripts t LEFT JOIN ranks r ON t.role = r.id
GROUP BY t.conv_id""",
        "conv_keep_topk": "WITH "
        + ET.actor_edges_cte_sql()
        + ",\n"
        + O.pagerank_unrolled_sql(PR_ITERS, final_cte="ranks")
        + """
SELECT t.conv_id, ROUND(SUM(COALESCE(r.rank, 0)), 6) AS influence
FROM transcripts t LEFT JOIN ranks r ON t.role = r.id
GROUP BY t.conv_id
ORDER BY influence DESC, conv_id LIMIT """
        + str(TOPK_CONVS),
        "transcript_token_stats": "WITH "
        + ET.transcripts_cte_sql()
        + ",\nturn_docs AS (SELECT conv_id || '#' || CAST(turn_idx AS VARCHAR) AS doc_id,"
        " text FROM transcripts)\n"
        + TA.token_stats_sql("turn_docs"),
        "actor_communities": "WITH RECURSIVE "
        + ET.actor_edges_cte_sql()
        + ",\n"
        + O.components_recursive_sql(),
        # composite drivers (D1/D3/§2.10): exact planted-partition recovery —
        # after canonical relabel the truth is closed-form (sources/planted.py)
        "louvain_communities": _planted_sql(PLANTED_N, PLANTED_K),
        "fm_refine_pair": _planted_sql(FM_N, 2),
        "stream_lpa": _planted_sql(PLANTED_N, PLANTED_K),
        # skew path: salted aggregate must equal the PLAIN A8 aggregation
        "salted_neighbor_weights": edges_cte
        + f""",
labels AS (SELECT DISTINCT src AS id, src % {N_LABELS} AS label FROM edges)
SELECT e.src, l.label AS nbr_label, SUM(e.weight)::BIGINT AS score
FROM edges e JOIN labels l ON e.dst = l.id
GROUP BY e.src, l.label""",
        # graph DML / coarsening
        "community_stats": edges_cte + ",\n" + O.community_stats_sql(N_LABELS),
        "edge_sample": edges_cte
        + f"""
SELECT src, dst, weight FROM edges
WHERE CAST(concat('0x', substr(md5('0' || ':' || CAST(src AS VARCHAR) || ':'
      || CAST(dst AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 < {EDGE_SAMPLE_PERMILLE}""",
        "community_representatives": edges_cte
        + f""",
labels AS (
    SELECT src AS id, CAST(src % {N_LABELS} AS BIGINT) AS label
    FROM (SELECT DISTINCT src FROM edges)
),
deg AS (SELECT src AS id, SUM(weight)::BIGINT AS degree FROM edges GROUP BY src),
ranked AS (
    SELECT l.label, l.id, d.degree,
           ROW_NUMBER() OVER (PARTITION BY l.label
                              ORDER BY d.degree DESC, l.id ASC) AS rn
    FROM labels l JOIN deg d ON l.id = d.id
)
SELECT label, id, degree, rn::INT AS rank FROM ranked WHERE rn <= {COMM_REPS_K}""",
        "conductance": edges_cte
        + ",\n"
        + O.community_stats_sql(N_LABELS).rsplit("SELECT", 1)[0]
        + """,
stats2 AS (
    SELECT s.label, COALESCE(st.e_in, 0.0) AS e_in, COALESCE(st.e_out, 0.0) AS e_out
    FROM sizes s LEFT JOIN stats st ON s.label = st.label
)
SELECT label,
       CASE WHEN 2.0 * e_in + e_out > 0
            THEN ROUND(e_out / (2.0 * e_in + e_out), 8) ELSE 0.0 END AS conductance
FROM stats2""",
        "graph_summary": edges_cte
        + """,
deg AS (
    SELECT src, COUNT(*)::BIGINT AS deg
    FROM (SELECT DISTINCT src, dst FROM edges WHERE src <> dst)
    GROUP BY src
)
SELECT COUNT(*)::BIGINT AS n_vertices,
       (SUM(deg) / 2)::BIGINT AS n_edges,
       MAX(deg)::BIGINT AS max_degree,
       ROUND(SUM(deg) / CAST(COUNT(*) AS DOUBLE), 8) AS avg_degree,
       ROUND(SUM(deg)::DOUBLE / (COUNT(*)::DOUBLE * (COUNT(*) - 1)), 8) AS density
FROM deg""",
        "coarsen": edges_cte + ",\n" + O.coarsen_sql(N_LABELS),
        "sync_communities": edges_cte
        + f""",
labels AS (SELECT DISTINCT src AS id, src % {N_LABELS} AS label FROM edges),
new_labels AS (SELECT id, CASE WHEN label IN (0, 1) THEN id ELSE label END AS label FROM labels)
SELECT l1.label AS src, l2.label AS dst, SUM(e.weight)::BIGINT AS weight
FROM edges e JOIN new_labels l1 ON e.src = l1.id JOIN new_labels l2 ON e.dst = l2.id
GROUP BY l1.label, l2.label""",
        "canonical_relabel": edges_cte + ",\n" + O.canonical_relabel_sql(N_LABELS),
        "edge_removal": edges_cte + ",\n" + O.edge_removal_sql(),
        "node_removal": edges_cte + ",\n" + O.node_removal_sql(),
        "edge_weight_lookup": edges_cte + ",\n" + O.edge_lookup_sql(),
        # quality metrics
        "modularity": edges_cte + ",\n" + O.modularity_sql(N_LABELS),
        "contingency": edges_cte + ",\n" + O.contingency_sql(N_LABELS, N_TRUTH),
        "pairwise_f1": edges_cte + ",\n" + O.pairwise_f1_sql(N_LABELS, N_TRUTH),
        "embeddedness": edges_cte + ",\n" + O.embeddedness_sql(N_LABELS),
        "edge_classification_accuracy": edges_cte + ",\n" + O.edge_cls_acc_sql(N_LABELS, N_TRUTH),
        "log_likelihood": edges_cte + ",\n" + O.log_likelihood_sql(N_LABELS),
        "nmi": edges_cte + ",\n" + O.nmi_sql(N_LABELS, N_TRUTH),
        "modularity_density": edges_cte + ",\n" + O.modularity_density_sql(N_LABELS),
        "main_community": edges_cte + ",\n" + O.main_community_sql(N_LABELS),
        # training-data pipeline: dedup
        "exact_dedup": TD.exact_dedup_sql(),
        "ngram_jaccard_pairs": TD.ngram_jaccard_pairs_sql(),
        "minhash_signatures": TD.minhash_signatures_sql(),
        "minhash_lsh_dup_pairs": TD.minhash_lsh_dup_pairs_sql(),
        "near_dup_clusters": TD.near_dup_clusters_sql(),
        "curation_keep_list": TP.curation_keep_list_sql(
            quality_min=QUALITY_MIN, rates_permille=SAMPLE_RATES
        ),
        "stream_dedup_pairs": TD.minhash_lsh_dup_pairs_sql(),
        "simhash": TD.simhash_sql(),
        "simhash_dup_pairs": TD.simhash_dup_pairs_sql(),
        "simhash_banded_dup_pairs": TD.simhash_dup_pairs_sql(max_hamming=3),
        "embedding_cosine_dup_pairs": TD.embedding_cosine_dup_pairs_sql(
            threshold=COS_DUP_THRESHOLD
        ),
        "cosine_bucketed_dup_pairs": TD.embedding_cosine_dup_pairs_sql(
            threshold=COS_DUP_THRESHOLD
        ),
        "decontamination_flags": TD.decontamination_flags_sql(
            bench_pred=f"doc_id % {BENCH_DOC_MOD} = 0"
        ),
        "bloom_decontamination": TD.bloom_decontamination_sql(
            bench_pred=f"doc_id % {BENCH_DOC_MOD} = 0"
        ),
        "pii_scrub": """
WITH injected AS (
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0
                THEN text || ' reach me at user' || CAST(doc_id AS VARCHAR)
                     || '@example.com or 55512' || CAST(doc_id AS VARCHAR)
                ELSE text END AS text
    FROM documents
)
"""
        + TA.pii_scrub_sql("injected"),
        # training-data pipeline: similarity search
        "ann_cosine_topk": TS.cosine_topk_sql(k=ANN_K),
        "embedding_quantize": "SELECT vec_id, scale, max_abs_err,"
        " CAST(generate_subscripts(codes, 1) - 1 AS INT) AS pos,"
        " unnest(codes) AS code FROM ("
        + TS.quantize_embeddings_sql()
        + ") qq",
        "ann_ivf_topk": TS.ivf_topk_sql(k=ANN_K),
        # training-data pipeline: text analysis + multimodal plumbing
        "token_stats": TA.token_stats_sql(),
        "hll_distinct": SK.hll_distinct_sql(),
        "cms_heavy_hitters": SK.cms_probe_sql(CMS_CANDIDATES),
        "priority_sample": SK.priority_sample_sql(5),
        "top_ngrams": TA.top_ngrams_sql(k=TOPNGRAM_K),
        "tfidf_topk": TA.tfidf_topk_sql(k=TFIDF_K),
        "stratum_counts": TA.stratum_counts_sql(SAMPLE_RATES),
        "mixture_weights": TA.mixture_weights_sql(MIX_BUDGET),
        "temperature_sample": TA.temperature_sample_sql(MIX_BUDGET),
        "ngram_lm_score": TA.ngram_lm_score_sql(),
        "token_pmi": TA.token_pmi_sql(min_count=20),
        "wl_refinement": edges_cte + ",\n" + WL.wl_refinement_sql(WL_ROUNDS),
        "bm25_topk": BM.bm25_topk_sql(k=10),
        "textrank_keywords": TR.textrank_keywords_sql(k=50, n_iterations=5),
        "turn_segments": ET.turn_segments_oracle_sql(threshold=0.1),
        "partition_quality": edges_cte + ",\n" + PA.partition_quality_sql(num_parts=8),
        "split_leakage": TP.split_leakage_sql(max_hamming=3),
        "hard_negative_pairs": TD.hard_negative_pairs_sql(
            min_hamming=4, max_hamming=20, n_bands=4
        ),
        "four_clique_count": edges_cte + ",\n" + _four_clique_sql(),
        "rrf_fused_topk": _rrf_sql(k=10, depth=20),
        "event_anomalies": FN.event_anomalies_sql(z=2, min_windows=5),
        "knn_label_disagreement": TS.knn_label_disagreement_sql(k=5, max_agree=1),
        "readability_scores": TA.readability_scores_sql(),
        "winnowing_fingerprints": TA.winnowing_fingerprints_sql(),
        "fastrp_embeddings": edges_cte + ",\n" + _fastrp_sql(),
        "conv_prefix_dups": ET.conv_prefix_dups_oracle_sql(),
        "retrieval_metrics": TS.retrieval_metrics_sql(k=10),
        "bpe_train": _bpe_sql(),
        "bpe_fertility": _bpe_apply_sql(),
        "cluster_silhouette": TS.cluster_silhouette_sql(),
        "label_assortativity": edges_cte
        + ",\n"
        + G.label_assortativity_sql(N_LABELS),
        "trussness": edges_cte + ",\n" + KC.trussness_unrolled_sql(TRUSS_ROUNDS),
        "influence_seeds": edges_cte + ",\n" + G.influence_seeds_sql(k=5),
        "threshold_cascade": edges_cte
        + ",\n"
        + G.threshold_cascade_sql(
            theta_permille=CASCADE_THETA_PM, rounds=CASCADE_ROUNDS
        ),
        "containment_pairs": TD.containment_pairs_sql(),
        "knn_graph_clusters": TS.knn_graph_clusters_sql(k=5),
        "linkpred_eval": _lp_eval_sql(
            lineitem_edges_sql(lineitem_where=LP_SPLIT_SQL),
            lineitem_edges_sql(),
        ),
        "actor_rank_drift": (
            "SELECT e.id AS id, e.rank AS rank_early, f.rank AS rank_full,"
            " ROUND(f.rank - e.rank, 8) AS delta FROM (WITH "
            + ET.actor_edges_cte_sql(
                "epoch_ms(ts) < (SELECT (epoch_ms(MIN(ts)) + epoch_ms(MAX(ts)))"
                " // 2 FROM events)"
            )
            + ",\n"
            + O.pagerank_unrolled_sql(PR_ITERS)
            + ") e JOIN (WITH "
            + ET.actor_edges_cte_sql()
            + ",\n"
            + O.pagerank_unrolled_sql(PR_ITERS)
            + ") f ON e.id = f.id"
        ),
        "coreness": edges_cte + ",\n" + KC.coreness_unrolled_sql(CORENESS_ROUNDS),
        "boilerplate_strip": TA.boilerplate_strip_sql(min_df=5),
        "corpus_stats": TA.corpus_stats_sql(),
        "quality_lr_fit": TA.quality_lr_fit_sql(),
        "quality_lr_score": TA.quality_lr_score_sql(),
        "kmeans_lloyd": TS.kmeans_lloyd_sql(),
        "coverage_select_topk": TD.coverage_select_topk_sql(),
        "edge_embeddedness": edges_cte + ",\n" + _edge_emb_sql(),
        "chunk_windows": TA.chunk_windows_sql(),
        "span_corruption_spans": TA.span_corruption_spans_sql(),
        "source_log_odds": TA.source_log_odds_sql(),
        "event_transitions": _evt_trans_sql(),
        "source_health_report": TP.source_health_report_sql(),
        "props_field_stats": _props_sql(),
        "triangle_estimate_sampled": edges_cte + ",\n" + _tri_est_sql(),
        "community_evolution": edges_cte
        + """,
oldlab AS (SELECT DISTINCT src AS id, src % 10 AS label FROM edges),
newlab AS (SELECT DISTINCT src AS id, src % 7 AS label FROM edges),
"""
        + _comm_evo_sql(),
        "minimum_spanning_forest": edges_cte.replace("WITH ", "WITH RECURSIVE ", 1)
        + ",\n"
        + _msf_sql(MSF_ROUNDS),
        "walk_cooccurrence": edges_cte
        + ",\n"
        + _cooc_sql(WALK_START_MOD, WALKS_PER_VERTEX, WALK_LENGTH, WALK_COOC_WINDOW),
        "cross_source_dup_matrix": TD.cross_source_dup_matrix_sql(),
        "conv_entropy": ET.conv_entropy_oracle_sql(),
        "label_centroids": TS.label_centroids_oracle_sql(),
        "latency_quantiles": ET.latency_quantiles_oracle_sql(),
        "tool_chains": "WITH "
        + ET.transcripts_cte_sql()
        + ",\n"
        + _toolchains_sql(n=2, min_count=2),
        "agent_loops": "WITH "
        + ET.transcripts_cte_sql()
        + ",\n"
        + _agentloops_sql(min_repeats=2),
        "sbm_block_matrix": edges_cte + ",\n" + O.sbm_block_matrix_sql(N_LABELS),
        "eigenvector_centrality": "WITH "
        + lineitem_directed_edges_sql()
        + ",\n"
        + eigenvector_unrolled_sql(),
        "ngram_coverage": TA.ngram_coverage_sql(),
        "semdedup": TS.semdedup_sql(threshold=SEMDEDUP_THRESHOLD),
        "butterfly_count": "WITH "
        + ET.transcripts_cte_sql()
        + """,
    incidence AS (
        SELECT role AS "left", tool AS "right" FROM transcripts
        WHERE tool IS NOT NULL
    ),
"""
        + _butterfly_sql(),
        "node_overlap_accuracy": edges_cte
        + ",\n"
        + O.node_overlap_accuracy_sql(N_LABELS, N_TRUTH),
        "symmetric_difference": edges_cte
        + ",\n"
        + O.symmetric_difference_sql(N_LABELS, N_TRUTH),
        "max_jaccard_sum": edges_cte + ",\n" + O.max_jaccard_sum_sql(N_LABELS, N_TRUTH),
        "maximal_matching_accuracy": edges_cte
        + ",\n"
        + O.maximal_matching_accuracy_sql(N_LABELS, N_TRUTH),
        "stream_pagerank": edges_cte
        + ",\n"
        + "sedges AS (SELECT src, dst, weight, "
        + md5_long_sql("concat(CAST(src AS VARCHAR), ':', CAST(dst AS VARCHAR))")
        + " % 1000 AS edge_seq FROM edges)"
        + ",\n"
        + O.stream_pagerank_unrolled_sql(STREAM_PR_BOUNDARIES, STREAM_PR_ITERS),
        "event_funnel": FN.event_funnel_sql(),
        "retention_cohorts": FN.retention_cohorts_sql(),
        "rich_club": edges_cte + G.rich_club_sql(),
        "dsir_importance": TA.dsir_importance_sql(DSIR_TARGET_PERMILLE),
        "stratum_topk_sample": TA.stratum_topk_sample_sql(STRATUM_TOPK),
        "prompt_response_pairs": ET.prompt_response_pairs_oracle_sql(),
        "dpo_pairs": ET.dpo_pairs_oracle_sql(3),
        "context_windows": ET.context_windows_oracle_sql(CTX_TURNS),
        "conv_novelty": ET.conv_novelty_oracle_sql(),
        # streaming fold must equal the one-shot batch computation
        "stream_novelty": ET.conv_novelty_oracle_sql(),
        "text_quality": TA.text_quality_sql(),
        "lang_id": TA.lang_id_sql(),
        "doc_fingerprint": TA.doc_fingerprint_sql(),
        "multimodal_decode": TM.decode_meta_sql(),
        "multimodal_resize_meta": TM.resize_meta_sql(),
        "multimodal_frame_sample": TM.frame_sample_sql(),
        "multimodal_features": TM.extract_features_sql(),
    }
