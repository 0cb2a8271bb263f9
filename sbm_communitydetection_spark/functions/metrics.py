"""Partition-quality metrics Q1-Q9 (SURVEY.md §2.9, utils/quality_measures.cpp).

Design split:
* Heavy lifting (edge scans, label joins, contingency) = Spark aggregates.
* Greedy/Hungarian matching = driver-side Python on the k×k contingency
  table (k = number of communities, small by construction) — mirroring
  the reference, which also runs these on per-community summaries.

Pairwise metrics are REFORMULATED via contingency counts (no n² cross
join, SURVEY.md §2.5 J4): for communities with sizes a_i (pred), b_j
(truth) and intersections n_ij,
    same-pair counts are  Σ C(n_ij, 2),  Σ C(a_i, 2),  Σ C(b_j, 2).

Where the reference's greedy loops are order-dependent on unordered_map
iteration (nondeterministic), we fix a deterministic tie-break
(max score, then smallest predicted label, then smallest truth label)
and document the divergence.
"""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hungarian import max_assignment_value

# ---------------------------------------------------------------------------
# Spark-side aggregates
# ---------------------------------------------------------------------------


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Q1 (utils/quality_measures.cpp:3-41, community form
    utils/utilities.cpp:25-78): Q = Σ_c [e_in2_c/2m − (deg_c/2m)²] on the
    SYMMETRIZED weighted edge table. Single-row DataFrame (modularity)."""
    ls = labels.select(F.col("id").alias("src"), F.col("label").alias("sl"))
    ld = labels.select(F.col("id").alias("dst"), F.col("label").alias("dl"))
    el = edges.join(ls, "src").join(ld, "dst")
    per = el.groupBy("sl").agg(
        F.sum(F.when(F.col("sl") == F.col("dl"), F.col("weight")).otherwise(0)).cast("double").alias("e_in2"),
        F.sum("weight").cast("double").alias("deg"),
    )
    two_m = edges.agg(F.sum("weight").cast("double").alias("two_m"))
    return per.crossJoin(two_m).agg(
        F.sum(F.col("e_in2") / F.col("two_m") - (F.col("deg") / F.col("two_m")) ** 2).alias("modularity")
    )


def modularity_variants(
    edges: DataFrame,
    labels: DataFrame,
    use_split_penalty: bool = True,
    use_density: bool = True,
) -> DataFrame:
    """A5 — Newman modularity with optional DENSITY weighting and SPLIT
    penalty (utils/utilities.cpp:80-141 ``newmansModularity_``). Single-row
    DataFrame (modularity_variant).

    Per community ci (from the community-pair edge matrix E[ci][cj] over
    the SYMMETRIZED table, intra entry halved exactly like the reference):

        d_ci    = 2·e_in / (n_ci·(n_ci−1))   if density (0 when n_ci<=1), else 1
        d_ci_cj = E[ci][cj] / (n_ci·n_cj)    if density, else 1
        penalty = Σ_{cj≠ci} E[ci][cj]·d_ci_cj / (2m)   if split penalty, else 0
        Q      += e_in·d_ci/m − ((2·e_in + e_out)·d_ci / (2m))² − penalty

    With both flags off this reduces to the standard Q (Q1). Everything is
    two groupBys on the labeled edge table + one scalar aggregate."""
    ls = labels.select(F.col("id").alias("src"), F.col("label").alias("sl"))
    ld = labels.select(F.col("id").alias("dst"), F.col("label").alias("dl"))
    # community-pair edge matrix; intra entries halved (reference :97-103)
    pair = (
        edges.join(ls, "src")
        .join(ld, "dst")
        .groupBy("sl", "dl")
        .agg(F.sum("weight").cast("double").alias("w"))
        .select(
            "sl",
            "dl",
            F.when(F.col("sl") == F.col("dl"), F.col("w") / 2).otherwise(F.col("w")).alias("w"),
        )
    )
    sizes = labels.groupBy("label").agg(F.count("*").cast("double").alias("n"))
    m_df = edges.agg((F.sum("weight") / 2).cast("double").alias("m"))
    withsz = (
        pair.join(sizes.select(F.col("label").alias("sl"), F.col("n").alias("n_src")), "sl")
        .join(sizes.select(F.col("label").alias("dl"), F.col("n").alias("n_dst")), "dl")
        .crossJoin(F.broadcast(m_df))
    )
    d_ci_cj = (
        (F.col("w") / (F.col("n_src") * F.col("n_dst"))) if use_density else F.lit(1.0)
    )
    inter = F.col("sl") != F.col("dl")
    per = withsz.groupBy("sl").agg(
        F.sum(F.when(~inter, F.col("w")).otherwise(0.0)).alias("e_in"),
        F.sum(F.when(inter, F.col("w")).otherwise(0.0)).alias("e_out"),
        (
            F.sum(F.when(inter, F.col("w") * d_ci_cj).otherwise(0.0))
            / (2.0 * F.first("m"))
            if use_split_penalty
            else F.lit(0.0)
        ).alias("penalty"),
        F.first("m").alias("m"),
        F.first("n_src").alias("n_ci"),
    )
    if use_density:
        d_ci = F.when(
            F.col("n_ci") <= 1, F.lit(0.0)
        ).otherwise(2.0 * F.col("e_in") / (F.col("n_ci") * (F.col("n_ci") - 1)))
    else:
        d_ci = F.lit(1.0)
    term = (
        F.col("e_in") * d_ci / F.col("m")
        - ((2.0 * F.col("e_in") + F.col("e_out")) * d_ci / (2.0 * F.col("m"))) ** 2
        - F.col("penalty")
    )
    return per.agg(F.round(F.sum(term), 8).alias("modularity_variant"))


def contingency(pred: DataFrame, truth: DataFrame) -> DataFrame:
    """J6: (t_label, p_label, cnt) intersection sizes; k×k result."""
    p = pred.select("id", F.col("label").alias("p_label"))
    t = truth.select("id", F.col("label").alias("t_label"))
    return t.join(p, "id").groupBy("t_label", "p_label").agg(F.count("*").alias("cnt"))


def edge_classification_accuracy(edges: DataFrame, pred: DataFrame, truth: DataFrame) -> DataFrame:
    """Q8 (utils/quality_measures.cpp:401-414): weighted fraction of
    directed edge entries whose intra/inter status agrees between the
    predicted and true partitions. Single-row DataFrame (edge_cls_acc)."""
    ps = pred.select(F.col("id").alias("src"), F.col("label").alias("psl"))
    pd_ = pred.select(F.col("id").alias("dst"), F.col("label").alias("pdl"))
    ts = truth.select(F.col("id").alias("src"), F.col("label").alias("tsl"))
    td = truth.select(F.col("id").alias("dst"), F.col("label").alias("tdl"))
    el = edges.join(ps, "src").join(pd_, "dst").join(ts, "src").join(td, "dst")
    agree = (F.col("psl") == F.col("pdl")) == (F.col("tsl") == F.col("tdl"))
    return el.agg(
        (F.sum(F.when(agree, F.col("weight")).otherwise(0)) / F.sum("weight")).alias("edge_cls_acc")
    )


def embeddedness(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Q5 (utils/quality_measures.cpp:317-333): Σ_v intra-neighbor-entries /
    total-neighbor-entries (UNWEIGHTED neighbor counts, as the reference).
    Single-row DataFrame (embeddedness)."""
    ls = labels.select(F.col("id").alias("src"), F.col("label").alias("sl"))
    ld = labels.select(F.col("id").alias("dst"), F.col("label").alias("dl"))
    el = edges.join(ls, "src").join(ld, "dst")
    per = el.groupBy("src").agg(
        (F.sum(F.when(F.col("sl") == F.col("dl"), 1).otherwise(0)) / F.count("*")).alias("emb")
    )
    return per.agg(F.sum("emb").alias("embeddedness"))


def _pair_counts(pred: DataFrame, truth: DataFrame) -> tuple[float, float, float, int]:
    """(same_both, same_pred, same_truth) unordered pair counts + n,
    from contingency aggregates — the no-cross-join reformulation."""
    ct = contingency(pred, truth)
    row = ct.agg(
        F.sum(F.col("cnt") * (F.col("cnt") - 1) / 2).alias("tp"),
        F.sum("cnt").alias("n"),
    ).collect()[0]
    tp, n = float(row.tp), int(row.n)
    pr = ct.groupBy("p_label").agg(F.sum("cnt").alias("a")).agg(
        F.sum(F.col("a") * (F.col("a") - 1) / 2)
    ).collect()[0][0]
    tr = ct.groupBy("t_label").agg(F.sum("cnt").alias("b")).agg(
        F.sum(F.col("b") * (F.col("b") - 1) / 2)
    ).collect()[0][0]
    return tp, float(pr), float(tr), n


def pairwise_f1(pred: DataFrame, truth: DataFrame) -> float:
    """Q3 (utils/quality_measures.cpp:222-262): F1 over co-membership of
    node pairs. TP = same community in both; FP = same pred only;
    FN = same truth only."""
    tp, same_pred, same_truth, _ = _pair_counts(pred, truth)
    if same_pred == 0 or same_truth == 0 or tp == 0:
        return 0.0
    precision = tp / same_pred
    recall = tp / same_truth
    return 2 * precision * recall / (precision + recall)


def log_likelihood(edges: DataFrame, labels: DataFrame) -> float:
    """Q4 (utils/quality_measures.cpp:264-315): SBM Bernoulli MLE plug-in.
    Edge counts are UNWEIGHTED adjacency entries / 2, per the reference."""
    ls = labels.select(F.col("id").alias("src"), F.col("label").alias("sl"))
    ld = labels.select(F.col("id").alias("dst"), F.col("label").alias("dl"))
    el = edges.join(ls, "src").join(ld, "dst")
    row = el.agg(
        (F.sum(F.when(F.col("sl") == F.col("dl"), 1).otherwise(0)) / 2).alias("intra_e"),
        (F.sum(F.when(F.col("sl") != F.col("dl"), 1).otherwise(0)) / 2).alias("inter_e"),
    ).collect()[0]
    intra_e, inter_e = float(row.intra_e), float(row.inter_e)
    sizes = [r.c for r in labels.groupBy("label").agg(F.count("*").alias("c")).collect()]
    n = sum(sizes)
    intra_pairs = sum(c * (c - 1) // 2 for c in sizes)
    inter_pairs = n * (n - 1) // 2 - intra_pairs
    ll = 0.0
    p_in = intra_e / intra_pairs if intra_pairs > 0 else 0.0
    p_out = inter_e / inter_pairs if inter_pairs > 0 else 0.0
    if p_in != 0:
        ll += intra_e * math.log(p_in) + (intra_pairs - intra_e) * math.log1p(-p_in) if p_in < 1 else intra_e * math.log(p_in)
    if p_out != 0:
        ll += inter_e * math.log(p_out) + (inter_pairs - inter_e) * math.log1p(-p_out) if p_out < 1 else inter_e * math.log(p_out)
    return ll


def pairwise_f1_df(pred: DataFrame, truth: DataFrame) -> DataFrame:
    """Q3 as a single-row DataFrame (f1) — fully declarative form of
    pairwise_f1: f1 = 2·TP / (same_pred + same_truth)."""
    ct = contingency(pred, truth)
    tp = ct.agg(F.sum(F.col("cnt") * (F.col("cnt") - 1) / 2).alias("tp"))
    sp = (
        ct.groupBy("p_label")
        .agg(F.sum("cnt").alias("a"))
        .agg(F.sum(F.col("a") * (F.col("a") - 1) / 2).alias("same_pred"))
    )
    st = (
        ct.groupBy("t_label")
        .agg(F.sum("cnt").alias("b"))
        .agg(F.sum(F.col("b") * (F.col("b") - 1) / 2).alias("same_truth"))
    )
    denom = F.col("same_pred") + F.col("same_truth")
    return (
        tp.crossJoin(sp)
        .crossJoin(st)
        .select(
            F.round(
                F.when(denom > 0, 2 * F.col("tp") / denom).otherwise(F.lit(0.0)), 8
            ).alias("f1")
        )
    )


def nmi_df(pred: DataFrame, truth: DataFrame) -> DataFrame:
    """Normalized mutual information between two partitions (standard
    community-detection report metric; companion to the reference's Q2-Q9
    card — no reference analogue, scope extension like §2.13).

        I   = Σ_ij (n_ij/n) · ln(n_ij·n / (a_i·b_j))
        H_p = −Σ_i (a_i/n) · ln(a_i/n),  H_t likewise
        NMI = 2·I / (H_p + H_t)          (0 when both entropies are 0)

    Everything runs on the k×k contingency table — three tiny aggregates
    after the one id-keyed join; no driver-side loops."""
    ct = contingency(pred, truth)
    n_df = ct.agg(F.sum("cnt").cast("double").alias("n"))
    pa = ct.groupBy("p_label").agg(F.sum("cnt").alias("a"))
    tb = ct.groupBy("t_label").agg(F.sum("cnt").alias("b"))
    mi = (
        ct.join(pa, "p_label")
        .join(tb, "t_label")
        .crossJoin(F.broadcast(n_df))
        .agg(
            F.sum(
                (F.col("cnt") / F.col("n"))
                * F.log((F.col("cnt") * F.col("n")) / (F.col("a") * F.col("b")))
            ).alias("mi")
        )
    )
    hp = pa.crossJoin(F.broadcast(n_df)).agg(
        (-F.sum((F.col("a") / F.col("n")) * F.log(F.col("a") / F.col("n")))).alias("hp")
    )
    ht = tb.crossJoin(F.broadcast(n_df)).agg(
        (-F.sum((F.col("b") / F.col("n")) * F.log(F.col("b") / F.col("n")))).alias("ht")
    )
    denom = F.col("hp") + F.col("ht")
    return (
        mi.crossJoin(hp)
        .crossJoin(ht)
        .select(
            F.round(
                F.when(denom > 0, 2 * F.col("mi") / denom).otherwise(F.lit(0.0)), 8
            ).alias("nmi")
        )
    )


def log_likelihood_df(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Q4 as a single-row DataFrame (log_likelihood) — declarative form of
    log_likelihood (SBM Bernoulli MLE plug-in, unweighted edge counts)."""
    ls = labels.select(F.col("id").alias("src"), F.col("label").alias("sl"))
    ld = labels.select(F.col("id").alias("dst"), F.col("label").alias("dl"))
    el = edges.join(ls, "src").join(ld, "dst")
    e_cnt = el.agg(
        (F.sum(F.when(F.col("sl") == F.col("dl"), 1).otherwise(0)) / 2).alias("intra_e"),
        (F.sum(F.when(F.col("sl") != F.col("dl"), 1).otherwise(0)) / 2).alias("inter_e"),
    )
    pairs = (
        labels.groupBy("label")
        .agg(F.count("*").alias("c"))
        .agg(
            F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("intra_pairs"),
            F.sum("c").alias("n"),
        )
        .select(
            "intra_pairs",
            (F.col("n") * (F.col("n") - 1) / 2 - F.col("intra_pairs")).alias("inter_pairs"),
        )
    )

    def term(e, p):
        prob = F.when(p > 0, e / p).otherwise(F.lit(0.0))
        return (
            F.when(prob <= 0, F.lit(0.0))
            .when(prob >= 1, e * F.log(prob))
            .otherwise(e * F.log(prob) + (p - e) * F.log(1.0 - prob))
        )

    return e_cnt.crossJoin(pairs).select(
        F.round(
            term(F.col("intra_e"), F.col("intra_pairs"))
            + term(F.col("inter_e"), F.col("inter_pairs")),
            6,
        ).alias("log_likelihood")
    )


def sbm_block_matrix(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """(r_label, s_label, block_edges, block_pairs, p_hat) for r ≤ s —
    the FULL k×k SBM connectivity-matrix MLE given a partition, the
    generalization of log_likelihood_df's 2-parameter (intra/inter)
    plug-in to per-block probabilities.

    Recovers the generator's parameters from data: on a planted-partition
    graph (sources/sbm.py, reference src/sbm.cpp:60-103) the diagonal
    estimates p_in and the off-diagonal p_out — the model-checking query
    every SBM study runs after inference (Q4's likelihood is this table
    folded to 2 cells).

    Semantics on the SYMMETRIZED unweighted edge table: each undirected
    edge appears as 2 directed rows, so r<s blocks count each edge once
    via the (sl=r, dl=s) orientation, and the diagonal halves its count.
    block_pairs = n_r·n_s off-diagonal, C(n_r, 2) on it.  Blocks with no
    observed edge still appear (p_hat = 0) via the size-table cross
    product — absence of edges between two blocks is signal, not a
    missing row.

    Scale shape: two id-keyed label joins (the J1 shape shared with
    modularity) + one k×k aggregate; the pair table is built from the
    O(k) size table's self cross-join — driver-trivial for any real k."""
    ls = labels.select(F.col("id").alias("src"), F.col("label").alias("sl"))
    ld = labels.select(F.col("id").alias("dst"), F.col("label").alias("dl"))
    el = edges.join(ls, "src").join(ld, "dst")
    # orient each undirected edge once: keep rows with sl < dl, and halve sl = dl
    obs = (
        el.filter(F.col("sl") <= F.col("dl"))
        .groupBy(F.col("sl").alias("r_label"), F.col("dl").alias("s_label"))
        .agg(
            F.sum(F.when(F.col("sl") == F.col("dl"), 0.5).otherwise(1.0))
            .cast("long")
            .alias("block_edges")
        )
    )
    sizes = labels.groupBy("label").agg(F.count("*").alias("c"))
    a = sizes.select(F.col("label").alias("r_label"), F.col("c").alias("cr"))
    b = sizes.select(F.col("label").alias("s_label"), F.col("c").alias("cs"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("r_label") <= F.col("s_label"))
        .select(
            "r_label",
            "s_label",
            F.when(
                F.col("r_label") == F.col("s_label"),
                F.col("cr") * (F.col("cr") - 1) / 2,
            )
            .otherwise(F.col("cr") * F.col("cs"))
            .cast("long")
            .alias("block_pairs"),
        )
    )
    return pairs.join(obs, ["r_label", "s_label"], "left").select(
        "r_label",
        "s_label",
        F.coalesce("block_edges", F.lit(0)).cast("long").alias("block_edges"),
        "block_pairs",
        # singleton blocks have C(1,2) = 0 possible intra pairs: p_hat 0
        F.when(
            F.col("block_pairs") > 0,
            F.round(F.coalesce("block_edges", F.lit(0)) / F.col("block_pairs"), 8),
        )
        .otherwise(F.lit(0.0))
        .alias("p_hat"),
    )


# ---------------------------------------------------------------------------
# Driver-side greedy / Hungarian matching over the contingency table
# ---------------------------------------------------------------------------


def _contingency_dicts(pred: DataFrame, truth: DataFrame):
    """(inter[(t,p)] = n_ij, t_sizes, p_sizes, n)."""
    rows = contingency(pred, truth).collect()
    inter = {(r.t_label, r.p_label): r.cnt for r in rows}
    t_sizes: dict = defaultdict(int)
    p_sizes: dict = defaultdict(int)
    for (t, p), c in inter.items():
        t_sizes[t] += c
        p_sizes[p] += c
    n = sum(t_sizes.values())
    return inter, dict(t_sizes), dict(p_sizes), n


def _greedy_match(score_fn, t_keys, p_keys):
    """Repeatedly pick the max-scoring (truth, pred) pair, remove both.
    Deterministic tie-break: score desc, then smaller pred, then smaller
    truth. Returns [(t, p, score), ...] until either side (or score) runs out."""
    t_left, p_left = set(t_keys), set(p_keys)
    out = []
    while t_left and p_left:
        best = None
        for p in sorted(p_left):
            for t in sorted(t_left):
                s = score_fn(t, p)
                if best is None or s > best[2]:
                    best = (t, p, s)
        out.append(best)
        t_left.discard(best[0])
        p_left.discard(best[1])
    return out


def node_overlap_accuracy(pred: DataFrame, truth: DataFrame) -> float:
    """Q6 (utils/quality_measures.cpp:335-399): greedy max-intersection
    matching; Σ matched common / n."""
    inter, t_sizes, p_sizes, n = _contingency_dicts(pred, truth)
    matched = _greedy_match(lambda t, p: inter.get((t, p), 0), t_sizes, p_sizes)
    return sum(s for _, _, s in matched) / n if n else 0.0


def symmetric_difference(pred: DataFrame, truth: DataFrame) -> float:
    """Q2 (utils/quality_measures.cpp:138-188): greedy max-intersection
    matching; Σ |pred \\ matched truth| + sizes of unmatched pred
    communities, / n."""
    inter, t_sizes, p_sizes, n = _contingency_dicts(pred, truth)
    matched = _greedy_match(lambda t, p: inter.get((t, p), 0), t_sizes, p_sizes)
    used_p = {p for _, p, _ in matched}
    result = sum(p_sizes[p] - s for _, p, s in matched)
    result += sum(sz for p, sz in p_sizes.items() if p not in used_p)
    return result / n if n else 0.0


def max_jaccard_sum(pred: DataFrame, truth: DataFrame) -> float:
    """Q7 (utils/quality_measures.cpp:64-136): greedy max-Jaccard matching,
    mean over max(k_true, k_pred) pairs (unmatched padding scores 0)."""
    inter, t_sizes, p_sizes, n = _contingency_dicts(pred, truth)

    def jac(t, p):
        i = inter.get((t, p), 0)
        u = t_sizes[t] + p_sizes[p] - i
        return i / u if u else 0.0

    matched = _greedy_match(jac, t_sizes, p_sizes)
    denom = max(len(t_sizes), len(p_sizes))
    return sum(s for _, _, s in matched) / denom if denom else 0.0


def maximal_matching_accuracy(pred: DataFrame, truth: DataFrame) -> float:
    """Q9 (utils/quality_measures.cpp:416-468 + hungarian_algorithm.cpp):
    optimal assignment on the truth×pred intersection matrix, / n."""
    inter, t_sizes, p_sizes, n = _contingency_dicts(pred, truth)
    t_keys, p_keys = sorted(t_sizes), sorted(p_sizes)
    matrix = [[float(inter.get((t, p), 0)) for p in p_keys] for t in t_keys]
    return max_assignment_value(matrix) / n if n else 0.0


def all_metrics(edges: DataFrame, pred: DataFrame, truth: DataFrame) -> dict[str, float]:
    """The reference's full report card (scripts/overall_run.cpp:204-327)."""
    return {
        "modularity": modularity(edges, pred).collect()[0][0],
        "symmetric_difference": symmetric_difference(pred, truth),
        "f1_score": pairwise_f1(pred, truth),
        "log_likelihood": log_likelihood(edges, pred),
        "embeddedness": embeddedness(edges, pred).collect()[0][0],
        "node_overlap_accuracy": node_overlap_accuracy(pred, truth),
        "max_jaccard_sum": max_jaccard_sum(pred, truth),
        "edge_classification_accuracy": edge_classification_accuracy(edges, pred, truth).collect()[0][0],
        "maximal_matching_accuracy": maximal_matching_accuracy(pred, truth),
    }


def community_evolution(old: DataFrame, new: DataFrame) -> DataFrame:
    """(old_label, new_label, overlap, frac_old, frac_new, event) —
    snapshot-to-snapshot community matching for dynamic tracking
    (Greene et al., ASONAM 2010 style): each OLD community maps to the
    NEW community holding most of its members (tie-break smaller
    new_label); ``event`` classifies the transition —
    'continue' when the matched pair mutually covers ≥ half of both
    sides, 'shrink' when the old community dominates the match but the
    new one grew past it, 'split' otherwise.  Members present only in
    one snapshot simply drop out of the contingency (node churn is
    allowed).

    Shape: the J6 contingency aggregate (label-pair keyed) + two
    size joins + one per-old-label window argmax — all keys are
    community labels, bounded by community counts, never |V|.
    Fractions rounded to 6 dp in both engines."""
    from pyspark.sql import Window

    cont = (
        old.select("id", F.col("label").alias("old_label"))
        .join(new.select("id", F.col("label").alias("new_label")), "id")
        .groupBy("old_label", "new_label")
        .agg(F.count("*").cast("long").alias("overlap"))
    )
    so = old.groupBy(F.col("label").alias("old_label")).agg(
        F.count("*").alias("n_old")
    )
    sn = new.groupBy(F.col("label").alias("new_label")).agg(
        F.count("*").alias("n_new")
    )
    best = (
        cont.withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("old_label").orderBy(
                    F.desc("overlap"), F.asc("new_label")
                )
            ),
        )
        .filter(F.col("rnk") == 1)
        .drop("rnk")
    )
    out = (
        best.join(so, "old_label")
        .join(sn, "new_label")
        .select(
            "old_label",
            "new_label",
            "overlap",
            F.round(F.col("overlap") / F.col("n_old"), 6).alias("frac_old"),
            F.round(F.col("overlap") / F.col("n_new"), 6).alias("frac_new"),
        )
    )
    return out.select(
        "old_label",
        "new_label",
        "overlap",
        "frac_old",
        "frac_new",
        F.when(
            (F.col("frac_old") >= 0.5) & (F.col("frac_new") >= 0.5), F.lit("continue")
        )
        .when(F.col("frac_old") >= 0.5, F.lit("shrink"))
        .otherwise(F.lit("split"))
        .alias("event"),
    )


def community_evolution_sql(old_cte: str = "oldlab", new_cte: str = "newlab") -> str:
    """DuckDB twin over two (id, label) CTEs."""
    return f"""cont AS (
    SELECT o.label AS old_label, n.label AS new_label, COUNT(*)::BIGINT AS overlap
    FROM {old_cte} o JOIN {new_cte} n ON o.id = n.id
    GROUP BY o.label, n.label
),
so AS (SELECT label AS old_label, COUNT(*) AS n_old FROM {old_cte} GROUP BY label),
sn AS (SELECT label AS new_label, COUNT(*) AS n_new FROM {new_cte} GROUP BY label),
best AS (
    SELECT old_label, new_label, overlap FROM (
        SELECT old_label, new_label, overlap,
               ROW_NUMBER() OVER (PARTITION BY old_label
                                  ORDER BY overlap DESC, new_label ASC) AS rnk
        FROM cont
    ) WHERE rnk = 1
),
scored AS (
    SELECT b.old_label, b.new_label, b.overlap,
           ROUND(b.overlap / CAST(so.n_old AS DOUBLE), 6) AS frac_old,
           ROUND(b.overlap / CAST(sn.n_new AS DOUBLE), 6) AS frac_new
    FROM best b JOIN so ON so.old_label = b.old_label
    JOIN sn ON sn.new_label = b.new_label
)
SELECT old_label, new_label, overlap, frac_old, frac_new,
       CASE WHEN frac_old >= 0.5 AND frac_new >= 0.5 THEN 'continue'
            WHEN frac_old >= 0.5 THEN 'shrink'
            ELSE 'split' END AS event
FROM scored"""


def dcsbm_loglik_df(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """(m_tot, ll) — DEGREE-CORRECTED SBM maximized log-likelihood of a
    partition (Karrer & Newman, PRE 83:016107 2011, eq. 34):

        L = Σ_rs m_rs · ln( m_rs / (κ_r · κ_s) )

    over directed block edge counts m_rs (both directions of the
    symmetric table, the paper's convention) and block degree sums κ_r.
    The plain-SBM plug-in (log_likelihood, Q4 — the reference's
    utils/quality_measures.cpp:264-315) scores hub-heavy graphs poorly
    because it must explain degree heterogeneity with block structure;
    the DC variant factors degrees out, so comparing L across candidate
    partitions (louvain vs lpa vs planted) ranks COMMUNITY structure
    only — the model-selection readout for exactly the transcript
    graphs this engine extracts (tool hubs + long-tail actors).

    All m_rs / κ counts are exact int64 from ONE doubly-labeled edge
    aggregate (the J1 join shape, k² driver-scale contingency); the log
    runs per k² cell and the sum is 6 dp-rounded.  Zero cells contribute
    zero (lim x→0 x·ln x = 0)."""
    ls = labels.select(F.col("id").alias("src"), F.col("label").alias("lr"))
    ld = labels.select(F.col("id").alias("dst"), F.col("label").alias("lc"))
    m = (
        edges.filter(F.col("src") != F.col("dst"))
        .join(ls, "src")
        .join(ld, "dst")
        .groupBy("lr", "lc")
        .agg(F.count("*").cast("long").alias("m_rs"))
    )
    kr = m.groupBy("lr").agg(F.sum("m_rs").cast("long").alias("kr"))
    kc = m.groupBy("lc").agg(F.sum("m_rs").cast("long").alias("kc"))
    return (
        m.join(kr, "lr")
        .join(kc, "lc")
        .agg(
            F.sum("m_rs").cast("long").alias("m_tot"),
            F.round(
                F.sum(
                    F.col("m_rs")
                    * F.log(F.col("m_rs") / (F.col("kr") * F.col("kc")).cast("double"))
                ),
                6,
            ).alias("ll"),
        )
    )


def dcsbm_loglik_sql(n_labels: int) -> str:
    """DuckDB twin over the `edges` CTE with derived labels id % n."""
    return f"""
dc_m AS (
    SELECT e.src % {n_labels} AS lr, e.dst % {n_labels} AS lc, COUNT(*)::BIGINT AS m_rs
    FROM edges e WHERE e.src <> e.dst
    GROUP BY 1, 2
),
dc_kr AS (SELECT lr, SUM(m_rs)::BIGINT AS kr FROM dc_m GROUP BY lr),
dc_kc AS (SELECT lc, SUM(m_rs)::BIGINT AS kc FROM dc_m GROUP BY lc)
SELECT SUM(m.m_rs)::BIGINT AS m_tot,
       ROUND(SUM(m.m_rs * ln(m.m_rs / CAST(r.kr * c.kc AS DOUBLE))), 6) AS ll
FROM dc_m m
JOIN dc_kr r ON r.lr = m.lr
JOIN dc_kc c ON c.lc = m.lc"""
