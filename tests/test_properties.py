"""Property-based tests (hypothesis): random graphs vs plain-Python oracles.

Each property generates small random edge lists and checks the Spark
operator against an independent driver-side reference implementation —
union-find for components, dict accumulation for symmetrize, O(n²) pair
enumeration for pairwise F1. Few examples (Spark jobs are the cost),
but the inputs hit shapes the fixed corpus never does: parallel edges,
self-loops, negative-weight cancellation, singleton/empty graphs.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sbm_communitydetection_spark.functions.metrics import pairwise_f1
from sbm_communitydetection_spark.operators.components import connected_components
from sbm_communitydetection_spark.operators.graph_ops import canonical_relabel, symmetrize

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=-2, max_value=3),
    ),
    min_size=1,
    max_size=24,
)


def _py_symmetrize(rows):
    acc: dict = defaultdict(int)
    for s, d, w in rows:
        if s == d:
            continue
        acc[(s, d)] += w
        acc[(d, s)] += w
    return {k: v for k, v in acc.items() if v != 0}


@given(edge_lists)
@SETTINGS
def test_symmetrize_matches_python_oracle(spark, rows):
    df = spark.createDataFrame(rows, "src long, dst long, weight long")
    got = {(r.src, r.dst): r.weight for r in symmetrize(df).collect()}
    assert got == _py_symmetrize(rows)
    # structural invariant: output is symmetric with equal weights
    assert all(got.get((d, s)) == w for (s, d), w in got.items())


def _py_components(rows):
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d, _ in rows:
        parent[find(s)] = find(d)
    return {v: min(u for u in parent if find(u) == find(v)) for v in parent}


@given(edge_lists)
@SETTINGS
def test_components_match_union_find(spark, rows):
    df = spark.createDataFrame(rows, "src long, dst long, weight long")
    got = {r.id: r.component for r in connected_components(spark, df).collect()}
    assert got == _py_components(rows)


labelings = st.lists(
    st.integers(min_value=-5, max_value=5), min_size=1, max_size=15
).map(lambda ls: [(i, l) for i, l in enumerate(ls)])


@given(labelings)
@SETTINGS
def test_canonical_relabel_properties(spark, rows):
    df = spark.createDataFrame(rows, "id long, label long")
    out = {r.id: r.label for r in canonical_relabel(df).collect()}
    orig = dict(rows)
    assert set(out) == set(orig)
    # dense 0..k-1 range
    k = len(set(orig.values()))
    assert set(out.values()) == set(range(k))
    # same partition structure: equal old labels <-> equal new labels
    for i in orig:
        for j in orig:
            assert (orig[i] == orig[j]) == (out[i] == out[j])


def _py_pairwise_f1(pred, truth):
    ids = sorted(truth)
    tp = fp = fn = 0
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            i, j = ids[a], ids[b]
            p = pred[i] == pred[j]
            t = truth[i] == truth[j]
            tp += p and t
            fp += p and not t
            fn += t and not p
    if tp == 0:
        return 0.0
    prec, rec = tp / (tp + fp), tp / (tp + fn)
    return 2 * prec * rec / (prec + rec)


@given(
    st.integers(min_value=2, max_value=12).flatmap(
        lambda n: st.tuples(
            st.lists(st.integers(0, 3), min_size=n, max_size=n),
            st.lists(st.integers(0, 3), min_size=n, max_size=n),
        )
    )
)
@SETTINGS
def test_pairwise_f1_matches_bruteforce(spark, pt):
    pred_ls, truth_ls = pt
    pred = {i: l for i, l in enumerate(pred_ls)}
    truth = {i: l for i, l in enumerate(truth_ls)}
    pdf = spark.createDataFrame(list(pred.items()), "id long, label long")
    tdf = spark.createDataFrame(list(truth.items()), "id long, label long")
    got = pairwise_f1(pdf, tdf)
    assert abs(got - _py_pairwise_f1(pred, truth)) < 1e-9


# ---------------------------------------------------------------------------
# round-3 session-2 ops: butterfly census, block matrix, loops
# ---------------------------------------------------------------------------

bipartite_lists = st.lists(
    st.tuples(st.integers(min_value=0, max_value=6), st.integers(min_value=0, max_value=6)),
    min_size=1,
    max_size=20,
)


def _py_butterflies(rows):
    from itertools import combinations

    nbrs: dict = defaultdict(set)
    for l, r in rows:
        nbrs[l].add(r)
    wedge_pairs = 0
    butterflies = 0
    for a, b in combinations(sorted(nbrs), 2):
        c = len(nbrs[a] & nbrs[b])
        wedge_pairs += c
        butterflies += c * (c - 1) // 2
    return wedge_pairs, butterflies


@given(bipartite_lists)
@SETTINGS
def test_butterfly_count_matches_bruteforce(spark, rows):
    from sbm_communitydetection_spark.operators.triangles import butterfly_count

    df = spark.createDataFrame(rows, "left long, right long")
    got = butterfly_count(df).collect()[0]
    wp, bf = _py_butterflies(set(rows))
    assert (got.n_wedge_pairs or 0, got.n_butterflies or 0) == (wp, bf)


@given(edge_lists)
@SETTINGS
def test_sbm_block_matrix_marginals(spark, rows):
    """Σ block_edges = undirected edge count; Σ block_pairs = C(n, 2)."""
    from sbm_communitydetection_spark.functions.metrics import sbm_block_matrix

    df = symmetrize(
        spark.createDataFrame([(s, d, 1) for s, d, _ in rows], "src long, dst long, weight long")
    )
    if df.count() == 0:
        return
    verts = sorted({r.src for r in df.select("src").distinct().collect()})
    labels = spark.createDataFrame([(v, v % 3) for v in verts], "id long, label long")
    out = sbm_block_matrix(df, labels).collect()
    n_undirected = df.count() // 2
    n = len(verts)
    assert sum(r.block_edges for r in out) == n_undirected
    assert sum(r.block_pairs for r in out) == n * (n - 1) // 2
    assert all(0.0 <= r.p_hat <= 1.0 for r in out if r.block_pairs > 0)


tool_seqs = st.lists(
    st.lists(st.sampled_from(["f", "s", "g", None]), min_size=1, max_size=8),
    min_size=1,
    max_size=4,
)


@given(tool_seqs)
@SETTINGS
def test_agent_loops_matches_python_scan(spark, convs):
    import datetime as dt

    from sbm_communitydetection_spark.operators.extract import agent_loops

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (f"c{ci}", ti, "a", "x", tool, t0)
        for ci, seq in enumerate(convs)
        for ti, tool in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    # python reference: max consecutive same-tool run among tool turns
    expect: dict = {}
    for ci, seq in enumerate(convs):
        tools = [t for t in seq if t is not None]
        run, prev = 0, None
        best: dict = defaultdict(int)
        for t in tools:
            run = run + 1 if t == prev else 1
            prev = t
            best[t] = max(best[t], run)
        for t, b in best.items():
            if b >= 2:
                expect[(f"c{ci}", t)] = b
    got = {(r.conv_id, r.tool): r.max_run for r in agent_loops(df, min_repeats=2).collect()}
    assert got == expect
