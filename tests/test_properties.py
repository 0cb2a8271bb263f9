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
