"""Mechanical audit of the driver CORRECTNESS window allocation.

VERDICT r3 #6: window allocation must be auditable without archaeology —
_LAST_VERIFIED records each gate entry's most recent driver/judge value
check, _CHANGED_SINCE_VERIFIED records stale evidence, and these tests
pin the rotation rules so a changed op can never silently sit outside
the 50-entry window the round driver actually grades.

No SparkSession needed — this audits the entry-point metadata only.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import pytest


@pytest.fixture(scope="module")
def entry_mod():
    root = Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test", root / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("spark_entry_under_test", mod)
    spec.loader.exec_module(mod)
    return mod


def _query_keys(entry_mod):
    import re

    src = (Path(entry_mod.__file__)).read_text()
    body = src[src.index("def queries()") : src.index("def oracle_sql()")]
    seen, order = set(), []
    for k in re.findall(r'"([a-z0-9_]+)": _q_', body):
        if k not in seen:
            seen.add(k)
            order.append(k)
    return order


def test_window_is_exactly_50_unique_known_entries(entry_mod):
    w = entry_mod._WINDOW_FIRST
    assert len(w) == 50
    assert len(set(w)) == 50
    assert set(w) <= set(_query_keys(entry_mod))


def test_every_changed_op_is_windowed(entry_mod):
    assert set(entry_mod._CHANGED_SINCE_VERIFIED) <= set(entry_mod._WINDOW_FIRST[:50])


def test_last_verified_covers_every_query_exactly(entry_mod):
    keys = set(_query_keys(entry_mod))
    lv = entry_mod._LAST_VERIFIED
    assert set(lv) == keys, (
        f"missing: {sorted(keys - set(lv))}; stale: {sorted(set(lv) - keys)}"
    )
    legal = {None, "r1", "r2", "r3", "r4", "judge-r2", "judge-r3", "judge-r4"}
    assert all(v in legal for v in lv.values())


def test_window_slots_go_to_evidence_need(entry_mod):
    """Every windowed entry is either changed-since-verified or has no
    driver CORRECTNESS row yet (evidence is judge-only or absent) — no
    slot is spent re-checking a driver-rowed entry while the no-row
    backlog is nonempty.  (Since the r4 VERDICT's full-suite judge run,
    'never checked' means value is None OR judge-rN; driver rows are
    the rN values.)"""
    lv = entry_mod._LAST_VERIFIED
    changed = set(entry_mod._CHANGED_SINCE_VERIFIED)
    backlog = {k for k, v in lv.items() if v is None or str(v).startswith("judge-")}
    for k in entry_mod._WINDOW_FIRST:
        v = lv.get(k)
        assert k in changed or v is None or str(v).startswith("judge-"), (
            f"window slot wasted on {k} (last verified {v}) "
            f"while backlog has {len(backlog - set(entry_mod._WINDOW_FIRST))} entries"
        )


def test_window_head_matches_queries_order(entry_mod):
    """queries() must actually serve the window first — the reorder in
    queries() has to agree with _WINDOW_FIRST."""
    order = _query_keys(entry_mod)
    head = [k for k in entry_mod._WINDOW_FIRST if k in set(order)]
    d = entry_mod.queries()
    assert list(d)[: len(head)] == head
