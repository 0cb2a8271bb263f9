"""EP1 lifecycle test: `run.py --config` for every algorithm_number.

Mirrors the reference's dispatch (src/main.cpp:67-104): each algorithm
runs generate → stream → detect → report in a fresh subprocess (run.py
owns its SparkSession and stops it), and must leave a complete output
set whose labels cover every generated vertex exactly once.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("algo_no", [1, 2, 4])
def test_run_ep1_lifecycle(tmp_path, algo_no):
    cfg = {
        "nodes": 20,
        "edges": 50,
        "communities": 2,
        "radius": 2,
        "intra_community_edge_probability": 0.9,
        "inter_community_edge_probability": 0.1,
        "algorithm_number": algo_no,
        "uneven_node_distribution": False,
        "n_batches": 3,
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    out = tmp_path / "out"

    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "run.py"),
         "--config", str(cfg_path), "--out", str(out), "--cores", "4"],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    report = (out / "results.txt").read_text()
    assert "Ranking by modularity" in report
    assert os.path.isdir(out / "labels.parquet")
    assert os.path.isdir(out / "metrics.parquet")

    import duckdb

    rows = duckdb.sql(
        f"SELECT id, label FROM read_parquet('{out}/labels.parquet/*.parquet')"
    ).fetchall()
    ids = [r[0] for r in rows]
    assert sorted(ids) == list(range(20))  # every vertex labeled exactly once
    assert all(r[1] is not None for r in rows)
