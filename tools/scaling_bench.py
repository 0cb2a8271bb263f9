"""Two-parallelism scaling benchmark — the north_rule evidence run.

BASELINE.json's rule asks for throughput scaling efficiency >= 0.8 from N to
4N executors. No real cluster exists in this sandbox, so (per the task brief)
we run the SAME job on the SAME input at two parallelism levels —
``local[8]`` and ``local[32]`` — as the stand-in for N vs 4N executors, and
report throughput at both plus efficiency = (throughput_4N / throughput_N) / 4.

Each level runs ``bench.py`` in a FRESH subprocess (its own JVM) so the two
measurements share nothing — no warmed code cache, no reused shuffle files.

Usage:
    python tools/scaling_bench.py [sf_dir] [--repeats R] [--write-md]

``--write-md`` rewrites the measured-results section of BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEVELS = (8, 32)  # N and 4N cores (host has 32)


def run_bench(cores: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_SF_DIR=sf_dir,
        # scaling run measures the north-rule pair only, on the pure
        # shuffle path (no broadcast — the only path available at
        # 10^12 scale), over a larger amplified graph
        SPARK_GRAFT_BENCH_QUERIES="pagerank,lpa",
        SPARK_GRAFT_PR_BROADCAST="0",
        SPARK_GRAFT_BENCH_ITER_TIMING="1",
        SPARK_GRAFT_BENCH_AMPLIFY=os.environ.get("SPARK_GRAFT_BENCH_AMPLIFY", "16"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    if out.returncode != 0:
        print(out.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"bench.py failed at local[{cores}] (exit {out.returncode})")
    # bench.py prints exactly one JSON line (last non-empty line of stdout)
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def best_of(cores: int, sf_dir: str, repeats: int) -> dict:
    """Best (max edges/sec) of `repeats` fresh-JVM runs — reduces one-off
    JIT/GC noise without letting warm state leak between levels."""
    runs = [run_bench(cores, sf_dir) for _ in range(repeats)]
    return max(runs, key=lambda r: r["edges_per_sec"])


def render_md(n8: dict, n32: dict, eff: dict, sf_dir: str) -> str:
    date = datetime.date.today().isoformat()
    return f"""# BENCH/BASELINE.md — measured scaling evidence

North_rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors. Sandbox substitute (task brief): same job, same input
(`{sf_dir}`), fresh JVM per level, `local[8]` (N) vs `local[32]` (4N) on a
32-core host. Efficiency = (throughput_32 / throughput_8) / 4; a value of
1.0 means perfectly linear 4x scaling.

Measurement configuration (tools/scaling_bench.py, measured {date}):
- metric pair only (PageRank 10 iters + LPA 5 iters), best of 2 fresh-JVM
  runs per level — single runs on this host vary by 2x run-to-run.
- per-query time = Σ per-iteration wall seconds from the iteration
  driver's lineage metrics; one-time setup (adjacency build, cold parquet
  read) is excluded — it amortizes over a real run's iteration count and
  its disk-cache variance otherwise swamps the scaling signal.
- hash-amplified graph ({n8["n_directed_edges"]:,} directed edges) so
  per-iteration shuffle compute dominates scheduler latency.
- pure SHUFFLE join path (broadcast disabled): at 10^12-turn scale the
  rank/label vectors cannot broadcast, so the shuffle path is what a real
  N-vs-4N cluster comparison would exercise. (bench.py's default config
  keeps the broadcast fast path for absolute throughput — see
  docs/SCALE.md.)

Local-mode caveat: both levels share one machine's memory bandwidth and
one driver, so this measures shuffle/operator parallelism, not network
scale-out; it under-reports what disjoint executors achieve.

| metric | local[8] (N) | local[32] (4N) | ratio | efficiency |
|---|---|---|---|---|
| PR+LPA edges/sec | {n8["edges_per_sec"]:,.0f} | {n32["edges_per_sec"]:,.0f} | {eff["ratio"]:.2f}x | {eff["efficiency"]:.3f} |
| PR+LPA iterations/sec | {n8["iters_per_sec"]:.3f} | {n32["iters_per_sec"]:.3f} | {eff["ratio"]:.2f}x | {eff["efficiency"]:.3f} |
| headline total (sec) | {n8["value"]:.1f} | {n32["value"]:.1f} | — | — |

Per-query wall seconds:

| query | local[8] | local[32] | speedup |
|---|---|---|---|
""" + "".join(
        f"| {q} | {n8['queries'][q]:.2f} | {n32['queries'][q]:.2f} | "
        f"{n8['queries'][q] / max(n32['queries'][q], 1e-9):.2f}x |\n"
        for q in n8["queries"]
    ) + f"""
Directed half-edges in input: {n8["n_directed_edges"]:,}. PR iterations: 10,
LPA iterations: 5 (fixed-iteration mode; no convergence actions in the loop).

Raw JSON: `BENCH/scaling_local8.json`, `BENCH/scaling_local32.json`.
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--write-md", action="store_true")
    args = ap.parse_args()

    results = {}
    for cores in LEVELS:
        print(f"-- running bench.py at local[{cores}] on {args.sf_dir} "
              f"(best of {args.repeats}) ...", file=sys.stderr)
        results[cores] = best_of(cores, args.sf_dir, args.repeats)
        print(f"   {json.dumps(results[cores])}", file=sys.stderr)

    n8, n32 = results[LEVELS[0]], results[LEVELS[1]]
    ratio = n32["edges_per_sec"] / n8["edges_per_sec"]
    eff = {"ratio": ratio, "efficiency": ratio / (LEVELS[1] / LEVELS[0])}
    summary = {
        "metric": "scaling_efficiency_N_to_4N",
        "value": round(eff["efficiency"], 4),
        "unit": "fraction",
        "levels": {str(c): results[c] for c in LEVELS},
        "throughput_ratio": round(ratio, 4),
        "sf_dir": args.sf_dir,
    }
    print(json.dumps(summary))

    if args.write_md:
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        for cores in LEVELS:
            with open(os.path.join(REPO, "BENCH", f"scaling_local{cores}.json"), "w") as f:
                json.dump(results[cores], f, indent=2)
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
            f.write(render_md(n8, n32, eff, args.sf_dir))


if __name__ == "__main__":
    main()
