"""S5 — per-dataset results report sink (scripts/overall_run.cpp:60-327).

The reference writes a results.txt per test dataset: run parameters, the
original + per-algorithm community listings, then per-metric rankings of
the algorithms (runtime :204-223, modularity :225-244, nodeOverlapAccuracy
:246-265, maxJaccardSum :267-285, edgeClassificationAccuracy :287-306,
maximalMatchingAccuracy :308-327).

Engine shape: metrics land in a tidy DataFrame (algorithm, metric, value)
written as parquet — the queryable artifact — and the human report is
rendered driver-side from that same table (collect() of a k×m table is
trivially small at any scale; the per-vertex listings stream through
``toLocalIterator`` and are capped).
"""

from __future__ import annotations

import time
from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession

from ..functions.metrics import all_metrics

RANKED_METRICS = [
    ("runtime_sec", False),  # lower is better
    ("modularity", True),
    ("node_overlap_accuracy", True),
    ("max_jaccard_sum", True),
    ("edge_classification_accuracy", True),
    ("maximal_matching_accuracy", True),
]


def evaluate_algorithms(
    spark: SparkSession,
    edges: DataFrame,
    truth: DataFrame,
    predictions: Mapping[str, DataFrame],
    runtimes: Mapping[str, float] | None = None,
) -> DataFrame:
    """metrics(algorithm, metric, value) over every predicted partition."""
    rows = []
    for algo, pred in predictions.items():
        m = all_metrics(edges, pred, truth)
        if runtimes and algo in runtimes:
            m["runtime_sec"] = float(runtimes[algo])
        for metric, value in m.items():
            rows.append((algo, metric, float(value)))
    return spark.createDataFrame(rows, "algorithm string, metric string, value double")


def render_report(
    metrics: DataFrame,
    params: Mapping[str, object] | None = None,
    listings: Mapping[str, DataFrame] | None = None,
    max_listing_rows: int = 200,
) -> str:
    """results.txt-style text report from the tidy metrics table."""
    by_metric: dict[str, list[tuple[str, float]]] = {}
    for r in metrics.collect():
        by_metric.setdefault(r.metric, []).append((r.algorithm, r.value))

    lines: list[str] = ["=" * 60, "RESULTS", "=" * 60]
    if params:
        lines.append("\nParameters:")
        for k, v in params.items():
            lines.append(f"  {k}: {v}")
    if listings:
        for name, df in listings.items():
            lines.append(f"\nCommunities [{name}] (first {max_listing_rows}):")
            for i, row in enumerate(df.toLocalIterator()):
                if i >= max_listing_rows:
                    lines.append("  ...")
                    break
                lines.append(f"  Node: {row[0]} Community: {row[1]}")
    for metric, higher_better in RANKED_METRICS:
        if metric not in by_metric:
            continue
        ranked = sorted(by_metric[metric], key=lambda t: t[1], reverse=higher_better)
        lines.append(f"\nRanking by {metric} ({'desc' if higher_better else 'asc'}):")
        for pos, (algo, value) in enumerate(ranked, 1):
            lines.append(f"  {pos}. {algo}: {value:.6f}")
    return "\n".join(lines) + "\n"


def write_report(
    spark: SparkSession,
    out_dir: str,
    edges: DataFrame,
    truth: DataFrame,
    predictions: Mapping[str, DataFrame],
    runtimes: Mapping[str, float] | None = None,
    params: Mapping[str, object] | None = None,
) -> str:
    """Write metrics parquet + results.txt under out_dir; returns report text."""
    import os

    metrics = evaluate_algorithms(spark, edges, truth, predictions, runtimes)
    metrics.write.mode("overwrite").parquet(os.path.join(out_dir, "metrics.parquet"))
    text = render_report(
        metrics,
        params=dict(params or {}, generated_unix=int(time.time())),
        listings=predictions,
    )
    with open(os.path.join(out_dir, "results.txt"), "w") as f:
        f.write(text)
    return text
