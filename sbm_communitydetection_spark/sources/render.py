"""Rendering sinks — the reference's two visualization outputs (S7, S8).

S7 — Graphviz community render (reference: src/graph.cpp:121-203
``Graph::draw``): one ``cluster_<label>`` subgraph per community, nodes
filled with the label's palette color (utils/color_map.h:9-40, grey
``#808080`` past the 30-entry palette — src/graph.cpp:196-203), edges
green ``#00FF00`` intra-community / red ``#FF0000`` inter
(src/graph.cpp:188-195).  The reference links libgvc and renders PNG
in-process; the Spark-first split is:

* DOT text generation (``graph_to_dot``) — pure and testable: collect a
  BOUNDED driver-side sample (rendering is inherently a driver/VISUAL
  scale operation — a 10^12-edge graph is not drawable; the reference
  only ever draws its n<=100 fixture graphs) and emit deterministic DOT.
* Rasterization (``render_dot``) — delegates to the ``dot`` binary when
  present; this sandbox has no graphviz, so it raises a clearly-marked
  NotImplementedError after writing the .dot file (same contract as the
  multimodal codec stubs).

S8 — quality-measures plot (reference: scripts/self_run.cpp:68-106
``plot_results``): x = edges seen, y = the per-batch quality series from
the streaming driver's metrics log (S6), ylim [0, 1], one named series
per measure.  The reference reads its accuracy .txt and calls
matplotlib-cpp; here the DATA assembly (read S6 JSONL → tidy CSV) always
runs and is tested, while the PNG step imports matplotlib inside a
guard (not installed in this sandbox) — the CSV is the durable artifact
a real deployment would ship to a dashboard anyway.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# utils/color_map.h:9-40 — the reference's 30-label palette, then grey
# (src/graph.cpp:196-203).
COLOR_MAP = [
    "#BD9E39", "#1F77B4", "#AEC7E8", "#FF7F0E", "#FFBB78", "#2CA02C",
    "#98DF8A", "#D62728", "#FF9896", "#9467BD", "#C5B0D5", "#8C564B",
    "#C49C94", "#E377C2", "#F7B6D2", "#7F7F7F", "#C7C7C7", "#BCBD22",
    "#DBDB8D", "#17BECF", "#9EDAE5", "#393B79", "#5254A3", "#6B6ECF",
    "#9C9EDE", "#637939", "#8CA252", "#B5CF6B", "#CEDB9C", "#8C6D31",
]
DEFAULT_COLOR = "#808080"
INTRA_EDGE_COLOR = "#00FF00"  # src/graph.cpp:189-191
INTER_EDGE_COLOR = "#FF0000"  # src/graph.cpp:192-194


def node_color(label: int) -> str:
    """getNodeColor (src/graph.cpp:196-203): palette by label index."""
    return COLOR_MAP[label] if 0 <= label < len(COLOR_MAP) else DEFAULT_COLOR


def graph_to_dot(
    labels: DataFrame,
    edges: DataFrame,
    max_vertices: int = 10_000,
) -> str:
    """Deterministic DOT text for ``labels(id, label)`` + symmetric
    ``edges(src, dst, weight)`` — Graph::draw's document, decoupled from
    the rasterizer.

    Collects to the driver by DESIGN (a render is a visual-scale
    artifact); refuses anything bigger than ``max_vertices`` rather than
    silently truncating — callers subset first (e.g. one community via
    getCommunities/J-ops, or sample_edges)."""
    n = labels.limit(max_vertices + 1).count()
    if n > max_vertices:
        raise ValueError(
            f"graph_to_dot: > {max_vertices} vertices; rendering is a "
            "driver-scale operation — subset or sample the graph first"
        )
    lab_rows = sorted((r[0], r[1]) for r in labels.select("id", "label").collect())
    lab = dict(lab_rows)
    # undirected edge set, each pair once (the symmetric table has both
    # directions; Graph::draw walks each node's edgeList the same way)
    edge_rows = sorted(
        (r[0], r[1])
        for r in edges.select("src", "dst").filter(F.col("src") < F.col("dst")).distinct().collect()
    )
    out = ["graph g {"]
    by_label: dict = {}
    for v, l in lab_rows:
        by_label.setdefault(l, []).append(v)
    for l in sorted(by_label):
        out.append(f'  subgraph "cluster_{l}" {{')
        for v in by_label[l]:
            c = node_color(int(l)) if isinstance(l, int) else DEFAULT_COLOR
            out.append(
                f'    "{v}" [color="{c}", style="filled", fillcolor="{c}"];'
            )
        out.append("  }")
    for s, d in edge_rows:
        c = INTRA_EDGE_COLOR if lab.get(s) == lab.get(d) else INTER_EDGE_COLOR
        out.append(f'  "{s}" -- "{d}" [color="{c}"];')
    out.append("}")
    return "\n".join(out) + "\n"


def render_dot(dot_text: str, out_png: str) -> str:
    """Rasterize DOT → PNG via the graphviz binary (gvRenderFilename's
    out-of-process analogue). Always writes ``<out_png>.dot``; raises
    NotImplementedError when no ``dot`` binary exists (this sandbox) —
    the .dot artifact is complete and renderable elsewhere."""
    dot_path = out_png + ".dot"
    os.makedirs(os.path.dirname(out_png) or ".", exist_ok=True)
    with open(dot_path, "w") as f:
        f.write(dot_text)
    dot_bin = shutil.which("dot")
    if dot_bin is None:
        raise NotImplementedError(
            f"graphviz 'dot' binary not available; DOT written to {dot_path} "
            "(render with: dot -Tpng -o out.png that_file)"
        )
    subprocess.run([dot_bin, "-Tpng", "-o", out_png, dot_path], check=True)
    return out_png


def quality_series_csv(metrics_jsonl: str, out_csv: str) -> list[dict]:
    """S8 data assembly (plot_results' file-read half,
    scripts/self_run.cpp:69-89): stream-driver metrics JSONL (S6) → tidy
    CSV of (edges_seen, modularity, edge_cls_acc, max_jaccard_sum).
    Returns the parsed rows.  The reference also plots maximal-matching
    accuracy; the stream driver logs the two measures it computes
    per-batch — add Q9 to _batch_metrics if that series is wanted (it is
    a k×k Hungarian, cheap, but doubles per-batch metric actions)."""
    rows = []
    with open(metrics_jsonl) as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))
    cols = ["edges_seen", "modularity", "edge_cls_acc", "max_jaccard_sum"]
    os.makedirs(os.path.dirname(out_csv) or ".", exist_ok=True)
    with open(out_csv, "w") as f:
        f.write(",".join(cols) + "\n")
        for r in rows:
            f.write(",".join(str(r.get(c, "")) for c in cols) + "\n")
    return rows


def plot_quality_series(metrics_jsonl: str, out_png: str) -> str:
    """plot_results (scripts/self_run.cpp:68-106): named series over
    edges-seen, ylim [0,1], legend, save PNG. CSV is always written next
    to the PNG; the matplotlib import is guarded (not in this sandbox)."""
    rows = quality_series_csv(metrics_jsonl, out_png + ".csv")
    try:
        import matplotlib  # noqa: F401
        import matplotlib.pyplot as plt
    except ImportError as e:
        raise NotImplementedError(
            f"matplotlib not available; series CSV written to {out_png}.csv"
        ) from e
    matplotlib.use("Agg")
    x = [r["edges_seen"] for r in rows]
    for key, style, name in (
        ("edge_cls_acc", "g-", "Edge Classification Accuracy"),
        ("max_jaccard_sum", "b-", "Max Jaccard Sum"),
        ("modularity", "y-", "Modularity"),
    ):
        if any(key in r for r in rows):
            plt.plot(x, [r.get(key) for r in rows], style, label=name)
    plt.ylim(0, 1)
    plt.xlabel("Number of Edges")
    plt.ylabel("Quality Measures")
    plt.legend()
    plt.savefig(out_png)
    plt.close()
    return out_png
