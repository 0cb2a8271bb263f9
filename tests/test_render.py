"""S7 (graphviz render) / S8 (quality plot) sinks — DOT + series data are
real and tested; rasterizers are guarded stubs (no graphviz/matplotlib in
this sandbox), mirroring the multimodal codec-stub contract."""

from __future__ import annotations

import json
import shutil

import pytest

from sbm_communitydetection_spark.sources.render import (
    COLOR_MAP,
    graph_to_dot,
    node_color,
    plot_quality_series,
    quality_series_csv,
    render_dot,
)


def _fixture(spark):
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "id long, label long"
    )
    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 0, 1), (2, 3, 1), (3, 2, 1), (1, 2, 1), (2, 1, 1)],
        "src long, dst long, weight long",
    )
    return labels, edges


def test_graph_to_dot_structure_and_colors(spark):
    labels, edges = _fixture(spark)
    dot = graph_to_dot(labels, edges)
    assert dot == graph_to_dot(labels, edges)  # deterministic
    assert '"cluster_0"' in dot and '"cluster_1"' in dot
    # node palette per label (utils/color_map.h)
    assert f'fillcolor="{COLOR_MAP[0]}"' in dot
    assert f'fillcolor="{COLOR_MAP[1]}"' in dot
    # intra edges green, the 1--2 bridge red (src/graph.cpp:188-195)
    assert '"0" -- "1" [color="#00FF00"];' in dot
    assert '"2" -- "3" [color="#00FF00"];' in dot
    assert '"1" -- "2" [color="#FF0000"];' in dot
    # each undirected edge exactly once
    assert dot.count(" -- ") == 3


def test_node_color_past_palette_is_grey():
    assert node_color(len(COLOR_MAP)) == "#808080"
    assert node_color(-1) == "#808080"


def test_graph_to_dot_refuses_unrenderable_scale(spark):
    labels, edges = _fixture(spark)
    with pytest.raises(ValueError, match="driver-scale"):
        graph_to_dot(labels, edges, max_vertices=2)


def test_render_dot_writes_dot_and_stubs_png(spark, tmp_path):
    labels, edges = _fixture(spark)
    dot = graph_to_dot(labels, edges)
    png = str(tmp_path / "g.png")
    if shutil.which("dot"):
        assert render_dot(dot, png) == png
    else:
        with pytest.raises(NotImplementedError, match="DOT written"):
            render_dot(dot, png)
    assert (tmp_path / "g.png.dot").read_text() == dot


def test_quality_series_csv_roundtrip(tmp_path):
    rows = [
        {"batch": 0, "edges_seen": 10, "modularity": 0.2, "edge_cls_acc": 0.5,
         "max_jaccard_sum": 0.4},
        {"batch": 1, "edges_seen": 20, "modularity": 0.3, "edge_cls_acc": 0.8,
         "max_jaccard_sum": 0.7},
    ]
    src = tmp_path / "m.jsonl"
    src.write_text("".join(json.dumps(r) + "\n" for r in rows))
    out = tmp_path / "series.csv"
    parsed = quality_series_csv(str(src), str(out))
    assert [r["edges_seen"] for r in parsed] == [10, 20]
    lines = out.read_text().strip().split("\n")
    assert lines[0] == "edges_seen,modularity,edge_cls_acc,max_jaccard_sum"
    assert lines[1].startswith("10,0.2,0.5,0.4")


def test_plot_quality_series_guarded(tmp_path):
    src = tmp_path / "m.jsonl"
    src.write_text(json.dumps({"edges_seen": 10, "modularity": 0.5}) + "\n")
    png = str(tmp_path / "p.png")
    try:
        import matplotlib  # noqa: F401

        have_mpl = True
    except ImportError:
        have_mpl = False
    if have_mpl:
        assert plot_quality_series(str(src), png) == png
    else:
        with pytest.raises(NotImplementedError, match="CSV written"):
            plot_quality_series(str(src), png)
        assert (tmp_path / "p.png.csv").exists()
