"""S2/S3/S4 golden-input codecs: edges.txt, labels.txt, dirname decode."""

from __future__ import annotations

from sbm_communitydetection_spark.sources.text_io import (
    decode_dataset_dirname,
    read_edges_txt,
    read_labels_txt,
)


def test_read_edges_txt_order_and_duplicates(spark, tmp_path):
    p = tmp_path / "edges.txt"
    # mirrors test_data/20_40_2_2_25_75/edges.txt shape: dup edges allowed
    p.write_text("18 10\n6 10\n4 0\n18 10\n\n  7   9  \n")
    df = read_edges_txt(spark, str(p))
    rows = sorted((r.edge_seq, r.src, r.dst) for r in df.collect())
    assert [(s, d) for _, s, d in rows] == [(18, 10), (6, 10), (4, 0), (18, 10), (7, 9)]
    # arrival order preserved by edge_seq (monotone per original line order)
    seqs = [q for q, _, _ in rows]
    assert seqs == sorted(seqs)


def test_read_labels_txt(spark, tmp_path):
    p = tmp_path / "labels.txt"
    p.write_text("0 0 2\n1 1 0\n2 0 1\n")
    got = {(r.id, r.label, r.offset) for r in read_labels_txt(spark, str(p)).collect()}
    assert got == {(0, 0, 2), (1, 1, 0), (2, 0, 1)}


def test_decode_dataset_dirname():
    d = decode_dataset_dirname("/some/where/20_40_2_2_25_75/")
    assert d == {
        "nodes": 20,
        "edges": 40,
        "communities": 2,
        "radius": 2,
        "p_out": 0.25,
        "p_in": 0.75,
    }
