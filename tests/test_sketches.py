"""Sketch-family guarantees: HLL error bound, CMS exact-or-over,
priority sampling's weight proportionality.  Cross-engine value parity
is the driver gate's job; these tests pin the PROBABILISTIC contracts
the gate's hash equality can't express."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sbm_communitydetection_spark.textops import sketches as SK


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


def test_hll_within_expected_error(spark, docs):
    """m=64 registers → ~13% typical error; assert a generous 3σ-ish 25%
    per group against the exact distinct-bigram count."""
    from sbm_communitydetection_spark.textops.portable import shingles_col

    exact = {
        r.source: r.d
        for r in docs.select(
            "source", F.explode(shingles_col(F.col("text"), 2)).alias("g")
        )
        .groupBy("source")
        .agg(F.countDistinct("g").alias("d"))
        .collect()
    }
    for r in SK.hll_distinct(docs).collect():
        rel = abs(r.est_distinct - exact[r.source]) / exact[r.source]
        assert rel < 0.25, (r.source, r.est_distinct, exact[r.source])


def test_hll_linear_counting_regime(spark):
    """Small cardinalities take the linear-counting branch and stay tight
    (< 10% at n≈20 with m=64)."""
    rows = [(i, " ".join(f"w{i}a w{i}b w{i}c".split()), "s") for i in range(10)]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    est = SK.hll_distinct(d).collect()[0].est_distinct
    assert abs(est - 20) / 20 < 0.10  # 2 distinct bigrams per doc


def test_cms_never_underestimates(spark, docs):
    """Count-Min estimates are exact-or-over for every probe, including
    an absent token (0 or positive collision mass, never negative)."""
    cands = ["table", "row", "zebra", "quasar"]
    true = {
        r.t: r.c
        for r in docs.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    for r in SK.cms_probe(docs, cands).collect():
        assert r.est_count >= true.get(r.token, 0)
    # heavy tokens: w=256 vs ~40-token vocab → exact on this corpus
    got = {r.token: r.est_count for r in SK.cms_probe(docs, cands).collect()}
    assert got["table"] == true["table"] and got["zebra"] == 0


def test_priority_sample_prefers_heavy_weights(spark):
    """A doc with 100× the weight of 200 light docs is (essentially
    always) selected; output is exactly k per stratum."""
    rows = [(0, "x", "s", 10_000)] + [(i, "x", "s", 100) for i in range(1, 201)]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string, n_chars long")
    got = SK.priority_sample(d, k=5).collect()
    assert len(got) == 5
    assert 0 in {r.doc_id for r in got}


def test_priority_sample_k_per_stratum(spark, docs):
    per = (
        SK.priority_sample(docs, k=5)
        .groupBy("source")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    assert all(r.c == 5 for r in per) and len(per) == 20
