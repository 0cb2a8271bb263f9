"""S5 report sink: metrics table + rendered rankings."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from sbm_communitydetection_spark.operators.graph_ops import symmetrize
from sbm_communitydetection_spark.sources.report import evaluate_algorithms, write_report


def test_report_sink(spark, tmp_path):
    e = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    edges = symmetrize(
        spark.createDataFrame([(s, d, 1) for s, d in e], "src long, dst long, weight long")
    )
    truth = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "id long, label long"
    )
    perfect = truth
    junk = truth.select("id", F.pmod(F.col("id"), F.lit(2)).cast("long").alias("label"))
    out = str(tmp_path / "report")
    os.makedirs(out, exist_ok=True)
    text = write_report(
        spark,
        out,
        edges,
        truth,
        {"perfect": perfect, "junk": junk},
        runtimes={"perfect": 1.0, "junk": 2.0},
        params={"n": 6, "k": 2},
    )
    assert os.path.exists(f"{out}/results.txt")
    assert os.path.exists(f"{out}/metrics.parquet")
    m = spark.read.parquet(f"{out}/metrics.parquet")
    rows = {(r.algorithm, r.metric): r.value for r in m.collect()}
    assert rows[("perfect", "maximal_matching_accuracy")] == 1.0
    assert rows[("junk", "maximal_matching_accuracy")] < 1.0
    # rankings render with the better algorithm first
    mod_section = text.split("Ranking by modularity")[1].splitlines()
    assert "perfect" in mod_section[1]
    assert "Ranking by runtime_sec" in text
