"""Determinism across parallelism levels (SURVEY.md §5): same seed ⇒
byte-identical results at local[2] vs local[8], fresh JVM each."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SNIPPET = """
import sys, hashlib
sys.path.insert(0, {repo!r})
import pyspark.sql.functions as F
from sbm_communitydetection_spark.session import get_spark
from sbm_communitydetection_spark.sources.transcripts import generate_transcripts
from sbm_communitydetection_spark.operators.extract import extract_graph
from sbm_communitydetection_spark.operators.label_propagation import label_propagation
from sbm_communitydetection_spark.operators.pagerank import pagerank

spark = get_spark(app_name="det", cores={cores}, shuffle_partitions={cores})
spark.sparkContext.setLogLevel("ERROR")
t, _, _ = generate_transcripts(spark, n=60, k=3, m=250, seed=77)
vertices, edges = extract_graph(t)
edges = edges.localCheckpoint(eager=True)
lpa = label_propagation(spark, edges, max_iterations=5, variant="plain", tolerance=-1.0).state
pr = pagerank(spark, edges, tolerance=-1.0, max_iterations=4)
rows = sorted((r.id, r.label) for r in lpa.collect())
prs = sorted((r.id, round(r.rank, 10)) for r in pr.collect())
h = hashlib.sha256((str(rows) + str(prs)).encode()).hexdigest()
print("HASH:" + h)
"""


def _run(cores: int) -> str:
    out = subprocess.run(
        [sys.executable, "-c", SNIPPET.format(repo=REPO, cores=cores)],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("HASH:")]
    assert lines, out.stdout[-2000:]
    return lines[-1]


def test_same_results_local2_vs_local8():
    assert _run(2) == _run(8)
