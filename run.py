"""EP1 — config-driven run: generate → stream → algorithm → report.

The reference's lifecycle (S1 + EP1/EP2): `./main <config.json>` reads
utils/sequence_generator.cpp:14-58's JSON schema, generates a seeded SBM
edge sequence, streams it through the algorithm selected by
`algorithm_number` (src/main.cpp:67-104), and dumps per-node labels +
a rendered result. This is the Spark analogue:

    python run.py --config config/default.json [--out OUT_DIR]

Accepted config keys (the reference's schema, same names):
    nodes, edges, communities, radius,
    intra_community_edge_probability, inter_community_edge_probability,
    algorithm_number (1=DCD streaming, 2=StreamBP, 3=ACD/FM, 4=exact ILP),
    uneven_node_distribution (as in the reference, the flag only relaxes
    the nodes % communities == 0 validation — the n mod k leftover
    vertices keep label=id / offset=-1 and receive no edges,
    utils/sequence_generator.cpp:82-84 + src/graph.cpp:33-40)
plus engine extras (optional): seed (default 42), n_batches (default 10),
noise (BP side-information noise, default 0.5).

Outputs under --out (default ./run_output):
    results.txt      — ranked metric report (sources/report.py, S5 sink)
    metrics.parquet  — tidy (algorithm, metric, value) table
    labels.parquet   — final (id, label) partition
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config", required=True, help="JSON config (reference schema)")
    ap.add_argument("--out", default="run_output", help="output directory")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    with open(args.config) as f:
        cfg = json.load(f)

    n = int(cfg.get("nodes", 20))
    m = int(cfg.get("edges", 50))
    k = int(cfg.get("communities", 5))
    radius = int(cfg.get("radius", 3))
    p_in = float(cfg.get("intra_community_edge_probability", 0.9))
    p_out = float(cfg.get("inter_community_edge_probability", 0.1))
    algo_no = int(cfg.get("algorithm_number", 3))
    seed = int(cfg.get("seed", 42))
    n_batches = int(cfg.get("n_batches", 10))
    noise = float(cfg.get("noise", 0.5))

    from pyspark.sql import functions as F

    from sbm_communitydetection_spark.operators.graph_ops import symmetrize
    from sbm_communitydetection_spark.session import get_spark
    from sbm_communitydetection_spark.sources.report import write_report
    from sbm_communitydetection_spark.sources.sbm import generate_sbm

    spark = get_spark(app_name="run", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    uneven = bool(cfg.get("uneven_node_distribution", False))
    vertices, stream = generate_sbm(
        spark, n=n, k=k, m=m, p_in=p_in, p_out=p_out, seed=seed, uneven=uneven
    )
    stream = stream.select(
        "src", "dst", F.lit(1).cast("long").alias("weight"), "edge_seq"
    ).localCheckpoint(eager=True)
    truth = vertices.select("id", "label").localCheckpoint(eager=True)

    t0 = time.monotonic()
    if algo_no == 1:
        # DCD — streaming community tracking (src/main.cpp:67-73)
        from sbm_communitydetection_spark.streaming.stream_driver import (
            stream_community_detection,
        )

        res = stream_community_detection(
            spark, stream, n_batches=n_batches, truth=truth
        )
        labels, edges, algo = res.labels, res.edges, "dcd_stream"
    elif algo_no == 2:
        # StreamBP with r-hop radius (src/main.cpp:74-88)
        from sbm_communitydetection_spark.operators.belief_propagation import noisy_priors
        from sbm_communitydetection_spark.streaming.stream_bp import (
            stream_belief_propagation,
        )

        priors = noisy_priors(truth, k, noise)
        beliefs = stream_belief_propagation(
            spark, stream, priors, k=k, p_in=p_in, p_out=p_out,
            radius=radius, n_batches=n_batches,
        )
        labels = beliefs.select("id", "label")
        edges, algo = symmetrize(stream.select("src", "dst", "weight")), "stream_bp"
    elif algo_no == 3:
        # ACD — balanced k-way init + FM pair refinement (src/main.cpp:89-95)
        from sbm_communitydetection_spark.operators.fm_refinement import (
            fm_refine,
            random_balanced_partition,
        )

        edges = symmetrize(stream.select("src", "dst", "weight")).localCheckpoint(eager=True)
        labels = random_balanced_partition(vertices.select("id"), k, seed=seed)
        # fm_refine requires DISJOINT pairs per pass (a community in two
        # pairs would be refined twice concurrently) — schedule all C(k,2)
        # pairs as k-1 rounds of disjoint pairs (circle method), feeding
        # labels forward, the batched form of the reference's one-pair-at-
        # a-time loop (src/approximate_community_detection.cpp:93-141)
        ids = list(range(k)) + ([None] if k % 2 else [])
        for _ in range(len(ids) - 1):
            rnd = [
                (ids[i], ids[len(ids) - 1 - i])
                for i in range(len(ids) // 2)
                if ids[i] is not None and ids[len(ids) - 1 - i] is not None
            ]
            pairs = spark.createDataFrame(
                [(min(a, b), max(a, b)) for a, b in rnd], "label_a long, label_b long"
            )
            labels = fm_refine(spark, edges, labels, pairs).localCheckpoint(eager=True)
            ids.insert(1, ids.pop())  # rotate all but the first
        algo = "acd_fm"
    elif algo_no == 4:
        # exact ILP-grade oracle (src/main.cpp:96-103; n-bounded)
        from sbm_communitydetection_spark.functions.exact_oracle import exact_max_modularity

        edges = symmetrize(stream.select("src", "dst", "weight")).localCheckpoint(eager=True)
        _, lab = exact_max_modularity(edges)
        labels = spark.createDataFrame(list(lab.items()), "id long, label long")
        algo = "exact_ilp"
    else:
        raise SystemExit(f"unknown algorithm_number {algo_no} (expected 1-4)")
    runtime = time.monotonic() - t0

    if algo_no not in (1,):
        edges = edges.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)

    os.makedirs(args.out, exist_ok=True)
    labels.write.mode("overwrite").parquet(os.path.join(args.out, "labels.parquet"))
    text = write_report(
        spark,
        args.out,
        edges,
        truth,
        predictions={algo: labels},
        runtimes={algo: runtime},
        params={
            "nodes": n, "edges": m, "communities": k, "radius": radius,
            "intra_community_edge_probability": p_in,
            "inter_community_edge_probability": p_out,
            "algorithm_number": algo_no, "seed": seed,
            "uneven_node_distribution": bool(cfg.get("uneven_node_distribution", False)),
        },
    )
    print(text)
    spark.stop()


if __name__ == "__main__":
    main()
