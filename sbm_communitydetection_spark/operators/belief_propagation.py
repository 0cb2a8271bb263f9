"""Synchronous SBM belief propagation — the engine form of the reference's
StreamBP (src/belief_propagation.cpp:4-174; README.md:21 cites NeurIPS 2021
streaming BP).

The reference streams one edge at a time and pushes asynchronous updates
through an r-hop BFS ball (src/belief_propagation.cpp:86-95,128-167). The
engine op is the PUBLISHED synchronous formulation (SURVEY.md §5 hard part 3):
every superstep updates ALL directed messages simultaneously,

    msg'[i→j][s] ∝ prior_i[s] · Π_{u∈N(i)\\{j}}  (p_out + (p_in−p_out)·msg[u→i][s])^w_u

computed in log space with the standard exclusion trick — one grouped Arrow
kernel per superstep does:

    lt[u→i][s] = w_u · ln(p_out + (p_in−p_out)·msg[u→i][s])      (A9 term)
    tot_i[s]   = Σ_u lt[u→i][s]
    msg'[i→j]  = softmax_s( ln prior_i[s] + tot_i[s] − lt[j→i][s] )

and the final belief/argmax (A10) is softmax(ln prior + tot) / argmax_s.
Edge weight acts as edge multiplicity (the reference accumulates repeated
edges into weights, src/graph.cpp:24-26).

Spark shape: messages are one row per DIRECTED edge (SURVEY.md §1.1),
``(src, dst, belief: array<double>)``. Each superstep is ONE shuffle
(groupBy dst) + one ``applyInPandas`` kernel — the vectorized pandas/Arrow
scoring kernel of the north star; no per-row Python. Per-vertex groups mean
hub vertices produce large Arrow batches; AQE skew handling plus the salted
degree pre-aggregation in operators/skew.py keep the upstream shuffle
balanced (kernel memory is O(degree·k) which fits even 10^7-degree hubs).

Noisy side information: the reference draws a WRONG label with probability
α = 1 − 1/k under integer division — α is always exactly 1.0 for k ≥ 2
(src/belief_propagation.cpp:18,20-35), i.e. side info is a uniformly random
wrong label. We implement the published parameterization instead —
``prior[s] = (1−noise)·1[s=obs] + noise/k`` — and document the divergence;
``noise=1.0`` with adversarial observations reproduces the quirk's effect.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..plans.iterate import IterationDriver

MSG_SCHEMA = StructType(
    [
        StructField("src", LongType()),
        StructField("dst", LongType()),
        StructField("belief", ArrayType(DoubleType())),
    ]
)

BELIEF_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("label", LongType()),
        StructField("belief", ArrayType(DoubleType())),
    ]
)


def noisy_priors(observed: DataFrame, k: int, noise: float) -> DataFrame:
    """priors(id, prior: array<double>) from observed labels (id, label).

    prior[s] = (1−noise)·1[s=label] + noise/k  — pure column math via
    F.transform (JVM-side), replacing src/belief_propagation.cpp:20-35.
    """
    base = noise / k
    return observed.select(
        "id",
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda s: F.when(s == F.col("label"), F.lit(1.0 - noise + base)).otherwise(
                F.lit(base)
            ),
        ).alias("prior"),
    )


def _softmax(logits: np.ndarray) -> np.ndarray:
    m = logits.max(axis=-1, keepdims=True)
    e = np.exp(logits - m)
    return e / e.sum(axis=-1, keepdims=True)


def _superstep_kernel(p_in: float, p_out: float):
    """Grouped kernel: all incoming messages of one vertex i → all outgoing."""
    diff = p_in - p_out

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        i = pdf["dst"].iloc[0]
        srcs = pdf["src"].to_numpy()
        msgs = np.stack(pdf["belief"].to_numpy())  # (deg, k)
        w = pdf["weight"].to_numpy()[:, None].astype(np.float64)
        log_prior = np.log(np.asarray(pdf["prior"].iloc[0], dtype=np.float64))
        lt = w * np.log(p_out + diff * msgs)  # (deg, k)
        tot = lt.sum(axis=0)  # (k,)
        out = _softmax(log_prior[None, :] + tot[None, :] - lt)  # (deg, k)
        return pd.DataFrame(
            {"src": np.full(len(srcs), i), "dst": srcs, "belief": list(out)}
        )

    return kernel


def _finalize_kernel(p_in: float, p_out: float):
    diff = p_in - p_out

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        i = pdf["dst"].iloc[0]
        msgs = np.stack(pdf["belief"].to_numpy())
        w = pdf["weight"].to_numpy()[:, None].astype(np.float64)
        log_prior = np.log(np.asarray(pdf["prior"].iloc[0], dtype=np.float64))
        b = _softmax(log_prior + (w * np.log(p_out + diff * msgs)).sum(axis=0))
        return pd.DataFrame(
            {"id": [i], "label": [int(np.argmax(b))], "belief": [b]}
        )

    return kernel


def belief_propagation(
    spark: SparkSession,
    edges: DataFrame,
    priors: DataFrame,
    k: int,
    p_in: float,
    p_out: float,
    max_iterations: int = 10,
    tolerance: float = 1e-6,
    driver: IterationDriver | None = None,
) -> DataFrame:
    """beliefs(id, label, belief) after synchronous BP on the SYMMETRIZED
    ``edges(src, dst, weight)`` with ``priors(id, prior: array<double>)``.

    tolerance < 0 runs exactly ``max_iterations`` supersteps (oracle-parity
    mode, no convergence actions in the loop); otherwise iterate until
    max |Δmessage| ≤ tolerance.
    """
    driver = driver or IterationDriver(spark, run_id="bp")
    fixed_iters = tolerance < 0

    # Per-iteration join inputs, partitioned once by the kernel's grouping
    # key so every superstep reuses the same shuffle layout.
    ew = edges.select("src", "dst", "weight").repartition("dst")
    pr = priors.select(F.col("id").alias("dst"), "prior").repartition("dst")
    ew = ew.localCheckpoint(eager=True)
    pr = pr.localCheckpoint(eager=True)

    init = ew.select("src", "dst", F.array(*[F.lit(1.0 / k)] * k).alias("belief"))

    step_kernel = _superstep_kernel(p_in, p_out)

    def step(msgs: DataFrame, i: int):
        joined = ew.join(msgs, ["src", "dst"]).join(pr, "dst")
        new = joined.groupBy("dst").applyInPandas(step_kernel, MSG_SCHEMA)
        if fixed_iters:
            return new, float("inf")
        delta = (
            new.select("src", "dst", F.col("belief").alias("nb"))
            .join(msgs, ["src", "dst"])
            .select(
                F.aggregate(
                    F.zip_with("nb", "belief", lambda a, b: F.abs(a - b)),
                    F.lit(0.0),
                    lambda acc, x: F.greatest(acc, x),
                ).alias("d")
            )
            .agg(F.max("d"))
            .collect()[0][0]
        )
        return new, float(delta)

    result = driver.run(
        init, step, max_iterations=max_iterations, tolerance=tolerance, metric_name="max_msg_delta"
    )
    final = ew.join(result.state, ["src", "dst"]).join(pr, "dst")
    return final.groupBy("dst").applyInPandas(_finalize_kernel(p_in, p_out), BELIEF_SCHEMA)


# -- pure-python oracle (tests) ---------------------------------------------


def bp_oracle(
    edges: list[tuple[int, int, int]],
    priors: dict[int, list[float]],
    k: int,
    p_in: float,
    p_out: float,
    n_iterations: int,
) -> dict[int, tuple[int, list[float]]]:
    """Reference implementation on a tiny symmetrized edge list."""
    diff = p_in - p_out
    inc: dict[int, list[tuple[int, int]]] = {}
    for s, d, w in edges:
        inc.setdefault(d, []).append((s, w))
    msg = {(s, d): [1.0 / k] * k for s, d, _ in edges}
    wt = {(s, d): w for s, d, w in edges}

    def lt(u, i, m):
        return [wt[(u, i)] * math.log(p_out + diff * m[(u, i)][s]) for s in range(k)]

    for _ in range(n_iterations):
        new = {}
        for i, nbrs in inc.items():
            lts = {u: lt(u, i, msg) for u, _ in nbrs}
            tot = [sum(lts[u][s] for u, _ in nbrs) for s in range(k)]
            lp = [math.log(priors[i][s]) for s in range(k)]
            for u, _ in nbrs:
                logits = [lp[s] + tot[s] - lts[u][s] for s in range(k)]
                m = max(logits)
                e = [math.exp(x - m) for x in logits]
                z = sum(e)
                new[(i, u)] = [x / z for x in e]
        msg = new
    out = {}
    for i, nbrs in inc.items():
        lts = {u: lt(u, i, msg) for u, _ in nbrs}
        tot = [sum(lts[u][s] for u, _ in nbrs) for s in range(k)]
        logits = [math.log(priors[i][s]) + tot[s] for s in range(k)]
        m = max(logits)
        e = [math.exp(x - m) for x in logits]
        z = sum(e)
        b = [x / z for x in e]
        out[i] = (b.index(max(b)), b)
    return out
