"""ACD — approximate community detection via 2-way FM refinement
(reference D3, src/approximate_community_detection.cpp:4-508).

The reference maintains a random balanced k-way partition and, whenever a
streamed edge crosses two communities, runs a Fiduccia–Mattheyses-style
balanced swap sequence between JUST those two communities: build gain heaps
both sides (:143-180), repeatedly exchange the best unfrozen node pair,
track modularity after each swap, and keep the best-modularity equal-size
prefix (run2FMAlgorithm, :182-274), with an optional ``stopBefore`` cap on
the swap count (:266-268).

The FM inner loop is inherently sequential, but touches only the two
communities' induced subgraph (~2n/k nodes) — so the Spark shape
(SURVEY.md §2.9 D3) is:

* plan the community PAIRS to refine (driver or caller),
* build each pair's induced subgraph + per-node external degree with
  Catalyst joins, keyed by a ``pair_id``,
* ``applyInPandas`` per pair: one Arrow-vectorized numpy FM pass per
  group (gains as vectors, argmax instead of the reference's string-keyed
  heap utils/heap_and_map.cpp:8-198, frozen mask instead of sets,
  cummax rollback instead of :251-265's bookkeeping),
* join the moved labels back.

Disjoint pairs refine concurrently — the parallelism the single-threaded
reference cannot express. Modularity here is GLOBAL modularity restricted
to terms the pair can change; maximizing the local objective maximizes the
global one because all other communities' terms are constant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

OUT_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("label", LongType()),
    ]
)


def _fm_pair_kernel(two_m: float, stop_before: int | None):
    """numpy FM pass over one community pair's induced subgraph."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        n = len(ids)
        side = (pdf["label"].to_numpy() == pdf["label_b"].iloc[0]).astype(np.int64)
        deg = pdf["deg"].to_numpy().astype(np.float64)  # full weighted degree
        la, lb = int(pdf["label_a"].iloc[0]), int(pdf["label_b"].iloc[0])
        idx = {v: i for i, v in enumerate(ids)}
        # dense adjacency of the induced subgraph (pair sizes ~2n/k; the
        # reference's own FM is O(size²) via heap rebuilds)
        W = np.zeros((n, n))
        for nbrs, ws, i in zip(pdf["nbr_ids"], pdf["nbr_ws"], range(n)):
            if nbrs is None:
                continue
            for v, w in zip(nbrs, ws):
                j = idx.get(v)
                if j is not None:
                    W[i, j] = w
        m = two_m / 2.0

        def q_terms(s):
            # pair-local modularity terms: e_in of both communities + degrees
            in_a = W[np.ix_(s == 0, s == 0)].sum() / 2.0
            in_b = W[np.ix_(s == 1, s == 1)].sum() / 2.0
            da = deg[s == 0].sum()
            db = deg[s == 1].sum()
            return (in_a + in_b) / m - (da / two_m) ** 2 - (db / two_m) ** 2

        best_q = q_terms(side)
        best_side = side.copy()
        frozen = np.zeros(n, dtype=bool)
        cur = side.copy()
        n_swaps = int(min((cur == 0).sum(), (cur == 1).sum()))
        if stop_before is not None:
            n_swaps = min(n_swaps, stop_before)

        def flip_best(from_side: int) -> bool:
            # FM gain of flipping node i from `from_side`: weight to other
            # side − weight to own side, plus the exact degree term of the
            # two-community Q expression (ΔQ of a single flip)
            same = (cur[None, :] == cur[:, None]).astype(np.float64)
            w_own = (W * same).sum(axis=1)
            w_oth = (W * (1.0 - same)).sum(axis=1)
            da = deg[cur == 0].sum()
            db = deg[cur == 1].sum()
            d_own = np.where(cur == 0, da, db)
            d_oth = np.where(cur == 0, db, da)
            gains = (w_oth - w_own) / m + 2.0 * deg * (d_own - d_oth - deg) / (two_m**2)
            gains[frozen | (cur != from_side)] = -np.inf
            mx = gains.max()
            if not np.isfinite(mx):
                return False
            cand = np.where(gains == mx)[0]
            i = int(cand[np.argmin(ids[cand])])  # min-id tie-break
            cur[i] = 1 - cur[i]
            frozen[i] = True
            return True

        # balanced swap sequence: one flip from each side per swap; q is
        # evaluated only at equal-size states and the best-prefix kept
        # (run2FMAlgorithm's rollback, :251-274)
        for _ in range(n_swaps):
            if not (flip_best(0) and flip_best(1)):
                break
            q = q_terms(cur)
            if q > best_q + 1e-12:
                best_q = q
                best_side = cur.copy()
        out_label = np.where(best_side == 0, la, lb)
        return pd.DataFrame({"id": ids, "label": out_label})

    return kernel


def fm_refine(
    spark: SparkSession,
    edges: DataFrame,
    labels: DataFrame,
    pairs: DataFrame,
    stop_before: int | None = None,
) -> DataFrame:
    """Refine ``labels(id, label)`` by one FM pass per community pair in
    ``pairs(label_a, label_b)`` (disjoint pairs run concurrently); returns
    the full relabeled (id, label).

    edges must be SYMMETRIZED. Unpaired communities pass through unchanged.
    """
    two_m = float(edges.agg(F.sum("weight")).collect()[0][0])
    pairs = pairs.select(
        F.least("label_a", "label_b").alias("label_a"),
        F.greatest("label_a", "label_b").alias("label_b"),
    ).distinct()
    pair_of = pairs.select(
        F.col("label_a").alias("label"), "label_a", "label_b"
    ).unionByName(pairs.select(F.col("label_b").alias("label"), "label_a", "label_b"))

    deg = edges.groupBy("src").agg(F.sum("weight").alias("deg")).withColumnRenamed("src", "id")
    members = labels.join(pair_of, "label").join(deg, "id")

    # induced adjacency: neighbors of each member WITHIN the pair's vertex
    # set, packed as arrays for the Arrow kernel
    mem_ids = members.select("id", "label_a", "label_b")
    nbrs = (
        edges.filter(F.col("src") != F.col("dst"))
        .join(mem_ids.withColumnRenamed("id", "src"), "src")
        .join(
            mem_ids.select(
                F.col("id").alias("dst"),
                F.col("label_a").alias("la2"),
                F.col("label_b").alias("lb2"),
            ),
            "dst",
        )
        .filter((F.col("label_a") == F.col("la2")) & (F.col("label_b") == F.col("lb2")))
        .groupBy("src", "label_a", "label_b")
        .agg(
            F.collect_list("dst").alias("nbr_ids"),
            F.collect_list("weight").alias("nbr_ws"),
        )
        .withColumnRenamed("src", "id")
    )
    grouped = members.join(nbrs, ["id", "label_a", "label_b"], "left")
    refined = grouped.groupBy("label_a", "label_b").applyInPandas(
        _fm_pair_kernel(two_m, stop_before), OUT_SCHEMA
    )
    untouched = labels.join(pair_of.select("label"), "label", "left_anti")
    return untouched.select("id", "label").unionByName(refined)


def random_balanced_partition(
    vertices: DataFrame, k: int, seed: int = 42
) -> DataFrame:
    """The reference's init (src/approximate_community_detection.cpp:69-91):
    a deterministic balanced k-way assignment — hash-ordered round-robin."""
    from pyspark.sql import Window

    w = Window.orderBy(F.xxhash64(F.col("id") + F.lit(seed)))
    return vertices.select(
        "id", (F.pmod(F.row_number().over(w) - 1, F.lit(k))).cast("long").alias("label")
    )
