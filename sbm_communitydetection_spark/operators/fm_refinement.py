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
    """numpy FM pass over one community pair's induced subgraph.

    Adjacency is a CSR-style ragged layout (no dense n×n matrix — pair
    sizes are ~2n/k and a dense matrix would be O(size²) memory), and
    gains update INCREMENTALLY after each flip: only the flipped node's
    neighbors change w_own/w_oth, the degree-balance term is O(1) from
    running (dA, dB). Total work O(swaps · (avg_deg + n_vectorized))
    instead of the naive O(swaps · n²) — the vectorized analogue of the
    reference's heap-maintained gains (utils/heap_and_map.cpp:8-198)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        n = len(ids)
        side = (pdf["label"].to_numpy() == pdf["label_b"].iloc[0]).astype(np.int64)
        deg = pdf["deg"].to_numpy().astype(np.float64)  # full weighted degree
        la, lb = int(pdf["label_a"].iloc[0]), int(pdf["label_b"].iloc[0])
        idx = {v: i for i, v in enumerate(ids)}
        # CSR ragged adjacency of the induced subgraph
        nbr_idx: list[np.ndarray] = []
        nbr_w: list[np.ndarray] = []
        for nbrs, ws in zip(pdf["nbr_ids"], pdf["nbr_ws"]):
            if nbrs is None or len(nbrs) == 0:
                nbr_idx.append(np.empty(0, dtype=np.int64))
                nbr_w.append(np.empty(0))
                continue
            js, wws = [], []
            for v, w in zip(nbrs, ws):
                j = idx.get(v)
                if j is not None:
                    js.append(j)
                    wws.append(float(w))
            nbr_idx.append(np.asarray(js, dtype=np.int64))
            nbr_w.append(np.asarray(wws))
        m = two_m / 2.0

        cur = side.copy()
        # per-node weight to own/other side under `cur`
        w_own = np.zeros(n)
        w_oth = np.zeros(n)
        for i in range(n):
            if len(nbr_idx[i]):
                same = cur[nbr_idx[i]] == cur[i]
                w_own[i] = nbr_w[i][same].sum()
                w_oth[i] = nbr_w[i][~same].sum()
        in_pair = (w_own.sum()) / 2.0  # Σ intra-side weight (both sides)
        dA = deg[cur == 0].sum()
        dB = deg[cur == 1].sum()

        def q_now() -> float:
            return in_pair / m - (dA / two_m) ** 2 - (dB / two_m) ** 2

        best_q = q_now()
        best_side = cur.copy()
        frozen = np.zeros(n, dtype=bool)
        n_swaps = int(min((cur == 0).sum(), (cur == 1).sum()))
        if stop_before is not None:
            n_swaps = min(n_swaps, stop_before)

        def flip_best(from_side: int) -> bool:
            nonlocal in_pair, dA, dB
            # ΔQ of flipping i: (w_oth − w_own)/m + degree-balance term
            d_own = np.where(cur == 0, dA, dB)
            d_oth = np.where(cur == 0, dB, dA)
            gains = (w_oth - w_own) / m + 2.0 * deg * (d_own - d_oth - deg) / (two_m**2)
            gains[frozen | (cur != from_side)] = -np.inf
            mx = gains.max()
            if not np.isfinite(mx):
                return False
            cand = np.where(gains == mx)[0]
            i = int(cand[np.argmin(ids[cand])])  # min-id tie-break
            # apply flip incrementally
            in_pair += w_oth[i] - w_own[i]
            if cur[i] == 0:
                dA -= deg[i]
                dB += deg[i]
            else:
                dB -= deg[i]
                dA += deg[i]
            cur[i] = 1 - cur[i]
            w_own[i], w_oth[i] = w_oth[i], w_own[i]
            for j, w in zip(nbr_idx[i], nbr_w[i]):
                if cur[j] == cur[i]:  # j is now same-side as i
                    w_own[j] += w
                    w_oth[j] -= w
                else:
                    w_own[j] -= w
                    w_oth[j] += w
            frozen[i] = True
            return True

        # balanced swap sequence: one flip from each side per swap; q is
        # evaluated only at equal-size states and the best-prefix kept
        # (run2FMAlgorithm's rollback, :251-274)
        for _ in range(n_swaps):
            if not (flip_best(0) and flip_best(1)):
                break
            q = q_now()
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
    # left join + coalesce: an isolated (zero-degree) vertex whose label is
    # in a pair must still reach the kernel — an inner join would silently
    # drop it from the returned (id, label) set (ADVICE r1)
    members = labels.join(pair_of, "label").join(deg, "id", "left").withColumn(
        "deg", F.coalesce(F.col("deg"), F.lit(0.0))
    )

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
