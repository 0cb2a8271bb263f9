"""Explicit hub-vertex skew handling (north_rule: "salted, range-partitioned
CSR-style adjacency shards with explicit skew splitting of hub vertices").

The transcript link graph is scale-free-ish: tool/role actor vertices are
hubs with degrees orders of magnitude above the median (the reference never
faces this — SBM graphs are near-regular, SURVEY.md §4). Every per-edge
label/rank lookup is a shuffle join on the vertex id, and a hub key sends
its entire adjacency to ONE reducer.

Two mechanisms, layered:

* AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
  session.py) — runtime backstop for sort-merge joins.
* THIS module — deterministic salting for the hot equi-join
  edges.dst → labels.id (J1, the core join of LPA/PageRank/modularity):
  hub label rows are replicated `n_salts` times, hub edge rows pick a
  deterministic salt from xxhash64(src), and the join key becomes
  (dst, salt). Non-hub rows keep salt 0 — the replication cost is
  |hubs|·n_salts extra small-side rows, not |labels|·n_salts.

`csr_adjacency_shards` materializes the adjacency in the CSR-style layout
the north rule names: range-partitioned by src, rows sorted (src, dst)
within each shard, so per-partition kernels stream contiguous adjacency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_N_SALTS = 8


def hub_vertices(edges: DataFrame, degree_threshold: float) -> DataFrame:
    """ids whose weighted degree exceeds the threshold — the skew keys."""
    return (
        edges.groupBy("src")
        .agg(F.sum("weight").alias("degree"))
        .filter(F.col("degree") > degree_threshold)
        .select(F.col("src").alias("id"))
    )


def salted_label_join(
    edges: DataFrame,
    labels: DataFrame,
    hubs: DataFrame,
    n_salts: int = DEFAULT_N_SALTS,
    label_col: str = "nbr_label",
) -> DataFrame:
    """edges ⋈ labels on dst with hub-only salt splitting.

    Returns edges columns + ``label_col``. Equivalent to
    ``edges.join(labels.withColumnRenamed("id","dst"), "dst")`` but a hub
    dst's adjacency fans out over ``n_salts`` reducers instead of one.
    """
    hub_flag = F.broadcast(hubs.select(F.col("id").alias("dst"), F.lit(True).alias("is_hub")))

    e = edges.join(hub_flag, "dst", "left").withColumn(
        "salt",
        F.when(
            F.col("is_hub").isNotNull(), F.pmod(F.xxhash64("src"), F.lit(n_salts))
        ).otherwise(F.lit(0)),
    )
    l_rep = (
        labels.select(F.col("id").alias("dst"), F.col("label").alias(label_col))
        .join(hub_flag, "dst", "left")
        .withColumn(
            "salt",
            F.explode(
                F.when(
                    F.col("is_hub").isNotNull(),
                    F.sequence(F.lit(0), F.lit(n_salts - 1)),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .drop("is_hub")
    )
    return e.drop("is_hub").join(l_rep, ["dst", "salt"]).drop("salt")


def salted_neighbor_community_weights(
    edges: DataFrame,
    labels: DataFrame,
    hubs: DataFrame,
    n_salts: int = DEFAULT_N_SALTS,
) -> DataFrame:
    """A8 (the core LPA/Louvain aggregate) with skew-safe join AND a
    two-phase aggregation: partial sum on (src, salt2, nbr_label) before
    the final (src, nbr_label) combine, so a hub SRC's contribution rows
    also spread over reducers."""
    joined = salted_label_join(edges, labels, hubs, n_salts)
    partial = (
        joined.withColumn("salt2", F.pmod(F.xxhash64("dst"), F.lit(n_salts)))
        .groupBy("src", "salt2", "nbr_label")
        .agg(F.sum("weight").alias("w_part"))
    )
    return partial.groupBy("src", "nbr_label").agg(F.sum("w_part").alias("score"))


def csr_adjacency_shards(
    edges: DataFrame,
    path: str,
    n_shards: int = 64,
) -> None:
    """Write the adjacency as range-partitioned, (src,dst)-sorted parquet
    shards — the columnar CSR analogue of the reference's per-node
    adjacency list (src/graph.h:23). Iterative jobs reading this layout
    get co-located per-vertex adjacency without a pre-shuffle; on Iceberg
    the same layout is `PARTITIONED BY (bucket(src))` + `sortedBy(src,dst)`.
    """
    (
        edges.repartitionByRange(n_shards, "src")
        .sortWithinPartitions("src", "dst")
        .write.mode("overwrite")
        .parquet(path)
    )


def read_csr_adjacency(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)
