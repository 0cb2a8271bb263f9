"""sbm_communitydetection_spark — a PySpark-native link-graph analytics engine.

A from-scratch re-expression of the capabilities of the C++ reference
AakashKath/SBM_CommunityDetection (graph construction, SBM generation,
streamed community detection, partition-quality metrics) as idiomatic
Spark DataFrame pipelines, extended with the north-star operators the
reference lacks (PageRank, connected components via large-star/small-star,
synchronous label propagation, triangle counting) and large-scale
training-data-pipeline operators (dedup, similarity search, text analysis).

Data model (SURVEY.md §1):
  vertices(id: long, label: long [, actor_key: string, kind: string])
  edges(src: long, dst: long, weight: long [, edge_seq: long])
Edges are stored SYMMETRIZED (both directions materialized); repeated
insertion accumulates weight; self-loops are dropped; total undirected
edge weight = sum(weight)/2  (reference: src/graph.cpp:206-235).
"""

__version__ = "0.1.0"
