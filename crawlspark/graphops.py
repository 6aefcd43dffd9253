"""Distributed connected components over a pair list — the clustering step
a training-data dedup pipeline runs AFTER near-dup pair finding (LSH /
embedding tiers emit PAIRS; deduplication needs CLUSTERS and one canonical
representative per cluster).

Algorithm: iterative min-label propagation expressed as DataFrame joins —
each iteration every node adopts the minimum label among itself and its
neighbors; convergence when no label changes (checked by a count
aggregate, one job per iteration). This is the classic MapReduce CC
formulation (cf. Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — public literature); plain propagation converges in
O(diameter) rounds, which is the right trade for near-dup graphs whose
components are tiny and shallow (dup clusters, not social graphs). For
adversarially deep graphs raise max_iter or swap in the large-star /
small-star step — the join shape is identical.

Scale notes:
- each iteration is ONE shuffle join keyed on node id plus a map-side-
  combined min-aggregate — no driver-side adjacency, no collect;
- lineage is truncated with localCheckpoint every `checkpoint_every`
  iterations so the plan does not grow with iteration count;
- labels start as node ids and only ever decrease, so the converged label
  IS the minimum node id of the component — making `component` double as
  the canonical-representative id (is_rep = node == component).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(node, component) for every node appearing in `edges`; component =
    min node id of the connected component."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        sym.unionByName(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    for i in range(max_iter):
        prop = sym.join(
            labels.select(F.col("node").alias("b"), "lbl"), "b"
        ).select(F.col("a").alias("node"), "lbl")
        new_labels = (
            labels.unionByName(prop).groupBy("node").agg(F.min("lbl").alias("lbl"))
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=False)
        new_labels = new_labels.persist(StorageLevel.MEMORY_AND_DISK)
        changed = (
            new_labels.join(
                labels.select("node", F.col("lbl").alias("_old")), "node"
            )
            .filter(F.col("lbl") != F.col("_old"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels.select("node", F.col("lbl").alias("component"))


def dedup_clusters(pairs: DataFrame, a: str = "vec_a", b: str = "vec_b") -> DataFrame:
    """Near-dup PAIRS → per-node cluster assignment with the canonical
    representative flagged: (vec_id, cluster_id, is_rep). Keep is_rep rows,
    drop the rest — the actual dedup action over LSH/embedding pair output."""
    cc = connected_components(pairs, src=a, dst=b)
    return cc.select(
        F.col("node").alias("vec_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_rep"),
    )
