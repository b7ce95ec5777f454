"""Distributed connected components — the clustering step of near-dedup.

[extension] — pair generators (MinHash/SimHash/n-gram Jaccard in
``operators/dedup.py``) emit edges; turning "pairs of near-duplicates"
into "keep one doc per duplicate CLUSTER" requires the transitive
closure, i.e. connected components over the dup graph.

Spark-first shape: iterative min-label propagation (the HashToMin /
"small-star" family, Rastogi et al. 2013 §3).  Each iteration is one
join + one aggregate — pure DataFrame ops, no GraphX/RDD — and the
label frontier shrinks geometrically: rounds is O(log d) in the
component diameter.  Near-dup clusters are overwhelmingly tiny (pairs
and triples), so 3-5 rounds converge in practice; ``max_iter`` bounds
the worst case and a convergence check exits early.

Scale notes: the working set (node, label) is two longs per node —
orders of magnitude smaller than the documents that produced the
edges.  ``localCheckpoint`` truncates the growing lineage each round
(without it, the plan doubles per iteration and the driver OOMs on
plan compilation long before data is a problem at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 20
) -> DataFrame:
    """Components of the undirected graph given by (src, dst) pairs.

    Returns (node, component) where component = min node id reachable —
    a deterministic canonical labeling.  Only nodes that appear in an
    edge are returned (isolated nodes are trivially their own
    component; callers union them in if needed).
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
    )
    # symmetrize once and materialize: the edge producer may be an
    # expensive join (n-gram pairs) that must not re-execute per round
    sym = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("label"))
        .select(F.col("a").alias("node"), "label")
    )
    labels = labels.withColumn(
        "label", F.least(F.col("node"), F.col("label"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # propagate: each node adopts min(own label, neighbors' labels)
        prop = (
            sym.join(labels, sym.a == labels.node)
            .select(F.col("b").alias("node"), F.col("label"))
            .groupBy("node")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(prop, "node", "left_outer")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))
