"""Connected components over an edge list — dedup-cluster assembly.

Near-dup detection (operators/dedup.py) emits PAIRS; a pipeline needs
CLUSTERS (every transitively-connected document under one canonical
id, so "keep one per cluster" is well-defined).  That is connected
components, computed here by iterative min-label propagation — the
standard Spark-shaped algorithm (large-star/small-star simplified):

    label(v) <- min(label(v), min over neighbors' labels)

repeated until a fixpoint.  Each round is one join + one aggregation
(two shuffles on vertex id); rounds needed = graph diameter in the
worst case, O(log n) for the hash-chain shapes dedup graphs take.
Like the K-Means loop, the only driver-side state is the convergence
scalar; labels live in a DataFrame end to end.

The final label of every vertex is the MINIMUM vertex id in its
component — deterministic, engine-agnostic, and exactly expressible as
a recursive-CTE oracle in DuckDB (transitive closure + MIN), which is
how the catalog checks it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """[id, component] for every vertex in `edges`; component = min id
    reachable.  Isolated vertices don't appear (no edges, no row) —
    callers union them back with label = own id if needed."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .cache()
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .cache()
    )
    try:
        for _ in range(max_iter):
            neighbor_min = (
                sym.join(labels, sym.b == labels.id)
                .groupBy("a")
                .agg(F.min("label").alias("nmin"))
            )
            new_labels = (
                labels.join(neighbor_min, labels.id == neighbor_min.a, "left")
                .select(
                    "id",
                    F.least(
                        F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                    ).alias("label"),
                )
                .cache()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .where(F.col("n.label") != F.col("o.label"))
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        return labels.select("id", F.col("label").alias("component"))
    finally:
        sym.unpersist()


def dedup_keep_canonical(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """End-to-end dedup: keep one canonical doc (the min id) per
    near-dup cluster, pass every unpaired doc through.  The standard
    final stage of a corpus dedup pipeline."""
    comp = connected_components(pairs)
    drop = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(drop, id_col, "left_anti")
