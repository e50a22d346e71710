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


_CHECKPOINT_EVERY = 5

# Observability: rounds executed by the most recent connected_components
# call in this process.  The plan audit (tools/audit_plans.py) reports
# iterative operators as "per-round shape x observed rounds" — walking
# the returned frame's full pre-checkpoint lineage instead would count
# every round's nodes as if they were one executed plan.
LAST_RUN_ROUNDS = 0


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """[id, component] for every vertex in `edges`; component = min id
    reachable.  Isolated vertices don't appear (no edges, no row) —
    callers union them back with label = own id if needed.

    Iterative-DataFrame hygiene (the 100 TB diameter-deep-graph traps):
      * the adjacency includes SELF-LOOPS, so `min(label)` over a
        vertex's neighborhood IS its new label — each round references
        the previous labels frame exactly once (one join + one agg).
        The naive two-reference form (neighbor-min joined back against
        labels) doubles the logical plan every round: J(n+1)=2J(n)+2,
        exponential plan-analysis blowup long before data is the issue;
      * convergence is detected from a `chg` flag computed inside the
        same aggregation (new label < the self-loop row's old label) —
        one action per round over the cached frame, no extra join;
      * every _CHECKPOINT_EVERY rounds the labels are checkpointed,
        truncating residual lineage so plan depth stays O(1) and a lost
        executor never recomputes the whole chain.  Default is
        localCheckpoint (executor-local blocks: fast, but a LOST
        executor loses its blocks — fine for short interactive jobs);
        pass `checkpoint_dir` (HDFS/S3) for a RELIABLE checkpoint on
        long multi-hour runs where executor churn is expected.
    """
    # cache the INPUT first: the symmetrization union references the
    # edges plan twice, so an expensive upstream (MinHash candidate
    # generation) would execute twice just to materialize `sym`
    edges = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).cache()
    sym = (
        edges.unionAll(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .cache()
    )
    # self-loops: every vertex sees its own label in the neighborhood min
    adj = sym.unionAll(
        sym.select("a").distinct().select("a", F.col("a").alias("b"))
    ).cache()
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .cache()
    )
    global LAST_RUN_ROUNDS
    try:
        for i in range(max_iter):
            LAST_RUN_ROUNDS = i + 1
            new_labels = (
                adj.join(labels, adj.b == labels.id)
                .groupBy("a")
                .agg(
                    F.min("label").alias("new_label"),
                    # the self-loop row carries this vertex's old label
                    F.min(F.when(F.col("b") == F.col("a"), F.col("label"))).alias(
                        "old_label"
                    ),
                )
                .select(
                    F.col("a").alias("id"),
                    F.col("new_label").alias("label"),
                    (F.col("new_label") < F.col("old_label")).alias("chg"),
                )
            )
            if (i + 1) % _CHECKPOINT_EVERY == 0:
                if checkpoint_dir is not None:
                    spark = new_labels.sparkSession
                    spark.sparkContext.setCheckpointDir(checkpoint_dir)
                    new_labels = new_labels.checkpoint(eager=True)
                else:
                    new_labels = new_labels.localCheckpoint(eager=True)
            else:
                new_labels = new_labels.cache()
            changed = new_labels.where("chg").count()
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        return labels.select("id", F.col("label").alias("component"))
    finally:
        edges.unpersist()
        sym.unpersist()
        adj.unpersist()


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
