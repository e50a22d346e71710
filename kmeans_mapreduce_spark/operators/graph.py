"""Iterative graph operators: PageRank and fixed-depth BFS.

The reference has no graph surface (its only iteration is the K-Means
Lloyd loop, master.go:123-236); these reuse the exact same driver-loop
shape as operators/kmeans.py: a SMALL per-node state frame re-joined
against a static edge frame each round, with the loop count fixed and
data-independent so results are deterministic and SQL-expressible.

Scale notes (100 TB posture):
- State is O(nodes): (node, value) — the joins are hash-partitioned on
  the node key both sides; pre-partitioning state and edges on the same
  key makes every round a co-located join (bucket the edge table by
  src at write time, as operators/bucketing.py does for facts).
- Each round is ONE shuffle (the contribution aggregation); the edge
  frame is scanned once per round, never mutated.
- localCheckpoint every round truncates the lineage so the plan stays
  O(1) per round instead of O(rounds) (same pattern as
  operators/components.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _truncate(df: DataFrame, checkpoint_dir: str | None) -> DataFrame:
    """Per-round lineage truncation.  localCheckpoint (default) is
    fast but lives in non-replicated executor storage; pass a
    `checkpoint_dir` (HDFS/S3) for a reliable checkpoint on long runs
    where losing an executor must not restart the whole iteration
    chain — same tradeoff as operators/components.py."""
    if checkpoint_dir is not None:
        spark = df.sparkSession
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """PageRank with uniform init, uniform dangling-mass redistribution.

    ``nodes``: one column ``node`` (every vertex, including dangling).
    ``edges``: columns ``src``, ``dst`` (directed; parallel edges count
    double, matching the SQL oracle's semantics).

    Per round:  pr'(v) = (1-d)/N + d * (sum_{u->v} pr(u)/outdeg(u)
                                        + dangling_mass / N)
    with dangling_mass = sum of pr over nodes with outdeg 0 — the
    standard power-iteration step, deterministic for a fixed round
    count.  Returns (node, pr) UNROUNDED; callers round for reporting.

    The dangling scalar is computed per round with a tiny agg and
    re-broadcast as a literal-free cross join of one row — the same
    "k×(d+1) rows to the driver" budget argument as the Lloyd loop."""
    # The edge frame is referenced EVERY round (outdeg + contribution
    # join); without a cache an expensive upstream plan (e.g. the k-NN
    # builder) re-executes per iteration — measured 95s -> ~35s at
    # sf0.1 for the knn-graph PageRank.  Safe to unpersist after the
    # loop: the returned state is checkpointed, not lineage-dependent.
    edges = edges.cache()
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("outdeg")
    ).cache()
    n_nodes = nodes.count()
    state = nodes.select("node", F.lit(1.0 / n_nodes).alias("pr"))
    base = (1.0 - damping) / n_nodes

    # Both per-round SUMs run as DECIMAL(38,18): double summation
    # follows shuffle-fetch order, which is timing-dependent under
    # concurrent load — a 1-ulp jitter once flipped a pr value sitting
    # on a 6-dp rounding boundary (observed as a bimodal oracle hash).
    # Decimal addition is exact and commutative, so the round's result
    # is bit-identical regardless of partition arrival order; each
    # TERM is decimally rounded from the same double every run, so
    # terms are deterministic too.
    _dec = "decimal(38,18)"
    for _ in range(iterations):
        with_deg = state.join(outdeg, "node", "left")
        dangling = (
            with_deg.where(F.col("outdeg").isNull())
            .agg(
                F.coalesce(
                    F.sum(F.col("pr").cast(_dec)).cast("double"), F.lit(0.0)
                ).alias("m")
            )
            .collect()[0]["m"]
        )
        contribs = (
            with_deg.where(F.col("outdeg").isNotNull())
            .join(edges, with_deg["node"] == edges["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.sum((F.col("pr") / F.col("outdeg")).cast(_dec))
                .cast("double")
                .alias("c")
            )
        )
        state = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(dangling / n_nodes))
                ).alias("pr"),
            )
        )
        state = _truncate(state, checkpoint_dir)  # per-round lineage cut
    edges.unpersist()
    outdeg.unpersist()
    return state


def bfs_hops(
    sources: DataFrame,
    edges: DataFrame,
    max_hops: int = 4,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fixed-depth directed BFS: minimum hop count (<= max_hops) from
    any source vertex, sources themselves at hop 0.

    ``sources``: one column ``node``; ``edges``: ``src``, ``dst``.
    Frontier expansion with a min-merge each round — the iterative
    equivalent of the oracle's recursive CTE, but each round is one
    equi-join + one min-agg instead of a transitive-closure blowup.
    Rounds are fixed at max_hops, so reached set and hop values are
    deterministic regardless of partitioning."""
    # same per-round re-execution trap as pagerank: the edge plan is
    # joined once per hop — cache it for the loop
    edges = edges.cache()
    dist = sources.select("node", F.lit(0).alias("hop"))
    frontier = dist
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"), F.lit(h).alias("hop"))
            .distinct()
        )
        # keep only genuinely new nodes (min-hop semantics)
        frontier = _truncate(
            nxt.join(dist, "node", "left_anti"), checkpoint_dir
        )
        if frontier.isEmpty():
            break
        dist = _truncate(dist.unionByName(frontier), checkpoint_dir)
    edges.unpersist()
    return dist


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over a directed edge list.

    Canonicalizes to an undirected a<b edge set once (symmetrize +
    distinct, one shuffle), then enumerates a<b<c via the standard
    two-join wedge closure.  Every join keys on a node id, so with
    degree bounded by k (a k-NN graph) intermediate wedge counts are
    O(N*k^2), never O(N^2).  At 100 TB the canonical edge frame is
    bucketed by its join key so both joins co-locate.

    Returns (vec_id, triangles) — one row per node that participates
    in at least one triangle."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tris = e1.join(e2, "y").join(e3, ["x", "z"]).select("x", "y", "z")
    return (
        tris.select(F.explode(F.array("x", "y", "z")).alias("vec_id"))
        .groupBy("vec_id")
        .agg(F.count("*").alias("triangles"))
    )
