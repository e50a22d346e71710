"""K-Means: reference-semantics native loop + MLlib fast path.

This is the heart of the reference engine (the whole of master.go /
worker.go).  The Spark-first re-expression:

  reference (Go MapReduce over RPC)             here (DataFrame plans)
  -------------------------------------------   -------------------------------
  getChunks partitioner (master.go:511-547)     df.repartition / parquet splits
  worker chunk cache (worker.go:54-60)          df.cache() before the loop
  Map: classify (worker.go:288-304)             argmin over a centroid literal
                                                array — broadcast-by-literal,
                                                whole-stage codegen, no join
  Combine partial sums (worker.go:169-189)      Catalyst partial HashAggregate
  shuffleAndSort (master.go:374-411)            Exchange hash(cid) — implicit
  Reduce recenter (worker.go:307-319)           groupBy(cid).agg(count, per-dim
                                                sums) -> k x (d+1) rows
  computeNewCentroids (master.go:579-600)       sum/count on the driver; empty
                                                cluster keeps old centroid
  computeDelta / stop rule (master.go:569-576,  mean centroid movement < 0.01
    :213-228, thresholds :55-56)                or 100 iterations
  kMeanspp farthest-point init                  k-1 rounds of distributed
    (master.go:157-190, worker.go:38-129)       max_by(id, min_dist) top-1

Scale posture (the part the reference gets wrong at 100 TB):
  * memberships are NEVER collected — assignment stays a lazy column
    (the reference merges every point into driver RAM, master.go:603-638);
  * driver-resident state is exactly the k x d centroid matrix;
  * per iteration the cluster reads the cached features once, shuffles
    k x (d+1) partial aggregates per partition, and ships k x (d+1)
    finals to the driver — bytes independent of N.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions.distance import squared_euclidean

DELTA_THRESHOLD = 0.01  # reference master.go:55
ITERATION_THRESHOLD = 100  # reference master.go:56

Centroids = list[list[float]]


def _lit_vec(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def _dist2_to_centroids(features: str | Column, centroids: Centroids) -> Column:
    """array<double> of squared distances to each centroid.

    Centroids are inlined as literals: k x d doubles folded into the
    plan, the moral equivalent of a broadcast variable but visible to
    Catalyst (constant-folded, codegen'd).  No crossJoin, no shuffle.
    """
    return F.array(*[squared_euclidean(features, _lit_vec(c)) for c in centroids])


def _centroids_sql_literal(centroids: Centroids) -> str:
    """array<array<double>> SQL literal; repr() keeps exact doubles."""
    rows = ",".join("array(" + ",".join(f"{float(x)!r}D" for x in c) + ")" for c in centroids)
    return f"array({rows})"


def assign_clusters(
    points: DataFrame, centroids: Centroids, features_col: str = "features"
) -> DataFrame:
    """Add ``cluster_id``: index of the nearest centroid (reference
    worker.go:288-304 'classify').

    Ties break to the lowest cluster index — array_position returns the
    first occurrence of the min, matching the reference's strict ``<``.
    Squared distance is used (argmin-equivalent, saves k sqrts/row).

    Built as ONE SQL expression string rather than nested Column objects:
    k x d literals as Column trees cost hundreds of py4j round-trips per
    call, which dominates driver time in the iterative loop (~0.3s/iter
    measured).  The distance array is bound once via transform-over-
    singleton so argmin doesn't evaluate it twice.
    """
    c_lit = _centroids_sql_literal(centroids)
    dists = (
        f"transform({c_lit}, c -> "
        f"aggregate(zip_with({features_col}, c, (x, y) -> (x-y)*(x-y)), 0D, (s, v) -> s+v))"
    )
    expr = (
        f"element_at(transform(array({dists}), "
        f"ds -> cast(array_position(ds, array_min(ds)) - 1 as int)), 1)"
    )
    return points.withColumn("cluster_id", F.expr(expr))


def _assign_expr(features_col: str = "features") -> Column:
    """argmin-over-broadcast-centroids expression; expects a ``_C``
    column (array<array<double>>) from a broadcast 1-row relation."""
    return F.expr(
        "element_at(transform(array(transform(_C, c -> "
        f"aggregate(zip_with({features_col}, c, (x, y) -> (x-y)*(x-y)), 0D, (s, v) -> s+v))), "
        "ds -> cast(array_position(ds, array_min(ds)) - 1 as int)), 1)"
    )


def assign_clusters_broadcast(
    points: DataFrame, centroids: Centroids, features_col: str = "features"
) -> DataFrame:
    """``assign_clusters`` via a broadcast 1-row centroid relation
    instead of plan literals.

    Same result, different plan economics: the generated code is
    centroid-INDEPENDENT, so repeated calls (the Lloyd loop, a final
    report pass) hit Spark's codegen cache, and the centroid matrix
    ships as broadcast data exactly like the reference ships centroids
    after round 0 (master.go:313-333).  Prefer this form whenever the
    input is cached — measured 5-10x faster than re-codegen'ing a
    literal plan against an InMemoryRelation."""
    from pyspark.sql import types as T

    spark = points.sparkSession
    cent_schema = T.StructType(
        [T.StructField("_C", T.ArrayType(T.ArrayType(T.DoubleType())))]
    )
    cent_df = spark.createDataFrame([([list(c) for c in centroids],)], cent_schema)
    return (
        points.crossJoin(F.broadcast(cent_df))
        .withColumn("cluster_id", _assign_expr(features_col))
        .drop("_C")
    )


def recenter(assigned: DataFrame, dim: int, features_col: str = "features") -> DataFrame:
    """[cluster_id, cnt, mean: array<double>] — one row per non-empty cluster.

    Reference split across worker.go:307-319 (vector sums) and
    master.go:579-600 (divide by count).  Catalyst runs this as
    partial HashAggregate -> Exchange(cid) -> final HashAggregate: the
    combiner/shuffle/reducer of the reference, for free.
    """
    sums = [F.sum(F.col(features_col)[i]).alias(f"s{i}") for i in range(dim)]
    agg = assigned.groupBy("cluster_id").agg(F.count("*").alias("cnt"), *sums)
    mean = F.array(*[(F.col(f"s{i}") / F.col("cnt")) for i in range(dim)]).alias("mean")
    return agg.select("cluster_id", "cnt", mean)


def compute_delta(old: Centroids, new: Centroids) -> float:
    """Mean Euclidean movement between centroid generations
    (reference master.go:569-576).  k x d doubles — driver math."""
    total = 0.0
    for o, n in zip(old, new):
        total += math.sqrt(sum((a - b) * (a - b) for a, b in zip(o, n)))
    return total / len(old)


def farthest_point_init(
    points: DataFrame,
    k: int,
    seed: int = 42,
    features_col: str = "features",
    id_col: str = "id",
) -> Centroids:
    """Deterministic farthest-point (Gonzalez / maxmin) initialization.

    The reference calls this 'kMeanspp' (master.go:157-190) but it is NOT
    D^2-sampling k-means++: first centroid random, then k-1 rounds of
    "farthest point from current centroid set" (worker.go:38-129).  Each
    round here is one distributed top-1: min-distance per point (InitMap,
    worker.go:232-245), per-partition argmax partial (InitCombine,
    worker.go:271-285), global argmax final (InitReduce, worker.go:106-129)
    — i.e. ``max_by`` with partial aggregation, a k-free shuffle of one
    struct per partition.

    Unlike the reference's unseeded rand.Intn (master.go:160) the first
    pick is seeded -> reproducible runs.
    """
    from pyspark.sql import types as T

    spark = points.sparkSession
    first = (
        points.select(id_col, features_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(1)
        .collect()[0]
    )
    centroids: Centroids = [list(first[features_col])]
    # Centroids ride a broadcast 1-row relation (same economics as the
    # Lloyd loop: round-invariant plan + codegen, k x d doubles as
    # broadcast data) rather than plan literals.
    cent_schema = T.StructType(
        [T.StructField("_C", T.ArrayType(T.ArrayType(T.DoubleType())))]
    )
    min_d2 = F.expr(
        "array_min(transform(_C, c -> "
        f"aggregate(zip_with({features_col}, c, (x, y) -> (x-y)*(x-y)), 0D, (s, v) -> s+v)))"
    )
    for _ in range(k - 1):
        cent_df = spark.createDataFrame([(centroids,)], cent_schema)
        # Deterministic tie-break on id so reruns are bit-identical.
        far = (
            points.select(F.col(id_col).alias("id"), features_col)
            .crossJoin(F.broadcast(cent_df))
            .select("id", features_col, min_d2.alias("min_d2"))
            .orderBy(F.desc("min_d2"), F.asc("id"))
            .limit(1)
            .collect()[0]
        )
        centroids.append(list(far[features_col]))
    return centroids


@dataclass
class KMeansResult:
    centroids: Centroids
    iterations: int
    delta: float
    converged: bool
    wssse_history: list[float] = field(default_factory=list)

    def message(self) -> str:
        from kmeans_mapreduce_spark.sources.sinks import convergence_message

        return convergence_message(
            self.iterations, self.delta, ITERATION_THRESHOLD, DELTA_THRESHOLD
        )


def fit_kmeans_native(
    points: DataFrame,
    k: int,
    dim: int,
    seed: int = 42,
    tol: float = DELTA_THRESHOLD,
    max_iter: int = ITERATION_THRESHOLD,
    initial_centroids: Centroids | None = None,
    track_wssse: bool = False,
    cache_input: bool = True,
) -> KMeansResult:
    """Full reference-semantics Lloyd loop (master.go:123-236).

    Stop rule is the reference's: mean centroid movement < tol (NOT
    MLlib's max squared movement) or max_iter.  Empty clusters keep their
    previous centroid (master.go:581-582 comment; groupBy is sparse so
    missing cids simply don't update).

    The input DataFrame is cached for the duration of the loop — the
    Spark analog of the reference worker's chunk cache (worker.go:54-60):
    iteration i ships only centroid literals down and k x (d+1) numbers up.
    Pass ``cache_input=False`` when the caller already manages a cache
    that covers ``points`` (double-caching stores the data twice AND
    pays a second materialization scan).
    """
    # Assignment with centroids as a broadcast 1-row relation, not plan
    # literals (assign_clusters_broadcast): the plan and generated code
    # are IDENTICAL across iterations — only the broadcast data changes —
    # so Spark's codegen cache hits from iteration 2 on.  Literal
    # centroids re-analyzed and re-compiled a fresh k x d-literal plan
    # every iteration (~1s/iter of driver time at d=64).
    points = points.select("id", "features")
    if cache_input:
        points = points.cache()
    try:
        centroids = (
            [list(c) for c in initial_centroids]
            if initial_centroids is not None
            else farthest_point_init(points, k, seed=seed)
        )
        delta = float("inf")
        wssse_hist: list[float] = []
        it = 0
        while it < max_iter:
            it += 1
            assigned = assign_clusters_broadcast(points, centroids)
            if track_wssse:
                dists = _dist2_to_centroids("features", centroids)
                row = assigned.agg(
                    F.sum(F.array_min(dists)).alias("wssse"),
                ).collect()[0]
                wssse_hist.append(float(row["wssse"]))
            # Recenter strategy by dimensionality.  Wide (one sum column
            # per dimension) keeps rows 1:1 and is fastest while the agg
            # stays narrow; posexplode + (cid, pos) trades a d-fold row
            # fan-out for a d-independent plan — at d=64 the
            # analysis/codegen of a 64-column agg dominated driver time.
            # Either way the shuffle carries k x (d+1) partials per
            # partition and k x (d+1) finals reach the driver — bytes
            # independent of N (reference master.go:579-600 driver math).
            new_centroids = [list(c) for c in centroids]  # empty keeps old
            if dim <= 16:
                row_aggs = [F.count("*").alias("cnt")] + [
                    F.sum(F.col("features")[i]).alias(f"s{i}") for i in range(dim)
                ]
                for r in assigned.groupBy("cluster_id").agg(*row_aggs).collect():
                    new_centroids[r["cluster_id"]] = [
                        r[f"s{i}"] / r["cnt"] for i in range(dim)
                    ]
            else:
                stats = (
                    assigned.select(
                        "cluster_id", F.posexplode("features").alias("pos", "x")
                    )
                    .groupBy("cluster_id", "pos")
                    .agg(F.sum("x").alias("s"), F.count("*").alias("cnt"))
                    .collect()
                )
                for r in stats:
                    new_centroids[r["cluster_id"]][r["pos"]] = r["s"] / r["cnt"]
            delta = compute_delta(centroids, new_centroids)
            centroids = new_centroids
            if delta < tol:
                return KMeansResult(centroids, it, delta, True, wssse_hist)
        return KMeansResult(centroids, it, delta, False, wssse_hist)
    finally:
        if cache_input:
            points.unpersist()


def fit_kmeans_mllib(
    points: DataFrame,
    k: int,
    seed: int = 42,
    tol: float = 1e-4,
    max_iter: int = ITERATION_THRESHOLD,
    features_col: str = "features",
):
    """MLlib fast path: the production choice at 100 TB.

    Returns (model, assigned_df) where assigned keeps array<double>
    features and gains ``cluster_id``.  Note MLlib's tol semantics differ
    from the reference (max squared-dist movement vs mean movement) —
    documented in SURVEY §7; the native loop owns reference semantics.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vec = points.withColumn("_vec", array_to_vector(F.col(features_col)))
    model = (
        KMeans(k=k, seed=seed, tol=tol, maxIter=max_iter, featuresCol="_vec")
        .fit(vec)
    )
    assigned = (
        model.transform(vec)
        .withColumnRenamed("prediction", "cluster_id")
        .drop("_vec")
    )
    return model, assigned
