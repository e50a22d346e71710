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
    # one extra assignment pass against the FINAL centroids (on demand:
    # fit_kmeans_native(report_final=True)) — per-cluster member counts
    # and per-dimension coordinate sums, the inputs of the size/centroid
    # reports the catalog fits publish.  None unless requested.
    final_counts: list[int] | None = None
    final_sums: list[list[float]] | None = None

    def message(self) -> str:
        from kmeans_mapreduce_spark.sources.sinks import convergence_message

        return convergence_message(
            self.iterations, self.delta, ITERATION_THRESHOLD, DELTA_THRESHOLD
        )


#: target bytes of float64 features per numpy block.  Scale-adaptive
#: sizing (guide §2): a 2k-row bench corpus collapses to ONE block (one
#: task per Lloyd pass — scheduling overhead, not data, dominates tiny
#: inputs), while any real-scale input keeps its native scan
#: parallelism because its packed size exceeds parts * target.
_BLOCK_TARGET_BYTES = 64 << 20


def _features_blocks(points: DataFrame, dim: int, features_col: str = "features"):
    """Materialize the points' feature vectors ONCE as an RDD of numpy
    blocks (one (n_i x dim) float64 matrix per partition), cached.

    This is the Lloyd loop's chunk cache in its cheapest consumable
    form: the Arrow pack stage moves each partition across the Python
    boundary exactly once as columnar batches (never row-by-row
    pickling) and re-slices the list column's contiguous value buffer
    into one matrix per batch (guide §4.2 — offsets math, no per-row
    copies), and every later iteration deserializes one ndarray per
    partition instead of re-evaluating a SQL plan.  The partition count
    is derived from the EXACT packed byte count (coalesce toward
    ~``_BLOCK_TARGET_BYTES`` per block, never above the input's native
    partition count), so per-pass task count tracks data volume instead
    of a constant tuned for either local mode or the cluster.  Partition
    layout — and therefore per-partition summation order — is frozen at
    build time, so iterations see identical foldings every pass.

    The block-count merge happens on the PACKED RDD, not the input
    DataFrame (r15 opt): coalescing `sel` before ``mapInArrow`` would
    run the projection + Arrow pack of the whole input inside the
    merged (often single) task — measured 3.2s serialized vs ~0.4s
    parallel on the 600k-row lineitem fit.  RDD ``coalesce`` uses the
    same consecutive-partition grouping as the DataFrame operator and
    ``_consolidate`` vstacks in partition/batch order, so the resulting
    block matrices — and therefore every fold — are bit-identical to
    the coalesce-first layout; only where the pack WORK runs changes.
    One further saving: the packed RDD handle is created once and
    reused for the partition count (a DataFrame->RDD conversion costs
    ~0.5s of plan/serializer setup per call).

    r16: the packed cache holds plain (bytes, n) tuples (no Row
    unpickling on read); block sizing reads the exact packed byte count
    off the pack itself (optimizer estimates under-read unpacked
    float64 features by ~14x on compressed scans); and a SINGLE-
    partition input whose estimate exceeds one block is repartitioned
    up before the pack instead of packing — and iterating — serially.
    None of this moves any multi-partition input's layout decision off
    its actual data volume.
    """
    import numpy as np
    import pyarrow as pa

    sel = points.select(features_col)
    try:
        est = int(str(sel._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:
        est = None
    if est is not None and est >= (1 << 60):
        # "unknown" sentinel, not a measurement: plans without real
        # stats (RDD-backed createDataFrame inputs among them) report
        # spark.sql.defaultSizeInBytes = Long.MaxValue.  The old code
        # was immune (it only ever capped DOWN to parts_in); the
        # repartition escape hatch below must not treat 8 EB as data.
        est = None

    def _pack(batches):
        for batch in batches:
            col = batch.column(0)
            flat = col.flatten().to_numpy(zero_copy_only=False)
            arr = np.ascontiguousarray(flat, dtype=np.float64)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([arr.tobytes()], type=pa.binary()),
                    pa.array([len(col)], type=pa.int64()),
                ],
                names=["b", "n"],
            )

    packed = sel.mapInArrow(_pack, schema="b binary, n long")

    def _consolidate(rows):
        mats = [
            np.frombuffer(b, dtype=np.float64).reshape(int(n), dim)
            for b, n in rows
        ]
        mats = [m for m in mats if m.size]
        if mats:
            # vstack keeps row order: same fold as iterating the batches
            yield mats[0] if len(mats) == 1 else np.vstack(mats)

    from pyspark import StorageLevel

    # MEMORY_AND_DISK everywhere (r15 review fix): the DataFrame cache
    # this engine replaced spilled to disk under memory pressure; the
    # PySpark RDD persist() default is MEMORY_ONLY, which would silently
    # re-run scan+projection+pack on every Lloyd pass once blocks evict
    # — the exact failure mode guide §5 warns about at scale.
    _LEVEL = StorageLevel.MEMORY_AND_DISK
    # Persist plain (bytes, count) tuples, not pickled Rows (r16 opt,
    # guide §4.2): every read of the packed cache — the fused
    # single-block loop once per fit, the two-phase merge once per
    # build — re-ran the Row unpickler over the block bytes; the bare
    # tuple unpickles with no row reconstruction.  Same bytes, same
    # order, bit-identical blocks; measured in-task on the 600k-row
    # lineitem pack: iterate-the-cache 0.16s -> 0.05s per read.
    prdd = packed.rdd.map(lambda r: (r[0], r[1]))
    parts_in = prdd.getNumPartitions()
    if parts_in == 1 and est is not None and est > _BLOCK_TARGET_BYTES:
        # Escape hatch (r15 review finding #5, deferred to this round;
        # trigger narrowed to parts_in == 1 by this round's review): a
        # SINGLE-partition input is unambiguously pathological once its
        # size estimate exceeds one block — the pack, and then every
        # Lloyd pass, would run on one core no matter the data volume.
        # Guide §2.5 "input skew": repartition immediately after the
        # read (round-robin repartition is deterministic — sort-before-
        # repartition, SPARK-23207).  Multi-partition inputs are NEVER
        # touched, whatever the estimate says: a desired-vs-parts
        # comparison mixes a projected-column estimate with byte-range
        # split counts and would fire on ordinary large inputs (and an
        # under-estimate would still miss a multi-split file whose one
        # giant row group lands every row in one task — a runtime-skew
        # shape no plan-time heuristic can see; documented limitation).
        # Width is bounded by the slot count: the hatch restores
        # parallelism, it does not chase exact block sizing (the exact
        # post-pack sizing below handles that).
        width = min(
            -(-est // _BLOCK_TARGET_BYTES),
            points.sparkSession.sparkContext.defaultParallelism * 4,
        )
        sel = sel.repartition(width)
        packed = sel.mapInArrow(_pack, schema="b binary, n long")
        prdd = packed.rdd.map(lambda r: (r[0], r[1]))
        parts_in = width
    if parts_in == 1:
        # one partition IS one block (splitting would need the very
        # shuffle the hatch above declined); lazy persist keeps the
        # caller's fused single-block loop at ONE job for the whole
        # pack + consolidate + fit.
        return prdd.mapPartitions(_consolidate).persist(_LEVEL)
    # Two-phase merge: materialize the pack at native parallelism
    # FIRST, then narrow-coalesce the cached packed bytes.  A bare
    # coalesce (RDD or DataFrame — both are narrow) would pipeline
    # the whole scan+projection+pack into the merged task and
    # serialize it (measured 4-5s vs ~1s on the 600k-row lineitem
    # fit).  The transient packed cache holds exactly the block
    # bytes and is dropped as soon as the block cache exists —
    # including on a failed materialization (r15 review fix: a
    # pack-job error used to leak the transient persist).
    #
    # The block count comes from the EXACT packed byte count (total
    # rows x dim x 8, read off the pack's own n column by the same job
    # that materializes the persist — no extra pass), NOT the
    # optimizer's estimate: a parquet scan's sizeInBytes reflects
    # compressed file bytes scaled by projection width, which
    # under-reads the unpacked float64 features by ~14x on the
    # lineitem shape — measured at 8x bench scale, the estimate-based
    # sizing collapsed a 153 MB feature matrix into ONE block and ran
    # the whole Lloyd loop serially (74.8 s vs ~7 s at 1x).
    prdd = prdd.persist(_LEVEL)
    blocks = None
    try:
        total_n = prdd.mapPartitions(
            lambda rows: (int(n) for _, n in rows)
        ).sum()
        target = max(1, min(parts_in, -(-(total_n * dim * 8) // _BLOCK_TARGET_BYTES)))
        if target == 1:
            # Single-block fast path: the Lloyd loop runs exactly
            # ONE job over this view (`_fit_single_block`), so
            # consolidation happens once either way — skip the
            # second persist + job + block unpickle and let that one
            # job read the cached packed bytes directly.  The packed
            # cache IS the block cache here; `_graft_backing` hands
            # its lifetime to the caller (fit_kmeans_native
            # unpersists it in its finally).
            blocks = prdd.coalesce(1).mapPartitions(_consolidate)
            blocks._graft_backing = prdd
            return blocks
        if target == parts_in:
            blocks = prdd.mapPartitions(_consolidate).persist(_LEVEL)
        else:
            blocks = (
                prdd.coalesce(target).mapPartitions(_consolidate).persist(_LEVEL)
            )
        blocks.count()  # materialize before releasing the packed cache
    except BaseException:
        if blocks is not None:
            blocks.unpersist()
        prdd.unpersist()
        raise
    prdd.unpersist()
    return blocks


#: rows per distance-scratch chunk in `_block_stats`: 64k rows x k=4
#: doubles = 2 MB per buffer — L2/L3-resident and small enough that the
#: allocator recycles it without mmap round-trips (first-touch page
#: faults on fresh ~100 MB scratch dominated per-pass time at 64 MB
#: blocks).  Chunking is fold-neutral: see the function docstring.
_CHUNK_ROWS = 1 << 16


def _block_stats(X, C, k: int, d: int, want_wssse: bool):
    """Per-block Lloyd statistics: (counts[k], sums[k x d], wssse) of
    one (n x d) float64 matrix against centroid matrix C.  ``X=None``
    (empty block) returns exact zeros.

    This is THE per-pass arithmetic, shared verbatim by the distributed
    pass (`_lloyd_pass`) and the single-block in-task loop
    (`_fit_single_block`), so the two execution shapes cannot drift:
      * squared distance accumulates per-dimension left-to-right
        (the zip_with/aggregate fold order of the DataFrame loop);
      * argmin ties break to the lowest cluster index (np.argmin's
        first-occurrence == array_position of array_min);
      * per-cluster sums fold rows in block order — sequential
        accumulation (see `_seq_sum_rows`).

    r15 opt (same FP operations in the same order, fewer allocations —
    measured ~109ms -> ~60ms per 600k x 4 pass):
      * the distance loop reuses one scratch buffer via ufunc ``out=``
        instead of allocating two (n x k) temporaries per dimension;
      * per-cluster sums go through `_seq_sum_rows` (np.sum over axis 0
        of a multi-column matrix — verified bit-identical to the
        cumsum fold it replaces) instead of materializing a full
        (n_c x d) cumsum to read its last row.

    r16 opt (bit-identical by construction, pinned by the reference
    test across chunk boundaries): distances + argmin run in
    ``_CHUNK_ROWS``-row chunks over small reused scratch instead of
    two full (n x k) matrices.  Per-row work is independent, so
    chunking changes no fold; the wssse fold stays whole-array (the
    chunks only FILL the per-row min-distance vector, the cumsum runs
    over all n as before).  Why: the full-width scratch was ~100 MB of
    fresh mmap per pass per task at 64 MB blocks — first-touch page
    faults every pass on every worker (measured 15.9 s vs 0.7 s
    steady-state for the IDENTICAL call on this guest; on healthy
    hosts still ~10s of ms per pass per task) — while the chunk
    scratch stays allocator-resident and L2-sized.
    """
    import numpy as np

    cnt = np.zeros(k, dtype=np.int64)
    s = np.zeros((k, d), dtype=np.float64)
    if X is None or not X.size:
        return (cnt, s, 0.0)
    n = X.shape[0]
    a = np.empty(n, dtype=np.int64)
    md = np.empty(n, dtype=np.float64) if want_wssse else None
    m0 = min(n, _CHUNK_ROWS)
    D = np.zeros((m0, k), dtype=np.float64)
    buf = np.empty((m0, k), dtype=np.float64)
    for lo in range(0, n, _CHUNK_ROWS):
        hi = min(n, lo + _CHUNK_ROWS)
        Db = D[: hi - lo]
        bb = buf[: hi - lo]
        Db.fill(0.0)
        Xc = X[lo:hi]
        for j in range(d):
            # identical values/order to `D += diff * diff` with
            # diff = X[:, j, None] - C[None, :, j]; just buffer-reusing
            np.subtract(Xc[:, j, None], C[None, :, j], out=bb)
            np.multiply(bb, bb, out=bb)
            Db += bb
        ac = Db.argmin(axis=1)
        a[lo:hi] = ac
        if want_wssse:
            md[lo:hi] = Db[np.arange(hi - lo), ac]
    for c in range(k):
        idx = np.flatnonzero(a == c)
        if idx.size:
            cnt[c] = idx.size
            s[c] = _seq_sum_rows(X[idx])
    w = float(np.cumsum(md)[-1]) if want_wssse else 0.0
    return (cnt, s, w)


def _seq_sum_rows(M):
    """Row-wise sequential sum of a (n x d) float64 matrix — the exact
    left-to-right fold ``np.cumsum(M, axis=0)[-1]`` computes, without
    materializing the cumsum.

    For d > 1 the reduction axis is non-contiguous (row stride d*8
    bytes), so numpy's ufunc reduce accumulates strictly sequentially —
    bit-identical to the cumsum fold (verified over shapes/magnitudes
    in tests).  d == 1 IS a contiguous reduction, where numpy switches
    to pairwise summation (different fold), so that case keeps cumsum.
    """
    import numpy as np

    if M.shape[1] > 1:
        return np.sum(M, axis=0)
    return np.cumsum(M, axis=0)[-1]


def _update_centroids(centroids: Centroids, cnt, sums, k: int, dim: int) -> Centroids:
    """Driver math of one Lloyd step: mean per non-empty cluster, empty
    cluster keeps its previous centroid (master.go:581-582)."""
    new = [list(c) for c in centroids]
    for c in range(k):
        if cnt[c] > 0:
            new[c] = [float(sums[c][j]) / int(cnt[c]) for j in range(dim)]
    return new


def _lloyd_iterate(pass_fn, centroids: Centroids, k, dim, tol, max_iter, track_wssse):
    """The Lloyd control loop (stop rule master.go:123-236), agnostic of
    where ``pass_fn(centroids, want_wssse)`` runs — one definition used
    by both the per-iteration distributed path and the in-task
    single-block path.  Returns (centroids, iterations, delta,
    converged, wssse_history)."""
    delta = float("inf")
    hist: list[float] = []
    it = 0
    converged = False
    while it < max_iter:
        it += 1
        cnt, sums, wssse = pass_fn(centroids, track_wssse)
        if track_wssse:
            hist.append(float(wssse))
        new_centroids = _update_centroids(centroids, cnt, sums, k, dim)
        delta = compute_delta(centroids, new_centroids)
        centroids = new_centroids
        if delta < tol:
            converged = True
            break
    return centroids, it, delta, converged, hist


def _lloyd_pass(blocks, centroids, want_wssse: bool):
    """One distributed Lloyd pass over cached numpy blocks: returns
    (counts[k], sums[k x d], wssse) merged across partitions.

    Per-block arithmetic is `_block_stats`; partials are merged in
    partition-index order at the driver — deterministic, where the old
    shuffle merge order was not.

    Shuffle-economics at scale: k x d doubles down (task closure when
    tiny, broadcast variable when big), k x (d+1) partials per
    partition up (merged with treeReduce when the partition count is
    large enough that a driver-side ordered merge would concentrate
    P x k x (d+1) doubles on the driver).
    """
    import numpy as np

    sc = blocks.context
    C = np.asarray(centroids, dtype=np.float64)
    k, d = C.shape
    # k x d doubles ride the task closure when small (k=4..10, d<=64 is
    # ~2-5 KB — a per-iteration sc.broadcast would cost a driver round
    # trip and a cleanup for nothing); a broadcast variable takes over
    # above 4 MB, where per-task closure shipping would multiply bytes
    # by the task count.
    bc = sc.broadcast(C) if C.nbytes > (4 << 20) else None
    Cv = C if bc is None else None

    def step(it):
        Cl = Cv if bc is None else bc.value
        mats = [X for X in it if X.size]
        if not mats:
            return
        X = mats[0] if len(mats) == 1 else np.vstack(mats)
        yield _block_stats(X, Cl, k, d, want_wssse)

    def merge(p, q):
        return (p[0] + q[0], p[1] + q[1], p[2] + q[2])

    parts = blocks.mapPartitions(step)
    zero = (np.zeros(k, dtype=np.int64), np.zeros((k, d), dtype=np.float64), 0.0)
    if blocks.getNumPartitions() > 2048:
        # Cluster scale: log-depth partial merge, driver holds O(k*d).
        # treeAggregate, not treeReduce (r15 review fix): treeReduce
        # raises on an all-empty parts RDD (every block filtered out),
        # where seeding with exact zeros — the identity for counts,
        # sums and wssse — returns the correct empty statistics.  Merge
        # order at this depth is arrival-order (same nondeterminism the
        # old shuffle merge had); the <=2048 branch keeps the driver's
        # partition-ordered fold, so local/bench runs stay bit-stable.
        out = parts.treeAggregate(zero, merge, merge, depth=2)
    else:
        out = zero
        for p in parts.collect():  # partition order — deterministic
            out = merge(out, p)
    if bc is not None:
        bc.unpersist()
    return out


def _fit_single_block(rows, centroids0, k, dim, tol, max_iter, track_wssse, report_final):
    """Run the WHOLE Lloyd loop inside one task — the single-block fast
    path.  With one block, every 'global' reduction is that block's own
    statistics (merging with exact zeros is the identity), so iterating
    in-task computes the bit-identical trajectory of the per-iteration
    distributed path while paying ONE job instead of one per iteration.
    Shares `_block_stats` and `_lloyd_iterate` with the distributed
    path, so the semantics cannot fork.  Yields one result dict."""
    import numpy as np

    mats = [X for X in rows if X.size]
    X = None if not mats else (mats[0] if len(mats) == 1 else np.vstack(mats))

    def pass_fn(centroids, want_wssse):
        C = np.asarray(centroids, dtype=np.float64)
        return _block_stats(X, C, k, dim, want_wssse)

    centroids, it, delta, converged, hist = _lloyd_iterate(
        pass_fn, centroids0, k, dim, tol, max_iter, track_wssse
    )
    out = {
        "centroids": centroids,
        "iterations": it,
        "delta": delta,
        "converged": converged,
        "hist": hist,
    }
    if report_final:
        fcnt, fsums, _ = pass_fn(centroids, False)
        out["final_counts"] = [int(x) for x in fcnt]
        out["final_sums"] = [[float(v) for v in row] for row in fsums]
    yield out


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
    report_final: bool = False,
) -> KMeansResult:
    """Full reference-semantics Lloyd loop (master.go:123-236).

    Stop rule is the reference's: mean centroid movement < tol (NOT
    MLlib's max squared movement) or max_iter.  Empty clusters keep their
    previous centroid (master.go:581-582 comment).

    ``report_final=True`` runs ONE extra assignment pass against the
    converged centroids before releasing the block cache and attaches
    (final_counts, final_sums) to the result — the per-cluster sizes
    and coordinate sums the catalog reports need, without a separate
    DataFrame aggregation over the corpus.

    Engine (optimization round 15): the iteration body runs as ONE RDD
    job per iteration over numpy blocks materialized once from the
    input (`_features_blocks`) — the distribution/shuffle/broadcast
    economics of the old DataFrame loop (k x d broadcast down,
    k x (d+1) partials up, bytes independent of N) with the per-
    iteration driver cost removed: no plan re-analysis, no broadcast
    exchange build, no AQE re-planning per iteration, and the per-row
    distance math runs vectorized in numpy instead of interpreted
    higher-order expressions (guide §4.2).  Measured on the sf0.1
    bench: 14.5s -> ~3s (embeddings, 11 iterations), 9.9s -> ~3s
    (lineitem, 10 iterations).  `_fit_kmeans_native_df` keeps the old
    DataFrame loop; tests pin both engines to the same trajectory.

    Pass ``cache_input=False`` when the caller already manages a cache
    that covers ``points`` (the numpy block cache is built either way;
    the DataFrame cache only pays for itself during farthest-point
    init, which scans ``points`` k-1 more times).
    """
    points = points.select("id", "features")
    # The DataFrame cache only pays during farthest-point init (k-1
    # extra scans of `points`); the loop itself reads the numpy block
    # cache.  Callers that pass explicit centroids skip it entirely.
    df_cached = cache_input and initial_centroids is None
    if df_cached:
        points = points.cache()
    blocks = None  # r15 review fix: a pack failure must still release the df cache
    try:
        blocks = _features_blocks(points, dim)
        centroids = (
            [list(c) for c in initial_centroids]
            if initial_centroids is not None
            else farthest_point_init(points, k, seed=seed)
        )
        if blocks.getNumPartitions() == 1:
            # Single block -> the whole loop is ONE task's sequential
            # fold anyway; run it in-task (one job, not one per
            # iteration).  Same `_block_stats`/`_lloyd_iterate` code,
            # so the trajectory is bit-identical to the distributed
            # path (merging one partial with exact zeros is identity).
            out = blocks.mapPartitions(
                lambda rows: _fit_single_block(
                    rows, centroids, k, dim, tol, max_iter, track_wssse, report_final
                )
            ).collect()[0]
            res = KMeansResult(
                out["centroids"],
                out["iterations"],
                out["delta"],
                out["converged"],
                out["hist"],
            )
            if report_final:
                res.final_counts = out["final_counts"]
                res.final_sums = out["final_sums"]
            return res
        centroids, it, delta, converged, wssse_hist = _lloyd_iterate(
            lambda c, w: _lloyd_pass(blocks, c, w),
            centroids,
            k,
            dim,
            tol,
            max_iter,
            track_wssse,
        )
        res = KMeansResult(centroids, it, delta, converged, wssse_hist)
        if report_final:
            fcnt, fsums, _ = _lloyd_pass(blocks, centroids, False)
            res.final_counts = [int(x) for x in fcnt]
            res.final_sums = [[float(v) for v in row] for row in fsums]
        return res
    finally:
        if blocks is not None:
            backing = getattr(blocks, "_graft_backing", None)
            blocks.unpersist()
            if backing is not None:  # single-block fused path's packed cache
                backing.unpersist()
        if df_cached:
            points.unpersist()


def _fit_kmeans_native_df(
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
    """The pre-round-15 DataFrame-expression Lloyd loop, kept verbatim
    as the equivalence reference for the numpy engine (tests pin both
    to the same trajectory).  Same semantics, ~1s/iteration of driver
    overhead (plan re-analysis + broadcast exchange + AQE re-planning
    per iteration) the numpy engine removes.
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
