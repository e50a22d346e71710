"""K-Means invariants (SURVEY §5): clustering output is seed/tie-break
sensitive, so correctness is checked through algorithm-agnostic
invariants rather than golden files:

  (a) every point is assigned to its nearest returned centroid;
  (b) each centroid equals the mean of its members (±1e-9);
  (c) WSSSE is non-increasing across iterations;
  (d) k centroids come back, empty-cluster-keeps-old honored;
  (e) same seed -> identical rerun;
  (f) label agreement (ARI) well above random on the labeled fixture.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.operators.kmeans import (
    assign_clusters,
    compute_delta,
    farthest_point_init,
    fit_kmeans_mllib,
    fit_kmeans_native,
    recenter,
)

K, DIM = 6, 64


@pytest.fixture(scope="module")
def fitted(points):
    res = fit_kmeans_native(points, k=K, dim=DIM, seed=42, track_wssse=True)
    return res


def test_returns_k_centroids(fitted):
    assert len(fitted.centroids) == K
    assert all(len(c) == DIM for c in fitted.centroids)


def test_converged_within_limits(fitted):
    assert fitted.iterations <= 100
    assert fitted.converged or fitted.iterations == 100


def test_assignment_is_nearest_centroid(points, fitted):
    """(a): no point is closer to a different centroid than its own."""
    assigned = assign_clusters(points, fitted.centroids)
    from kmeans_mapreduce_spark.operators.kmeans import _dist2_to_centroids

    dists = _dist2_to_centroids("features", fitted.centroids)
    viol = assigned.where(
        F.array_min(dists) < dists[F.col("cluster_id")] - F.lit(1e-12)
    ).count()
    assert viol == 0


def test_centroid_is_member_mean(points, fitted):
    """(b): converged centroids are the mean of their members to ~tol.

    (Exact equality holds only at a true fixed point; at the stopping
    delta the drift is bounded by tol, so allow tol slack per coord.)"""
    assigned = assign_clusters(points, fitted.centroids)
    stats = recenter(assigned, DIM).collect()
    for r in stats:
        cent = fitted.centroids[r["cluster_id"]]
        move = math.sqrt(sum((a - b) ** 2 for a, b in zip(cent, r["mean"])))
        assert move < 0.15, f"cluster {r['cluster_id']} drifted {move}"


def test_wssse_non_increasing(fitted):
    """(c): Lloyd iterations never increase within-cluster SSE."""
    hist = fitted.wssse_history
    assert len(hist) >= 2
    for a, b in zip(hist, hist[1:]):
        assert b <= a + 1e-9


def test_seed_reproducible(points):
    """(e): identical rerun with the same seed."""
    r1 = fit_kmeans_native(points, k=3, dim=DIM, seed=7)
    r2 = fit_kmeans_native(points, k=3, dim=DIM, seed=7)
    assert r1.centroids == r2.centroids
    assert r1.iterations == r2.iterations


def test_different_seed_different_init(points):
    c1 = farthest_point_init(points, 3, seed=1)
    c2 = farthest_point_init(points, 3, seed=2)
    assert c1 != c2  # first pick is seeded-random


def test_empty_cluster_keeps_old(spark):
    """(d): a centroid with no members survives unchanged
    (reference master.go:581-582)."""
    rows = [(i, [float(i), 0.0]) for i in range(4)]
    df = spark.createDataFrame(rows, "id long, features array<double>")
    # far-away centroid 2 gets no members and must remain in place
    init = [[0.0, 0.0], [3.0, 0.0], [1000.0, 1000.0]]
    res = fit_kmeans_native(df, k=3, dim=2, initial_centroids=init, max_iter=3)
    assert res.centroids[2] == [1000.0, 1000.0]


def test_delta_math():
    assert compute_delta([[0.0, 0.0]], [[3.0, 4.0]]) == pytest.approx(5.0)
    assert compute_delta([[1.0], [2.0]], [[1.0], [4.0]]) == pytest.approx(1.0)


def test_fit_beats_unoptimized_centroids(points, fitted):
    """(f): the fitted model's WSSSE is measurably below that of an
    arbitrary (first-k-points) centroid set — i.e. Lloyd actually
    optimized.  (The fixture's `label` column carries no geometric
    structure — verified: within-label spread == global spread — so a
    label-agreement/ARI check would only measure noise.)"""
    from kmeans_mapreduce_spark.operators.kmeans import _dist2_to_centroids

    def wssse(cents):
        dists = _dist2_to_centroids("features", cents)
        return points.agg(F.sum(F.array_min(dists)).alias("w")).collect()[0]["w"]

    naive = [list(r["features"]) for r in points.orderBy("id").limit(K).collect()]
    assert wssse(fitted.centroids) < 0.9 * wssse(naive)


def test_mllib_path(points):
    model, assigned = fit_kmeans_mllib(points, k=K, seed=42)
    sizes = assigned.groupBy("cluster_id").count().collect()
    assert len(sizes) == K
    assert sum(r["count"] for r in sizes) == points.count()
    assert len(model.clusterCenters()) == K


def test_numpy_engine_matches_dataframe_loop(points):
    """Round-15 optimization gate: the numpy-block Lloyd engine
    (fit_kmeans_native) follows the EXACT trajectory of the original
    DataFrame-expression loop (_fit_kmeans_native_df) — same iteration
    count, same convergence flag, bit-identical centroids and deltas;
    WSSSE agrees to 1e-9 relative (a float sum whose fold order depends
    on the block layout — the DataFrame loop's own shuffle merge order
    was never deterministic, so bit-equality was never its contract).
    The engines share no iteration code, so this pins the fold-order
    contract (per-dim distance accumulation, first-min tie-break,
    row-order cluster sums) the rewrite preserves."""
    import math

    from kmeans_mapreduce_spark.operators.kmeans import _fit_kmeans_native_df

    init = [list(r["features"]) for r in points.orderBy("id").limit(3).collect()]
    a = fit_kmeans_native(
        points, k=3, dim=DIM, initial_centroids=init, track_wssse=True
    )
    b = _fit_kmeans_native_df(
        points, k=3, dim=DIM, initial_centroids=init, track_wssse=True
    )
    assert a.iterations == b.iterations
    assert a.converged == b.converged
    assert a.delta == b.delta
    assert a.centroids == b.centroids
    assert len(a.wssse_history) == len(b.wssse_history)
    for wa, wb in zip(a.wssse_history, b.wssse_history):
        assert math.isclose(wa, wb, rel_tol=1e-9)


def test_seq_sum_rows_matches_cumsum_fold():
    """r15 opt gate: `_seq_sum_rows` (np.sum over axis 0 for d > 1,
    cumsum fallback for d == 1) is bit-identical to the sequential
    cumsum fold it replaced, across shapes and magnitudes — including
    the d == 1 case where numpy's pairwise summation would diverge."""
    import numpy as np

    from kmeans_mapreduce_spark.operators.kmeans import _seq_sum_rows

    rng = np.random.default_rng(7)
    for n, d in [(1, 1), (5, 1), (128, 1), (100000, 1), (3, 2), (600, 4),
                 (257, 64), (10000, 8)]:
        M = rng.standard_normal((n, d)) * rng.uniform(1e-6, 1e6)
        assert _seq_sum_rows(M).tobytes() == np.cumsum(M, axis=0)[-1].tobytes(), (n, d)


def test_block_stats_matches_unbuffered_reference():
    """r15 opt gate: the buffer-reusing distance loop + `_seq_sum_rows`
    inside `_block_stats` produce bit-identical (counts, sums, wssse)
    to the straightforward allocation-per-dim / cumsum reference it
    optimized."""
    import numpy as np

    from kmeans_mapreduce_spark.operators.kmeans import _block_stats

    def reference(X, C, k, d, want_wssse):
        cnt = np.zeros(k, dtype=np.int64)
        s = np.zeros((k, d), dtype=np.float64)
        if X is None or not X.size:
            return (cnt, s, 0.0)
        n = X.shape[0]
        D = np.zeros((n, k), dtype=np.float64)
        for j in range(d):
            diff = X[:, j, None] - C[None, :, j]
            D += diff * diff
        a = D.argmin(axis=1)
        for c in range(k):
            idx = np.flatnonzero(a == c)
            if idx.size:
                cnt[c] = idx.size
                s[c] = np.cumsum(X[idx], axis=0)[-1]
        w = float(np.cumsum(D[np.arange(n), a])[-1]) if want_wssse else 0.0
        return (cnt, s, w)

    rng = np.random.default_rng(11)
    # 65535/65536/65537/200000 straddle the r16 _CHUNK_ROWS boundary
    # (one full chunk, one-short, one-over, multi-chunk) — the chunked
    # distance/argmin path must stay bit-identical to the full-matrix
    # reference on every side of it
    for n, d, k in [(1, 1, 1), (50, 1, 3), (1000, 4, 4), (500, 64, 4),
                    (20000, 4, 7), (333, 16, 2), (65535, 4, 4),
                    (65536, 2, 3), (65537, 4, 4), (200000, 3, 5)]:
        X = rng.standard_normal((n, d)) * rng.uniform(1e-3, 1e3)
        C = rng.standard_normal((k, d))
        for w in (False, True):
            ca, sa, wa = _block_stats(X, C, k, d, w)
            cb, sb, wb = reference(X, C, k, d, w)
            assert ca.tobytes() == cb.tobytes(), (n, d, k, w)
            assert sa.tobytes() == sb.tobytes(), (n, d, k, w)
            assert wa == wb, (n, d, k, w)
    # empty-block identity
    ca, sa, wa = _block_stats(None, np.zeros((2, 3)), 2, 3, True)
    assert int(ca.sum()) == 0 and float(sa.sum()) == 0.0 and wa == 0.0


def test_multi_block_engine_matches_single_block(points, monkeypatch):
    """r15 review gate: the MULTI-block distributed path (_lloyd_pass —
    two-phase coalesce merge, per-partition partials, driver-ordered
    fold) was previously never executed by tests (every fixture sizes
    to one block).  Force it by shrinking the block target so the
    fixture splits into several blocks, and pin its trajectory against
    the single-block fused path AND the DataFrame loop.

    Exact equality across the different folds is a property of THIS
    fixture (float32-origin values: per-cluster float64 sums of 500
    such values are exact under any grouping), which is precisely what
    makes it usable as a bitwise gate here."""
    import kmeans_mapreduce_spark.operators.kmeans as K_mod

    init = [list(r["features"]) for r in points.orderBy("id").limit(3).collect()]
    single = fit_kmeans_native(
        points, k=3, dim=DIM, initial_centroids=init, track_wssse=True
    )
    monkeypatch.setattr(K_mod, "_BLOCK_TARGET_BYTES", 64 * 1024)
    multi = fit_kmeans_native(
        points, k=3, dim=DIM, initial_centroids=init, track_wssse=True
    )
    assert multi.iterations == single.iterations
    assert multi.converged == single.converged
    assert multi.delta == single.delta
    assert multi.centroids == single.centroids
    assert len(multi.wssse_history) == len(single.wssse_history)
    for wa, wb in zip(multi.wssse_history, single.wssse_history):
        assert math.isclose(wa, wb, rel_tol=1e-9)


def test_pack_escape_hatch_single_partition_input(points, monkeypatch):
    """r16 gate (r15 review finding #5): an input whose size estimate
    calls for MORE blocks than it has partitions — the one-giant-row-
    group shape — must be repartitioned up BEFORE the Arrow pack
    instead of packing and looping serially.  Coalescing `points` to
    one partition with a shrunken block target forces the hatch; the
    blocks must come out multi-partition and the trajectory must still
    match the DataFrame loop bitwise (float32-origin fixture: per-
    cluster float64 sums are exact under any fold, so the layout
    change cannot move the result — which is also why the hatch is
    safe to leave untriggered on sanely-split inputs)."""
    import kmeans_mapreduce_spark.operators.kmeans as K_mod
    from kmeans_mapreduce_spark.operators.kmeans import (
        _features_blocks,
        _fit_kmeans_native_df,
    )

    one_part = points.coalesce(1)
    init = [list(r["features"]) for r in points.orderBy("id").limit(3).collect()]
    monkeypatch.setattr(K_mod, "_BLOCK_TARGET_BYTES", 64 * 1024)
    blocks = _features_blocks(one_part.select("id", "features"), DIM)
    try:
        n_blocks = blocks.getNumPartitions()
    finally:
        blocks.unpersist()
        backing = getattr(blocks, "_graft_backing", None)
        if backing is not None:
            backing.unpersist()
    assert n_blocks > 1, "hatch did not raise pack parallelism"
    hatched = fit_kmeans_native(
        one_part, k=3, dim=DIM, initial_centroids=init, track_wssse=True
    )
    ref = _fit_kmeans_native_df(
        points, k=3, dim=DIM, initial_centroids=init, track_wssse=True
    )
    assert hatched.iterations == ref.iterations
    assert hatched.converged == ref.converged
    assert hatched.delta == ref.delta
    assert hatched.centroids == ref.centroids
    for wa, wb in zip(hatched.wssse_history, ref.wssse_history):
        assert math.isclose(wa, wb, rel_tol=1e-9)


def test_lloyd_pass_empty_high_partition_rdd(spark):
    """r15 review gate: above the 2048-partition threshold _lloyd_pass
    merges partials with treeAggregate seeded by exact zeros — an
    all-empty blocks RDD (every block filtered away) must return zero
    statistics, not raise (treeReduce, which it replaced, throws
    'Cannot reduce empty RDD' there)."""
    import numpy as np

    from kmeans_mapreduce_spark.operators.kmeans import _lloyd_pass

    empty = spark.sparkContext.parallelize([], 2100)
    cnt, sums, wssse = _lloyd_pass(empty, [[0.0, 0.0], [1.0, 1.0]], True)
    assert int(np.asarray(cnt).sum()) == 0
    assert float(np.abs(np.asarray(sums)).sum()) == 0.0
    assert wssse == 0.0


def test_fit_failure_releases_caches(points, monkeypatch):
    """r15 review gate: a failing pack/consolidate job must not leak
    the input DataFrame cache or the transient packed persist.  dim=63
    against 64-wide features makes _consolidate's reshape raise during
    block materialization; afterwards the session must hold exactly the
    persistent RDDs/relations it held before."""
    import kmeans_mapreduce_spark.operators.kmeans as K_mod

    sc = points.sparkSession.sparkContext
    # a small target forces the 1 < target < parts_in branch whose
    # blocks.count() runs _consolidate inside _features_blocks
    monkeypatch.setattr(K_mod, "_BLOCK_TARGET_BYTES", 64 * 1024)
    before = sc._jsc.getPersistentRDDs().size()
    with pytest.raises(Exception):
        fit_kmeans_native(points, k=3, dim=63, seed=1)
    assert sc._jsc.getPersistentRDDs().size() == before
