"""Synthetic points DataSource: determinism, partitioning, and
fitness as K-Means ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.sources import synthetic


@pytest.fixture(scope="module")
def registered(spark):
    synthetic.register(spark)
    return spark


def _load(spark, **opts):
    r = spark.read.format("synthetic_points")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_deterministic_across_reads_and_partitionings(registered):
    """Same options -> identical rows; a different partition count
    changes data placement (ids are partition-derived) but each
    configuration is itself stable across reads."""
    a = sorted(map(tuple, _load(registered, n=500, dim=4, seed=9).collect()))
    b = sorted(map(tuple, _load(registered, n=500, dim=4, seed=9).collect()))
    assert a == b
    assert len(a) == 500
    assert len({r[0] for r in a}) == 500  # ids unique
    c = sorted(map(tuple, _load(registered, n=500, dim=4, seed=10).collect()))
    assert a != c  # seed actually matters


def test_partition_parallel_generation(registered):
    """Requested parallelism arrives as real input partitions."""
    df = _load(registered, n=1000, dim=4, partitions=16)
    assert df.rdd.getNumPartitions() == 16
    assert df.count() == 1000


def test_blobs_are_kmeans_ground_truth(registered):
    """Points cluster around their generating centers: the native
    Lloyd loop seeded with k centroids must recover a partition that
    agrees with the generator labels (sigma=1, spread=10 => blobs are
    well separated)."""
    from kmeans_mapreduce_spark.operators.kmeans import (
        assign_clusters_broadcast,
        fit_kmeans_native,
    )

    df = _load(registered, n=2000, dim=8, k=4, seed=5, sigma=1.0).cache()
    pts = df.select("id", "features")
    res = fit_kmeans_native(pts, k=4, dim=8, seed=11, max_iter=20)
    assigned = assign_clusters_broadcast(pts, res.centroids).join(
        df.select("id", "label"), "id"
    )
    # purity: the majority fitted cluster per generator blob must cover
    # ~all of that blob
    purity = (
        assigned.groupBy("label", "cluster_id")
        .count()
        .groupBy("label")
        .agg((F.max("count") / F.sum("count")).alias("purity"))
        .agg(F.min("purity").alias("min_purity"))
        .collect()[0]["min_purity"]
    )
    df.unpersist()
    assert purity > 0.95, f"blob purity {purity}"


def test_arrow_batch_generation_at_volume(registered):
    """RecordBatch-per-partition generation: 200k rows arrive fast and
    partition-parallel (per-row Python would time this out)."""
    df = _load(registered, n=200_000, dim=16, k=8, partitions=32, seed=1)
    assert df.rdd.getNumPartitions() == 32
    assert df.count() == 200_000
    stats = df.agg(
        F.countDistinct("label").alias("k"),
        F.min("id").alias("lo"),
        F.max("id").alias("hi"),
    ).collect()[0]
    assert stats["k"] == 8 and stats["lo"] == 0 and stats["hi"] == 199_999


def test_stream_reader_equals_batch(registered, tmp_path):
    """The streaming face replays the batch partition layout: union of
    all micro-batches == the batch read, bit-identical."""
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = (
        registered.readStream.format("synthetic_points")
        .option("n", 600)
        .option("dim", 4)
        .option("seed", 11)
        .option("partitions", 6)
        .option("parts_per_batch", 2)  # forces >=3 micro-batches
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    # bounded replay source: drain until all 600 rows landed
    # (Trigger.AvailableNow falls back to single-batch for Python
    # stream sources, so pace explicitly and stop when caught up)
    import time

    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            try:
                if registered.read.parquet(out).count() >= 600:
                    break
            except Exception:
                pass  # sink dir not created yet
            time.sleep(1)
    finally:
        q.stop()
    got = sorted(
        map(tuple, registered.read.parquet(out).collect())
    )
    want = sorted(
        map(
            tuple,
            _load(registered, n=600, dim=4, seed=11, partitions=6).collect(),
        )
    )
    assert got == want
