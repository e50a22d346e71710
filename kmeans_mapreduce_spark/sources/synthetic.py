"""Synthetic Gaussian-blob points as a first-class Spark data source.

The reference's only input path is user-supplied CSV files
(client.go:172-186); its README test flow assumes you bring your own
dataset.  This closes that gap Spark-natively: a registered Python
DataSource (Spark 4 API) that generates deterministic, cluster-shaped
points of ANY size directly inside the executors —

    spark.dataSource.register(SyntheticPointsDataSource)
    df = (spark.read.format("synthetic_points")
          .option("n", 10_000_000).option("dim", 64)
          .option("k", 16).option("seed", 7)
          .option("partitions", 256).load())

Scale properties that make it a real source rather than a test helper:
  * generation is PARTITION-PARALLEL — each InputPartition derives its
    own PRNG stream from (seed, partition_id), so no driver-side
    materialization and no cross-partition coordination at any n;
  * fully deterministic: same options -> bit-identical rows, whatever
    the cluster size or scheduling order (row id encodes partition and
    offset, the generator never consumes randomness across rows'
    boundaries in a partition-order-dependent way);
  * blob structure (k Gaussian clusters with unit sigma around
    seed-derived centers) gives K-Means/ANN benchmarks ground truth:
    the `label` column says which blob generated each row.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


class _RangePartition(InputPartition):
    def __init__(self, pid: int, start: int, end: int):
        self.pid = pid
        self.start = start
        self.end = end


class SyntheticPointsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 10_000))
        self.dim = int(options.get("dim", 8))
        self.k = int(options.get("k", 4))
        self.seed = int(options.get("seed", 42))
        self.num_partitions = int(options.get("partitions", 8))
        self.sigma = float(options.get("sigma", 1.0))
        self.spread = float(options.get("spread", 10.0))

    def partitions(self):
        per = -(-self.n // self.num_partitions)  # ceil
        parts = []
        start = 0
        pid = 0
        while start < self.n:
            end = min(start + per, self.n)
            parts.append(_RangePartition(pid, start, end))
            start, pid = end, pid + 1
        return parts

    def read(self, partition: _RangePartition):
        # numpy per partition: one Generator seeded from (seed, pid) —
        # independent streams, deterministic under any task placement.
        # Yields ONE Arrow RecordBatch per partition (zero per-row
        # Python) — generation throughput is numpy-bound, so a million
        # rows per partition is fine.
        import numpy as np
        import pyarrow as pa

        rng = np.random.default_rng([self.seed, partition.pid])
        count = partition.end - partition.start
        # blob centers are identical in every partition (derived from
        # the base seed alone), so labels are globally consistent
        centers = (
            np.random.default_rng(self.seed).uniform(
                -self.spread, self.spread, size=(self.k, self.dim)
            )
        )
        labels = rng.integers(0, self.k, size=count)
        noise = rng.normal(0.0, self.sigma, size=(count, self.dim))
        pts = centers[labels] + noise
        ids = pa.array(
            np.arange(partition.start, partition.end, dtype=np.int64)
        )
        features = pa.FixedSizeListArray.from_arrays(
            pa.array(pts.reshape(-1), pa.float64()), self.dim
        ).cast(pa.list_(pa.float64()))
        yield pa.RecordBatch.from_arrays(
            [ids, features, pa.array(labels, pa.int32())],
            names=["id", "features", "label"],
        )


class SyntheticPointsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_points"

    def schema(self):
        return "id bigint, features array<double>, label int"

    def reader(self, schema):
        return SyntheticPointsReader(self.options)

    def streamReader(self, schema):
        return SyntheticPointsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticPointsDataSource)


class SyntheticPointsStreamReader(DataSourceStreamReader):
    """Streaming face of the same source: replays the batch partition
    layout as a bounded stream (`parts_per_batch` partitions per
    micro-batch, default: everything at once).

    Offsets are {"pid": <next partition index>} — partition-granular, so
    every micro-batch reads whole batch-layout partitions with the SAME
    per-partition generator as the batch reader.  The union of all
    micro-batches is therefore bit-identical to the batch read with the
    same options (pinned in tests/test_synthetic_source.py), the
    streaming analog of file-source replay over a static directory.
    read() runs on executors partition-parallel; only offset bookkeeping
    lives on the driver."""

    def __init__(self, options):
        self._batch = SyntheticPointsReader(options)
        per = -(-self._batch.n // self._batch.num_partitions)
        self._per = per
        self._nparts = -(-self._batch.n // per) if self._batch.n else 0
        self._ppb = int(options.get("parts_per_batch", self._nparts or 1))
        self._cur = 0

    def initialOffset(self):
        return {"pid": 0}

    def latestOffset(self):
        self._cur = min(self._cur + self._ppb, self._nparts)
        return {"pid": self._cur}

    def partitions(self, start, end):
        out = []
        for pid in range(int(start["pid"]), int(end["pid"])):
            s = pid * self._per
            out.append(_RangePartition(pid, s, min(s + self._per, self._batch.n)))
        return out

    def read(self, partition):
        yield from self._batch.read(partition)

    def commit(self, end):
        pass
