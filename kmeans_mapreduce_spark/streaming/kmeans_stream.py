"""Incremental (streaming) K-Means: foreachBatch mini-batch Lloyd.

The reference's ingest protocol accumulates chunks until `Last` and then
fits once (client.go:49-89, master.go:71-102).  The streaming-native
generalization keeps a running model and folds each arriving micro-batch
in: one weighted Lloyd step per batch, with exponential forgetting —
the semantics of classic streaming k-means (Spark's old
StreamingKMeans, MacQueen-style sequential updates):

    n_j'  = decay * n_j + batch_count_j
    c_j'  = (decay * n_j * c_j + batch_sum_j) / n_j'

With decay=1.0 and a single batch this is EXACTLY one iteration of the
batch Lloyd loop (pinned in tests/test_streaming_kmeans.py), so the
operator degrades gracefully to the reference's accumulate-then-fit.

Scale shape: per batch, one assign + one k x (d+1) aggregation over the
micro-batch only — state is the k x d centroid matrix plus k counts,
driver-resident, independent of stream length.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.operators.kmeans import (
    Centroids,
    assign_clusters_broadcast,
)


@dataclass
class StreamingKMeansModel:
    """Running model: centroids + effective per-cluster weights."""

    centroids: Centroids
    decay: float = 1.0
    weights: list[float] = field(default_factory=list)
    batches_seen: int = 0

    def __post_init__(self) -> None:
        if not self.weights:
            self.weights = [0.0] * len(self.centroids)

    def update(self, batch_df: DataFrame) -> None:
        """Fold one micro-batch into the model (one weighted Lloyd step).

        Empty clusters keep their previous centroid — the reference's
        empty-cluster rule (master.go:581-582) carried over."""
        k = len(self.centroids)
        dim = len(self.centroids[0])
        assigned = assign_clusters_broadcast(
            batch_df.select("id", "features"), self.centroids
        )
        if dim <= 16:
            aggs = [F.count("*").alias("cnt")] + [
                F.sum(F.col("features")[i]).alias(f"s{i}") for i in range(dim)
            ]
            rows = assigned.groupBy("cluster_id").agg(*aggs).collect()
            stats = {
                r["cluster_id"]: (r["cnt"], [r[f"s{i}"] for i in range(dim)])
                for r in rows
            }
        else:
            rows = (
                assigned.select("cluster_id", F.posexplode("features").alias("pos", "x"))
                .groupBy("cluster_id", "pos")
                .agg(F.sum("x").alias("s"), F.count("*").alias("cnt"))
                .collect()
            )
            sums: dict[int, list[float]] = {}
            cnts: dict[int, int] = {}
            for r in rows:
                sums.setdefault(r["cluster_id"], [0.0] * dim)[r["pos"]] = r["s"]
                cnts[r["cluster_id"]] = r["cnt"]
            stats = {cid: (cnts[cid], sums[cid]) for cid in sums}
        for j in range(k):
            if j not in stats:
                self.weights[j] *= self.decay
                continue
            cnt, s = stats[j]
            w_old = self.decay * self.weights[j]
            w_new = w_old + cnt
            self.centroids[j] = [
                (w_old * c + sj) / w_new for c, sj in zip(self.centroids[j], s)
            ]
            self.weights[j] = w_new
        self.batches_seen += 1


def run_streaming_kmeans(
    spark: SparkSession,
    points_dir: str,
    schema,
    to_points,
    initial_centroids: Centroids,
    decay: float = 1.0,
    checkpoint: str | None = None,
    max_files_per_trigger: int | None = None,
) -> StreamingKMeansModel:
    """Drive the incremental model over a file stream until drained
    (Trigger.AvailableNow — the reference's until-Last framing).

    ``to_points(df) -> DataFrame[id, features]`` adapts the raw source
    schema; the model object is driver state exactly like the batch
    loop's centroid list (and like reference master.go's Config)."""
    model = StreamingKMeansModel(
        [list(c) for c in initial_centroids], decay=decay
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(points_dir)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        pts = to_points(batch_df)
        if pts.isEmpty():
            return
        model.update(pts)

    q = (
        src.writeStream.foreachBatch(fold)
        .option(
            "checkpointLocation",
            checkpoint or f"{points_dir}/_skm_ckpt",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return model
