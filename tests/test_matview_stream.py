"""Streaming MV fold: stream == batch, incremental catch-up, and
replay idempotency."""

from __future__ import annotations

from pyspark.sql import functions as F

from kmeans_mapreduce_spark.sources.matview import (
    _read_manifest,
    read_matview,
)
from kmeans_mapreduce_spark.streaming.matview_stream import (
    stream_refresh_matview,
)

SCHEMA = "k string, val double"
MEASURES = lambda: {"revenue": F.sum("val"), "n_rows": F.count("*")}  # noqa: E731


def _drain(stream_df, mv, ckpt):
    q = stream_refresh_matview(stream_df, mv, ["k"], MEASURES(), ckpt)
    q.awaitTermination(120)


def _view(spark, mv):
    return {
        r["k"]: (r["revenue"], r["n_rows"])
        for r in read_matview(spark, mv).collect()
    }


def test_stream_fold_equals_batch_agg(spark, tmp_path):
    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0)], SCHEMA
    ).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    _drain(stream, mv, ckpt)
    assert _view(spark, mv) == {"a": (3.0, 2), "b": (10.0, 1)}

    # append more source files; SAME checkpoint -> only the delta folds
    spark.createDataFrame([("a", 4.0), ("c", 7.0)], SCHEMA).write.mode(
        "append"
    ).parquet(src)
    _drain(spark.readStream.schema(SCHEMA).parquet(src), mv, ckpt)
    assert _view(spark, mv) == {"a": (7.0, 3), "b": (10.0, 1), "c": (7.0, 1)}

    # draining again with nothing new changes nothing
    _drain(spark.readStream.schema(SCHEMA).parquet(src), mv, ckpt)
    assert _view(spark, mv) == {"a": (7.0, 3), "b": (10.0, 1), "c": (7.0, 1)}


def test_replayed_batch_is_skipped(spark, tmp_path):
    """foreachBatch is at-least-once: folding the SAME batch_id twice
    (crash-replay) must not double-count."""
    from kmeans_mapreduce_spark.streaming.matview_stream import fold_batch

    mv = str(tmp_path / "mv")
    delta = spark.createDataFrame([("a", 5.0)], SCHEMA)
    assert fold_batch(delta, 0, mv, ["k"], MEASURES()) is True
    assert _view(spark, mv) == {"a": (5.0, 1)}
    assert fold_batch(delta, 0, mv, ["k"], MEASURES()) is False  # replay
    assert _view(spark, mv) == {"a": (5.0, 1)}
    assert _read_manifest(spark, mv)["batch_id"] == 0
    # a genuinely new batch still folds
    assert fold_batch(delta, 1, mv, ["k"], MEASURES()) is True
    assert _view(spark, mv) == {"a": (10.0, 2)}
