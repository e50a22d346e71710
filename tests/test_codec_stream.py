"""The codec arms under Structured Streaming: decode real payloads in
micro-batches and fold their histogram partials into an incremental MV.

This is the streaming face of the multimodal surface: the SAME
synthesis + real-decode + bin stages (`attach_png_payload` /
`attach_gif_payload` -> `ppm_pixel_histogram_partials`) run on a
streaming DataFrame — mapInPandas is trigger-agnostic — and the
aggregation-free partial frame folds additively through the
replay-guarded matview machinery.  Stream result == batch result, and
an appended delta folds incrementally without rescanning old files."""

from __future__ import annotations

from pyspark.sql import functions as F

from kmeans_mapreduce_spark.operators.multimodal import (
    attach_png_payload,
    ppm_pixel_histogram,
    ppm_pixel_histogram_partials,
)
from kmeans_mapreduce_spark.sources.matview import read_matview
from kmeans_mapreduce_spark.streaming.matview_stream import (
    stream_refresh_matview,
)

DOCS_SCHEMA = "doc_id long, text string"


def _docs_rows(n0: int, n1: int):
    return [(i, f"synthetic document body {i} " + "x" * (i % 37)) for i in range(n0, n1)]


def _fold_stream(spark, src: str, mv: str, ckpt: str) -> None:
    stream_docs = spark.readStream.schema(DOCS_SCHEMA).parquet(src)
    partials = ppm_pixel_histogram_partials(
        attach_png_payload(stream_docs, "doc_id", "text"), n_buckets=16
    )
    q = stream_refresh_matview(
        partials, mv, ["bucket"], {"n_px": F.sum("n_px")}, ckpt
    )
    q.awaitTermination(180)


def _view(spark, mv):
    return {
        r["bucket"]: r["n_px"]
        for r in read_matview(spark, mv).collect()
        if r["n_px"] > 0
    }


def _batch(spark, src):
    docs = spark.read.schema(DOCS_SCHEMA).parquet(src)
    return {
        r["bucket"]: r["n_px"]
        for r in ppm_pixel_histogram(
            attach_png_payload(docs, "doc_id", "text"), n_buckets=16
        ).collect()
    }


def test_stream_decode_fold_equals_batch_histogram(spark, tmp_path):
    """Micro-batched PNG decode (real inflate + unfilter inside the
    stream's tasks) folds to EXACTLY the batch histogram, and an
    appended second file folds only its delta (same checkpoint)."""
    src = str(tmp_path / "docs")
    mv = str(tmp_path / "mv")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(_docs_rows(0, 40), DOCS_SCHEMA).write.parquet(src)
    _fold_stream(spark, src, mv, ckpt)
    assert _view(spark, mv) == _batch(spark, src)

    # append a delta; the SAME checkpoint folds only the new file
    spark.createDataFrame(_docs_rows(40, 70), DOCS_SCHEMA).write.mode(
        "append"
    ).parquet(src)
    _fold_stream(spark, src, mv, ckpt)
    assert _view(spark, mv) == _batch(spark, src)

    # idempotent: draining with nothing new changes nothing
    before = _view(spark, mv)
    _fold_stream(spark, src, mv, ckpt)
    assert _view(spark, mv) == before


def test_stream_decode_fold_gif_arm(spark, tmp_path):
    """The hand-rolled LZW arm also runs under streaming: GIF payload
    synthesis + decode + palette-mapped binning in micro-batches equals
    the batch aggregate."""
    from kmeans_mapreduce_spark.operators.multimodal import (
        attach_gif_payload,
    )

    src = str(tmp_path / "docs")
    mv = str(tmp_path / "mv")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(_docs_rows(0, 30), DOCS_SCHEMA).write.parquet(src)
    stream_docs = spark.readStream.schema(DOCS_SCHEMA).parquet(src)
    partials = ppm_pixel_histogram_partials(
        attach_gif_payload(stream_docs, "doc_id", "text"), n_buckets=16
    )
    q = stream_refresh_matview(
        partials, mv, ["bucket"], {"n_px": F.sum("n_px")}, ckpt
    )
    q.awaitTermination(180)
    docs = spark.read.schema(DOCS_SCHEMA).parquet(src)
    want = {
        r["bucket"]: r["n_px"]
        for r in ppm_pixel_histogram(
            attach_gif_payload(docs, "doc_id", "text"), n_buckets=16
        ).collect()
    }
    assert _view(spark, mv) == want
