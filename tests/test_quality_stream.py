"""Streaming quality-filter fold: incremental drains must converge to
the batch classifier's aggregate, and replayed batches must be no-ops."""

from __future__ import annotations

import os


def _stage(sf_dir, tmp_path, name="docs_stream"):
    d = tmp_path / name
    d.mkdir()
    os.link(f"{sf_dir}/documents.parquet", d / "part-000.parquet")
    return str(d)


def test_stream_quality_counts_equals_batch(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from kmeans_mapreduce_spark.plans.pipeline_queries8 import quality_scored
    from kmeans_mapreduce_spark.streaming.export import documents_stream_source
    from kmeans_mapreduce_spark.streaming.quality_stream import (
        QUALITY_MEASURES,
        stream_quality_counts,
    )

    mv = str(tmp_path / "mv")
    q = stream_quality_counts(
        documents_stream_source(
            spark, _stage(sf_dir, tmp_path), max_files_per_trigger=1
        ),
        mv,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    got = {
        r["source"]: (r["n_docs"], r["n_kept"], r["n_tokens"], r["kept_id_sum"])
        for r in spark.read.parquet(mv).drop("__mv_manifest__", "batch_id").collect()
        if r["source"] is not None
    }
    batch = quality_scored(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).groupBy("source").agg(
        *[c.alias(n) for n, c in QUALITY_MEASURES.items()]
    )
    want = {
        r["source"]: (r["n_docs"], r["n_kept"], r["n_tokens"], r["kept_id_sum"])
        for r in batch.collect()
    }
    assert got == want


def test_stream_quality_replay_is_noop(spark, sf_dir, tmp_path):
    from kmeans_mapreduce_spark.plans.pipeline_queries8 import quality_scored
    from kmeans_mapreduce_spark.streaming.matview_stream import fold_batch
    from kmeans_mapreduce_spark.streaming.quality_stream import (
        QUALITY_MEASURES,
    )

    mv = str(tmp_path / "mv2")
    scored = quality_scored(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    assert fold_batch(scored, 0, mv, ["source"], QUALITY_MEASURES) is True
    before = sorted(
        tuple(r)
        for r in spark.read.parquet(mv).select(
            "source", "n_docs", "n_kept"
        ).collect()
    )
    # same batch_id arrives again (at-least-once replay) -> skipped
    assert fold_batch(scored, 0, mv, ["source"], QUALITY_MEASURES) is False
    after = sorted(
        tuple(r)
        for r in spark.read.parquet(mv).select(
            "source", "n_docs", "n_kept"
        ).collect()
    )
    assert before == after
