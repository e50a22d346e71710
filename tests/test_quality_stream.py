"""Streaming quality-filter fold: incremental drains must converge to
the batch classifier's aggregate, and replayed batches must be no-ops."""

from __future__ import annotations

from tests.test_stream_export import _stage_docs_dir


def test_stream_quality_counts_equals_batch(spark, sf_dir, tmp_path):
    from kmeans_mapreduce_spark.plans.pipeline_queries8 import quality_scored
    from kmeans_mapreduce_spark.sources.matview import read_matview
    from kmeans_mapreduce_spark.streaming.export import documents_stream_source
    from kmeans_mapreduce_spark.streaming.quality_stream import (
        quality_measures,
        stream_quality_counts,
    )

    mv = str(tmp_path / "mv")
    q = stream_quality_counts(
        documents_stream_source(
            spark, _stage_docs_dir(sf_dir, tmp_path), max_files_per_trigger=1
        ),
        mv,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = {
        r["source"]: (r["n_docs"], r["n_kept"], r["n_tokens"], r["kept_id_sum"])
        for r in read_matview(spark, mv).collect()
    }
    batch = quality_scored(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).groupBy("source").agg(
        *[c.alias(n) for n, c in quality_measures().items()]
    )
    want = {
        r["source"]: (r["n_docs"], r["n_kept"], r["n_tokens"], r["kept_id_sum"])
        for r in batch.collect()
    }
    assert got == want


def test_stream_quality_replay_is_noop(spark, sf_dir, tmp_path):
    from kmeans_mapreduce_spark.plans.pipeline_queries8 import quality_scored
    from kmeans_mapreduce_spark.sources.matview import read_matview
    from kmeans_mapreduce_spark.streaming.matview_stream import fold_batch
    from kmeans_mapreduce_spark.streaming.quality_stream import (
        quality_measures,
    )

    mv = str(tmp_path / "mv2")
    scored = quality_scored(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    measures = quality_measures()
    assert fold_batch(scored, 0, mv, ["source"], measures) is True
    before = sorted(
        tuple(r)
        for r in read_matview(spark, mv).select("source", "n_docs", "n_kept").collect()
    )
    # same batch_id arrives again (at-least-once replay) -> skipped
    assert fold_batch(scored, 0, mv, ["source"], measures) is False
    after = sorted(
        tuple(r)
        for r in read_matview(spark, mv).select("source", "n_docs", "n_kept").collect()
    )
    assert before == after


def test_quality_stream_importable_without_session():
    """Regression: module-level Column construction made this module
    unimportable before a SparkSession existed."""
    import subprocess
    import sys

    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import kmeans_mapreduce_spark.streaming.quality_stream",
        ],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
