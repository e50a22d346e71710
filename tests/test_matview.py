"""Incremental materialized view: delta-only refresh == full
recompute, no-op when current, manifest survives the swap."""

from __future__ import annotations

from pyspark.sql import functions as F

from kmeans_mapreduce_spark.sources.matview import (
    read_matview,
    refresh_matview,
)

MEASURES = lambda: {  # noqa: E731 — fresh Columns per call
    "revenue": F.sum("val"),
    "n_rows": F.count("*"),
}


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "k string, val double").write.mode(
        "append"
    ).parquet(path)


def _full_recompute(spark, fact):
    return {
        r["k"]: (r["revenue"], r["n_rows"])
        for r in spark.read.parquet(fact)
        .groupBy("k")
        .agg(*[c.alias(n) for n, c in MEASURES().items()])
        .collect()
    }


def _view(spark, mv):
    return {
        r["k"]: (r["revenue"], r["n_rows"])
        for r in read_matview(spark, mv).collect()
    }


def test_incremental_refresh_equals_full_recompute(spark, tmp_path):
    fact = str(tmp_path / "fact")
    mv = str(tmp_path / "mv")
    _write_batch(spark, fact, [("a", 1.0), ("a", 2.0), ("b", 10.0)])
    n = refresh_matview(spark, fact, mv, ["k"], MEASURES())
    assert n > 0
    assert _view(spark, mv) == _full_recompute(spark, fact)

    # append a delta touching an existing key and a new key
    _write_batch(spark, fact, [("a", 4.0), ("c", 7.0)])
    n = refresh_matview(spark, fact, mv, ["k"], MEASURES())
    assert n > 0
    assert _view(spark, mv) == _full_recompute(spark, fact)
    assert _view(spark, mv)["a"] == (7.0, 3)


def test_refresh_is_noop_when_current(spark, tmp_path):
    import glob
    import os

    fact = str(tmp_path / "fact")
    mv = str(tmp_path / "mv")
    _write_batch(spark, fact, [("a", 1.0)])
    assert refresh_matview(spark, fact, mv, ["k"], MEASURES()) > 0
    mtimes = {f: os.path.getmtime(f) for f in glob.glob(f"{mv}/*")}
    assert refresh_matview(spark, fact, mv, ["k"], MEASURES()) == 0
    assert {f: os.path.getmtime(f) for f in glob.glob(f"{mv}/*")} == mtimes


def test_refresh_reads_only_new_files(spark, tmp_path):
    """The delta scan must touch only unseen files: corrupt the
    already-folded batch on disk — a delta-only refresh never opens
    it, a full recompute would crash."""
    import glob

    fact = str(tmp_path / "fact")
    mv = str(tmp_path / "mv")
    _write_batch(spark, fact, [("a", 1.0), ("b", 2.0)])
    refresh_matview(spark, fact, mv, ["k"], MEASURES())
    expected = _view(spark, mv)
    for f in glob.glob(f"{fact}/*.parquet"):
        with open(f, "wb") as fh:
            fh.write(b"not parquet anymore")
    _write_batch(spark, fact, [("b", 5.0)])
    # would crash reading the corrupted batch-1 files if the refresh
    # were not delta-only (count varies: Spark writes empty part files)
    assert refresh_matview(spark, fact, mv, ["k"], MEASURES()) >= 1
    got = _view(spark, mv)
    assert got["b"] == (expected["b"][0] + 5.0, expected["b"][1] + 1)
    assert got["a"] == expected["a"]


def test_torn_publish_heals(spark, tmp_path):
    """Crash window between the publish renames (mv -> mv__old,
    staging -> mv): on next entry the old view must be rolled back so
    BOTH recovery paths resume from the last published state — the
    streaming fold path would otherwise rebuild from one micro-batch."""
    import os

    fact = str(tmp_path / "fact")
    mv = str(tmp_path / "mv")
    _write_batch(spark, fact, [("a", 1.0), ("b", 10.0)])
    refresh_matview(spark, fact, mv, ["k"], MEASURES())
    published = _view(spark, mv)

    # simulate the torn state: first rename done, second never happened
    os.rename(mv, mv + "__old")
    from kmeans_mapreduce_spark.sources.matview import _read_manifest

    manifest = _read_manifest(spark, mv)  # triggers healing
    assert manifest.get("files"), "manifest lost after torn publish"
    assert _view(spark, mv) == published

    # refresh after healing folds only the delta and stays exact
    before = len(manifest["files"])
    _write_batch(spark, fact, [("a", 4.0)])
    n = refresh_matview(spark, fact, mv, ["k"], MEASURES())
    assert 1 <= n < before + 1, "refolded old files => manifest was lost"
    assert _view(spark, mv) == _full_recompute(spark, fact)


def test_torn_publish_heals_streaming_fold(spark, tmp_path):
    """The merge_delta entry path also heals — a foreachBatch fold
    arriving right after a torn publish must merge into the recovered
    view, not a fresh one."""
    import os

    from kmeans_mapreduce_spark.sources.matview import merge_delta

    fact = str(tmp_path / "fact")
    mv = str(tmp_path / "mv")
    _write_batch(spark, fact, [("a", 1.0), ("b", 10.0)])
    refresh_matview(spark, fact, mv, ["k"], MEASURES())
    os.rename(mv, mv + "__old")

    delta = spark.createDataFrame([("a", 4.0)], "k string, val double")
    merge_delta(spark, mv, delta, ["k"], MEASURES(), {"batch_id": 99})
    assert _view(spark, mv) == {"a": (5.0, 2), "b": (10.0, 1)}
