"""Incremental materialized-view maintenance for append-only facts.

A 100 TB fact table cannot re-aggregate from scratch every time a
dashboard wants fresh numbers.  For ADDITIVE aggregates (sum, count —
and anything derivable from them at read time: avg = sum/count), the
standard maintenance loop is:

  1. list the fact directory's data files (Hadoop FS — works on
     file://, hdfs://, s3a:// alike) and diff against the manifest of
     files already folded into the view;
  2. read ONLY the new files — cost proportional to the delta, not
     the table;
  3. partial-aggregate the delta, union with the current view, and
     re-aggregate on the group keys (sum-of-sums / sum-of-counts: the
     same partial/final split Catalyst uses inside one query, applied
     across refreshes);
  4. atomically publish.  The manifest lives INSIDE the view
     directory (`_manifest.json` — underscore-prefixed files are
     invisible to parquet readers, like `_SUCCESS`), so the staged
     directory rename swaps data and manifest together: no crash
     window can double-count (manifest behind data) or drop a delta
     (manifest ahead of data).

Non-additive measures (exact distinct, median) need either a
mergeable-sketch column (see `sketch_rollup_weekly_users` for the HLL
pattern) or a full recompute; this module refuses them by API shape —
it only accepts expressions re-aggregated with SUM.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_manifest.json"


def _fs_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _list_data_files(spark: SparkSession, path: str) -> list[str]:
    fs, jpath = _fs_path(spark, path)
    out = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            out.append(f.getPath().toString())
    return sorted(out)


def _heal_torn_publish(spark: SparkSession, mv_dir: str) -> None:
    """Repair the publish crash window.  The atomic-publish sequence in
    `merge_delta` is two renames: mv -> mv__old, staging -> mv.  A crash
    between them leaves NO mv_dir but a complete mv__old (data +
    manifest).  Without repair, the batch path refolds everything (slow
    but correct) while the streaming fold path would see manifest={} and
    rebuild the view from only the replayed micro-batch — silently
    dropping every previously folded batch.  Roll the old view back in
    before anyone reads the manifest, so both recovery paths resume from
    the last published state."""
    fs, jmv = _fs_path(spark, mv_dir)
    _, jold = _fs_path(spark, mv_dir.rstrip("/") + "__old")
    if not fs.exists(jmv) and fs.exists(jold):
        fs.rename(jold, jmv)


def _read_manifest(spark: SparkSession, mv_dir: str) -> dict:
    """Manifest dict ({} when the view doesn't exist yet): `files` =
    fact files already folded (batch refresh), `batch_id` = last
    streaming micro-batch folded (stream refresh)."""
    _heal_torn_publish(spark, mv_dir)
    fs, _ = _fs_path(spark, mv_dir)
    _, jman = _fs_path(spark, f"{mv_dir.rstrip('/')}/{_MANIFEST}")
    if not fs.exists(jman):
        return {}
    stream = fs.open(jman)
    try:
        # py4j can't mutate a passed byte[] in place; commons-io (on
        # Spark's classpath) drains the stream JVM-side in one call
        text = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return json.loads(text)


def _write_manifest(spark: SparkSession, dir_: str, manifest: dict) -> None:
    fs, _ = _fs_path(spark, dir_)
    _, jman = _fs_path(spark, f"{dir_.rstrip('/')}/{_MANIFEST}")
    stream = fs.create(jman, True)
    try:
        stream.write(json.dumps(manifest).encode("utf-8"))
    finally:
        stream.close()


def refresh_matview(
    spark: SparkSession,
    fact_dir: str,
    mv_dir: str,
    group_cols: list[str],
    sum_measures: dict[str, Column],
) -> int:
    """Fold any new fact files into the materialized view; returns the
    number of new files processed (0 = view already current, nothing
    read or written).

    `sum_measures` maps output column -> an aggregate Column whose
    partials merge by SUM (F.sum(...), F.count(...)).  The view's
    stored schema is exactly (group_cols..., measures...)."""
    fact_files = _list_data_files(spark, fact_dir)
    manifest = _read_manifest(spark, mv_dir)
    done = set(manifest.get("files", []))
    new_files = [f for f in fact_files if f not in done]
    if not new_files:
        return 0
    delta = spark.read.parquet(*new_files)
    manifest["files"] = fact_files
    merge_delta(spark, mv_dir, delta, group_cols, sum_measures, manifest)
    return len(new_files)


def merge_delta(
    spark: SparkSession,
    mv_dir: str,
    delta_rows: DataFrame,
    group_cols: list[str],
    sum_measures: dict[str, Column],
    manifest: dict,
) -> None:
    """Aggregate `delta_rows`, merge into the view by summing partials
    per group, and publish atomically with `manifest` (staged write +
    directory rename; the manifest rides inside the staged directory
    so data and provenance swap together).  Shared by the file-diff
    batch refresh and the streaming foreachBatch fold."""
    delta = delta_rows.groupBy(*group_cols).agg(
        *[c.alias(n) for n, c in sum_measures.items()]
    )
    # Callers that hold a manifest from before a crash still merge
    # against the last PUBLISHED view, not a void left by a torn rename.
    _heal_torn_publish(spark, mv_dir)
    fs, jmv = _fs_path(spark, mv_dir)
    if fs.exists(jmv):
        current = spark.read.parquet(mv_dir).select(delta.columns)
        merged = (
            current.unionByName(delta)
            .groupBy(*group_cols)
            .agg(*[F.sum(n).alias(n) for n in sum_measures])
        )
        # the merge re-sums; preserve integer counts against sum()'s
        # type widening by casting back to the delta's dtypes
        for f in delta.schema.fields:
            merged = merged.withColumn(f.name, F.col(f.name).cast(f.dataType))
    else:
        merged = delta
    staging = mv_dir.rstrip("/") + "__staging"
    _, jstaging = _fs_path(spark, staging)
    if fs.exists(jstaging):
        fs.delete(jstaging, True)
    merged.write.mode("overwrite").parquet(staging)
    _write_manifest(spark, staging, manifest)
    old = mv_dir.rstrip("/") + "__old"
    _, jold = _fs_path(spark, old)
    if fs.exists(jold):
        fs.delete(jold, True)
    if fs.exists(jmv):
        fs.rename(jmv, jold)
    fs.rename(jstaging, jmv)
    fs.delete(jold, True)


def read_matview(spark: SparkSession, mv_dir: str) -> DataFrame:
    return spark.read.parquet(mv_dir)
