"""Versioned table snapshots with an atomic latest-pointer — poor
man's time travel for plain parquet.

`snapshot_diff_orders` (operators/diff.py) compares two table
versions; this module is where those versions come from.  Layout:

    table_dir/
      v=1/ ... parquet ...
      v=2/ ... parquet ...
      _LATEST            <- text file holding "2"

Writers publish a NEW immutable version directory, then flip the
pointer (a one-block file create — atomic enough on HDFS, and
last-writer-wins on S3, which is exactly the semantics a pointer
wants).  Readers resolve the pointer once and then read an immutable
directory, so a long query never sees a half-written version and
concurrent readers of different versions don't interfere.  Old
versions stay readable for diff/rollback until `vacuum` removes them.

This is the 20-line core of what table formats (Delta/Iceberg) do
with manifests; at 100 TB you use a real format — this keeps the
same discipline (immutable data files + tiny atomically-swapped
metadata) available on plain parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_LATEST"


def _fs_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def latest_version(spark: SparkSession, table_dir: str) -> int:
    """Current version number (0 = table doesn't exist yet)."""
    fs, _ = _fs_path(spark, table_dir)
    _, jptr = _fs_path(spark, f"{table_dir.rstrip('/')}/{_POINTER}")
    if not fs.exists(jptr):
        return 0
    stream = fs.open(jptr)
    try:
        text = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return int(text.strip())


def write_version(spark: SparkSession, df: DataFrame, table_dir: str) -> int:
    """Publish `df` as the next version; returns its number.  The data
    directory is fully written before the pointer flips, so readers
    can never observe a partial version."""
    v = latest_version(spark, table_dir) + 1
    df.write.mode("errorifexists").parquet(
        f"{table_dir.rstrip('/')}/v={v}"
    )
    fs, _ = _fs_path(spark, table_dir)
    _, jptr = _fs_path(spark, f"{table_dir.rstrip('/')}/{_POINTER}")
    stream = fs.create(jptr, True)
    try:
        stream.write(str(v).encode("utf-8"))
    finally:
        stream.close()
    return v


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read a specific version (default: the latest).  Raises on a
    version that was never published."""
    v = latest_version(spark, table_dir) if version is None else version
    fs, _ = _fs_path(spark, table_dir)
    _, jv = _fs_path(spark, f"{table_dir.rstrip('/')}/v={v}")
    if v < 1 or not fs.exists(jv):
        raise FileNotFoundError(f"{table_dir} has no version {v}")
    return spark.read.parquet(f"{table_dir.rstrip('/')}/v={v}")


def vacuum(spark: SparkSession, table_dir: str, keep_last: int = 2) -> list[int]:
    """Delete all but the newest `keep_last` versions; returns the
    removed version numbers.  Never touches the latest pointer's
    target (keep_last >= 1 enforced)."""
    keep_last = max(1, keep_last)
    latest = latest_version(spark, table_dir)
    fs, jdir = _fs_path(spark, table_dir)
    removed = []
    for st in fs.listStatus(jdir):
        name = st.getPath().getName()
        if not name.startswith("v="):
            continue
        v = int(name[2:])
        if v <= latest - keep_last:
            fs.delete(st.getPath(), True)
            removed.append(v)
    return sorted(removed)
