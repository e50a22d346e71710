"""Table maintenance: small-file compaction and skip-friendly sorted
writes.

Neither exists in the reference (its sink is one CSV per cluster,
client.go:236-256), but no 100 TB parquet pipeline survives without
them: streaming ingest and fine-grained partitioning accumulate
thousands of KB-sized files (NameNode/listing pressure, per-file open
cost, tiny row groups that defeat vectorized readers), and unsorted
row groups make min/max statistics useless for data skipping.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _tree_bytes(spark: SparkSession, path: str, suffix: str = ".parquet") -> int:
    """Total bytes of data files under `path` via the Hadoop FileSystem
    API — works identically on file://, hdfs:// and s3a:// (a local
    os.walk would not)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)
    total = 0
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(suffix):
            total += f.getLen()
    return total


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Bin-pack a parquet directory into ~target-size output files;
    returns the output file count.

    File count is computed from the ACTUAL on-disk bytes (compressed),
    not row counts — the quantity that drives scan split sizing and
    listing cost.  The rewrite is one round-robin shuffle; at 100 TB
    you run this per partition/day, not on the whole table, so the
    shuffle is bounded by the compaction unit."""
    total = _tree_bytes(spark, in_path)
    n = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(in_path).repartition(n).write.mode("overwrite").parquet(
        out_path
    )
    return n


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
) -> None:
    """Range-partition by `sort_cols`, sort within each partition, and
    write — every output file covers a disjoint key range, so parquet
    footer min/max statistics let any engine skip whole files/row
    groups for selective predicates on those columns (the poor man's
    clustering key; pinned by footer inspection in tests).

    repartitionByRange samples the keys to build balanced boundaries —
    skewed keys land alone in their own range rather than hot-spotting
    a hash bucket."""
    part = (
        df.repartitionByRange(num_files, *sort_cols)
        if num_files is not None
        else df.repartitionByRange(*sort_cols)
    )
    part.sortWithinPartitions(*sort_cols).write.mode("overwrite").parquet(path)


def upsert_parquet(
    spark: SparkSession,
    target_dir: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str | None = None,
) -> None:
    """CDC merge (upsert) into a plain-parquet table: rows in `updates`
    replace target rows with the same key; new keys append.

    Without a table format's MERGE, the honest parquet strategy is
    rewrite-the-affected-scope: anti-join the target against the update
    keys, union the updates, overwrite.  With `partition_col` set (the
    table laid out hive-partitioned on it), ONLY the partitions that
    appear in `updates` are rewritten — at 100 TB an upsert batch
    touching 3 days of a date-partitioned table rewrites 3 partitions,
    not the table.  `dedup_latest_event`/keep-latest compaction is the
    read-side counterpart for when updates must land without rewrites.
    """
    import glob as _glob

    has_target = bool(_glob.glob(f"{target_dir.removeprefix('file:')}/*"))
    if not has_target:
        w = updates.write.mode("overwrite")
        if partition_col:
            w = w.partitionBy(partition_col)
        w.parquet(target_dir)
        return
    target = spark.read.parquet(target_dir)
    if partition_col:
        parts = [
            r[0] for r in updates.select(partition_col).distinct().collect()
        ]
        scope = target.where(F.col(partition_col).isin(parts))
        keep = scope.join(
            updates.select(*key_cols).distinct(), key_cols, "left_anti"
        )
        merged = keep.unionByName(updates.select(*scope.columns))
        # materialize BEFORE writing — the plan reads the same files the
        # write replaces; then dynamic partition overwrite rewrites only
        # the listed partitions
        staged = merged.localCheckpoint(eager=True)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        staged.write.mode("overwrite").partitionBy(partition_col).parquet(
            target_dir
        )
    else:
        keep = target.join(
            updates.select(*key_cols).distinct(), key_cols, "left_anti"
        )
        merged = keep.unionByName(updates.select(*target.columns))
        # full rewrite path: stage then swap (overwrite-in-place would
        # read and clobber the same files)
        staged = merged.localCheckpoint(eager=True)
        staged.write.mode("overwrite").parquet(target_dir)
