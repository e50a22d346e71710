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


def _fs_path(spark: SparkSession, path: str):
    """(FileSystem, Path) for `path` via the Hadoop API — correct on
    file://, hdfs:// and s3a:// alike (glob/os.path are local-only and
    silently report 'absent' for remote URIs)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


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
    keys, union the updates, rewrite.  With `partition_col` set (the
    table laid out hive-partitioned on it), ONLY the partitions that
    appear in `updates` are rewritten — at 100 TB an upsert batch
    touching 3 days of a date-partitioned table rewrites 3 partitions,
    not the table.  `dedup_latest_event`/keep-latest compaction is the
    read-side counterpart for when updates must land without rewrites.

    Durability: the merged scope is WRITTEN TO A STAGING DIRECTORY
    first (the job still reads the untouched target files), then swapped
    in with filesystem renames.  An overwrite-in-place of the directory
    being read — even behind an eager localCheckpoint — leaves the table
    partially destroyed if an executor holding non-replicated checkpoint
    blocks dies mid-write; after the staged write, the worst crash
    window is between two renames, which is recoverable (both dirs still
    exist in full).
    """
    fs, jtarget = _fs_path(spark, target_dir)
    if not fs.exists(jtarget):
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
    else:
        keep = target.join(
            updates.select(*key_cols).distinct(), key_cols, "left_anti"
        )
        merged = keep.unionByName(updates.select(*target.columns))
    _staged_swap_write(spark, target_dir, merged, partition_col)


def _staged_swap_write(
    spark: SparkSession,
    target_dir: str,
    merged: DataFrame,
    partition_col: str | None,
) -> None:
    """Write `merged` to a staging dir, then swap it into `target_dir`
    with filesystem renames (per affected partition when partitioned,
    whole-directory otherwise).  Shared tail of upsert/delete — the
    durability contract lives here once."""
    fs, jtarget = _fs_path(spark, target_dir)
    staging_dir = target_dir.rstrip("/") + "__staging"
    _, jstaging = _fs_path(spark, staging_dir)
    if partition_col:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(
            staging_dir
        )
        # swap in ONLY the staged partition dirs; untouched partitions'
        # files are never opened, moved, or rewritten.  A partition
        # whose rows were ALL deleted stages as absent — delete the
        # live dir for any scoped partition missing from staging.
        prefix = f"{partition_col}="
        for st in fs.listStatus(jstaging):
            name = st.getPath().getName()
            if not name.startswith(prefix):
                continue
            _, jdst = _fs_path(spark, f"{target_dir.rstrip('/')}/{name}")
            if fs.exists(jdst):
                fs.delete(jdst, True)
            fs.rename(st.getPath(), jdst)
        fs.delete(jstaging, True)
    else:
        merged.write.mode("overwrite").parquet(staging_dir)
        old_dir = target_dir.rstrip("/") + "__old"
        _, jold = _fs_path(spark, old_dir)
        if fs.exists(jold):
            fs.delete(jold, True)
        fs.rename(jtarget, jold)
        fs.rename(jstaging, jtarget)
        fs.delete(jold, True)


def delete_rows(
    spark: SparkSession,
    target_dir: str,
    keys: DataFrame,
    key_cols: list[str],
    partition_col: str | None = None,
) -> None:
    """Targeted row deletion (the GDPR/right-to-erasure primitive) from
    a plain-parquet table: every target row matching a key in `keys`
    is removed; everything else is byte-identical untouched.

    Same rewrite-the-affected-scope strategy as upsert_parquet: with
    `partition_col` set, only partitions that CONTAIN matching keys are
    rewritten — found with one aggregation over the join, not a full
    rewrite — so erasing one user from a date-partitioned 100 TB table
    rewrites only the partitions that user appears in.  The anti-join
    broadcasts when the key batch is small (the normal case — AQE
    decides from the actual size).  Durability via the same staged
    write + rename swap as upsert."""
    fs, jtarget = _fs_path(spark, target_dir)
    if not fs.exists(jtarget):
        raise FileNotFoundError(target_dir)
    target = spark.read.parquet(target_dir)
    kd = keys.select(*key_cols).distinct()
    if partition_col:
        parts = [
            r[0]
            for r in target.join(kd, key_cols, "left_semi")
            .select(partition_col)
            .distinct()
            .collect()
        ]
        if not parts:
            return  # no partition holds any of the keys: nothing to do
        scope = target.where(F.col(partition_col).isin(parts))
        merged = scope.join(kd, key_cols, "left_anti")
        # a fully-emptied partition writes no staging dir and would
        # survive the swap stale — find survivors BEFORE swapping and
        # drop the emptied partitions' live dirs afterwards
        survivors = {
            r[0] for r in merged.select(partition_col).distinct().collect()
        }
        _staged_swap_write(spark, target_dir, merged, partition_col)
        for p in parts:
            if p not in survivors:
                _, jdst = _fs_path(
                    spark, f"{target_dir.rstrip('/')}/{partition_col}={p}"
                )
                if fs.exists(jdst):
                    fs.delete(jdst, True)
    else:
        merged = target.join(kd, key_cols, "left_anti")
        _staged_swap_write(spark, target_dir, merged, None)


def _morton_key(cols_q: list, bits: int):
    """Interleave the low `bits` bits of each quantized column into one
    Morton (Z-curve) key — pure bitwise Catalyst expressions, codegen'd
    (bits * n_cols shift/AND/OR terms)."""
    n = len(cols_q)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols_q):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def write_zorder(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int,
    bits: int = 16,
) -> None:
    """Z-order clustered write: quantize each (numeric) column to
    `bits` bits over its min-max range, interleave into a Morton key,
    range-partition + sort by that key, write parquet.

    Why not write_sorted: a lexicographic sort gives perfect skipping
    on the FIRST column and none on the rest.  The Z-curve bounds the
    per-file range of EVERY clustered column simultaneously (each file
    covers a contiguous z interval ~ a hyper-rectangle), so footer
    min/max pruning works for predicates on any of them — the standard
    lakehouse multi-dimensional clustering layout.  Cost: one extra
    min/max pass (tiny: one row to the driver) + the same single
    range-partition shuffle write_sorted pays.  At 100 TB the min/max
    pass can read a sample or table stats instead; quantization error
    only costs skipping efficiency, never correctness."""
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    scale = (1 << bits) - 1
    quantized = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = (mx - mn) or 1.0
        q = F.least(
            F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * scale),
            F.lit(scale),
        ).cast("long")
        quantized.append(q)
    (
        df.withColumn("_z", _morton_key(quantized, bits))
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
