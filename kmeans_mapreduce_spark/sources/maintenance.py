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
    immutable_partition_key: bool = False,
) -> None:
    """CDC merge (upsert) into a plain-parquet table: rows in `updates`
    replace target rows with the same key; new keys append.

    Without a table format's MERGE, the honest parquet strategy is
    rewrite-the-affected-scope: anti-join the target against the update
    keys, union the updates, rewrite.  With `partition_col` set (the
    table laid out hive-partitioned on it), only the affected
    partitions are rewritten — the ones updates land in, plus (unless
    `immutable_partition_key` asserts otherwise) the ones the updated
    keys currently live in, so a row whose partition value changes
    leaves no stale copy behind.  At 100 TB an upsert batch touching 3
    days of a date-partitioned table rewrites 3 partitions, not the
    table.  `dedup_latest_event`/keep-latest compaction is the
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
        kd = updates.select(*key_cols).distinct()
        # Rewrite scope = partitions the updates LAND in ∪ partitions
        # the updated keys CURRENTLY live in.  The second set matters
        # when an update changes a row's partition value: without it
        # the stale copy survives in its old partition and the table
        # holds the same key twice.  Finding it costs one semi-join
        # over the target (key-only column scan + broadcast of the
        # update keys — same cost class delete_rows already pays).
        # `immutable_partition_key=True` is the caller's contract that
        # a key's partition value never changes (date-partitioned facts
        # keyed by (date, id), etc.); then the two sets provably
        # coincide and the full-table semi-join is skipped — at 100 TB
        # the difference between scanning two key columns of the whole
        # table and listing a handful of touched partitions.
        new_parts = {
            r[0] for r in updates.select(partition_col).distinct().collect()
        }
        old_parts = (
            set()
            if immutable_partition_key
            else {
                r[0]
                for r in target.join(kd, key_cols, "left_semi")
                .select(partition_col)
                .distinct()
                .collect()
            }
        )
        parts = list(new_parts | old_parts)
        scope = target.where(
            F.col(partition_col).isin([p for p in parts if p is not None])
            | (
                F.col(partition_col).isNull()
                if any(p is None for p in parts)
                else F.lit(False)
            )
        )
        keep = scope.join(kd, key_cols, "left_anti")
        merged = keep.unionByName(updates.select(*scope.columns))
        # a scoped partition can empty out entirely (its only rows
        # moved to another partition) — scoped_parts lets the swap
        # drop its live dir in the same pass
        _staged_swap_write(spark, target_dir, merged, partition_col, parts)
    else:
        keep = target.join(
            updates.select(*key_cols).distinct(), key_cols, "left_anti"
        )
        merged = keep.unionByName(updates.select(*target.columns))
        _staged_swap_write(spark, target_dir, merged, None)


# Characters Hive/Spark percent-escape in partition directory names
# (org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils): these
# plus ASCII control chars become %XX, so a value like "a/b" lands in
# the dir "c=a%2Fb".  We must build the SAME names when deleting
# emptied partitions, or special-charactered values silently survive.
_HIVE_ESCAPE_CHARS = set('"#%\'*/:=?\\{[]^')


def _hive_partition_dirname(partition_col: str, value) -> str:
    """The directory name Spark's hive-style writer produces for one
    partition value — `col=escaped(value)`, `__HIVE_DEFAULT_PARTITION__`
    for NULL.  Only value types whose str() provably matches Spark's
    writer are accepted (str, int, ISO date) plus bool (Spark writes
    'true'/'false', not Python's 'True'); anything else (floats,
    timestamps, decimals…) raises rather than silently building a name
    the writer never produced — a wrong name here means emptied-partition
    cleanup misses the real directory and leaves stale rows, the exact
    bug this helper exists to prevent."""
    if value is None:
        return f"{partition_col}=__HIVE_DEFAULT_PARTITION__"
    import datetime

    if isinstance(value, bool):
        s = "true" if value else "false"
    elif isinstance(value, (str, int)) or type(value) is datetime.date:
        s = str(value)
    else:
        raise TypeError(
            f"unsupported partition value type {type(value).__name__}: "
            "str()-formatting diverges from Spark's writer for this type"
        )
    out = []
    for ch in s:
        # Spark escapes ASCII control chars AND DEL (0x7F)
        if ch in _HIVE_ESCAPE_CHARS or ord(ch) < 0x20 or ord(ch) == 0x7F:
            out.append(f"%{ord(ch):02X}")
        else:
            out.append(ch)
    return f"{partition_col}={''.join(out)}"


def _staged_swap_write(
    spark: SparkSession,
    target_dir: str,
    merged: DataFrame,
    partition_col: str | None,
    scoped_parts: list | None = None,
) -> None:
    """Write `merged` to a staging dir, then swap it into `target_dir`
    with filesystem renames (per affected partition when partitioned,
    whole-directory otherwise).  Shared tail of upsert/delete — the
    durability contract lives here once.

    `scoped_parts` (partitioned path): the partition VALUES that were
    in the rewrite scope.  A scoped partition whose rows were ALL
    removed stages as absent; its live dir is deleted HERE, in the same
    swap pass — not by the caller afterwards — so the erase a caller
    asked for cannot be lost to a crash between the swap and a separate
    cleanup loop.  Crash semantics: every individual rename/delete is
    atomic and the sequence is idempotent, so a failed call must simply
    be RETRIED; a crash mid-sequence leaves some partitions new and
    some old (each internally consistent), never a torn partition."""
    fs, jtarget = _fs_path(spark, target_dir)
    staging_dir = target_dir.rstrip("/") + "__staging"
    _, jstaging = _fs_path(spark, staging_dir)
    if partition_col:
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(
            staging_dir
        )
        # swap in ONLY the staged partition dirs; untouched partitions'
        # files are never opened, moved, or rewritten.
        prefix = f"{partition_col}="
        staged_names = set()
        for st in fs.listStatus(jstaging):
            name = st.getPath().getName()
            if not name.startswith(prefix):
                continue
            staged_names.add(name)
            _, jdst = _fs_path(spark, f"{target_dir.rstrip('/')}/{name}")
            if fs.exists(jdst):
                fs.delete(jdst, True)
            fs.rename(st.getPath(), jdst)
        # same pass: drop live dirs for scoped partitions that staged
        # empty (all rows deleted / moved out).
        for p in scoped_parts or []:
            name = _hive_partition_dirname(partition_col, p)
            if name in staged_names:
                continue
            _, jdst = _fs_path(spark, f"{target_dir.rstrip('/')}/{name}")
            if fs.exists(jdst):
                fs.delete(jdst, True)
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
        # NULL-aware scope (mirrors upsert_parquet): isin() never matches
        # NULL, so without the isNull branch the null partition would be
        # EXCLUDED from the rewrite while _staged_swap_write deletes its
        # live __HIVE_DEFAULT_PARTITION__ dir — erasing every
        # null-partition row, not just the requested keys.
        scope = target.where(
            F.col(partition_col).isin([p for p in parts if p is not None])
            | (
                F.col(partition_col).isNull()
                if any(p is None for p in parts)
                else F.lit(False)
            )
        )
        merged = scope.join(kd, key_cols, "left_anti")
        # a fully-emptied partition writes no staging dir; passing the
        # scope as scoped_parts makes the swap delete its live dir in
        # the SAME pass (no separate post-swap cleanup a crash could
        # skip — the erasure this function exists for must not outlive
        # a retried call)
        _staged_swap_write(spark, target_dir, merged, partition_col, parts)
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


def compact_partitions(
    spark: SparkSession,
    target_dir: str,
    max_files: int = 8,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> list[str]:
    """In-place small-file compaction for a hive-partitioned parquet
    table: rewrite ONLY partitions holding more than ``max_files``
    parquet files into ~target-size files, leaving every other
    partition's files untouched (not opened, not moved — their mtimes
    prove it in tests).  Returns the compacted partition dir names.

    This is the maintenance half of the small-files problem at 100 TB:
    streaming sinks and frequent upserts leave thousands of KB-scale
    files per hot partition, and scan cost becomes listing + open
    overhead instead of bytes.  Whole-table `compact_parquet` rewrites
    everything; this one bounds the rewrite to offending partitions —
    run it per day/hour partition as data lands.

    Durability: each offender stages OUTSIDE the table root (a staged
    sibling INSIDE it, e.g. ``c=5__old``, would parse as a bogus
    partition value mid-operation) under ``<stage>/staged/<name>``,
    then swaps via two CHECKED renames with the live copy parked at
    ``<stage>/parked/<name>`` between them — two separate namespaces,
    so a partition VALUE that happens to end in '__old' can never be
    mistaken for a parked copy.  Every rename's boolean result is
    checked (Hadoop FileSystem.rename reports most failures by
    returning false, not raising): a failed promote restores the
    parked copy before raising, so no code path deletes the only live
    copy.  A crash mid-swap leaves the partition parked, never torn,
    and the RECOVERY PREAMBLE of the next call renames it back before
    doing any new work — retry-after-crash is the complete repair
    procedure (leftover staged dirs are discarded: their source data
    is live or parked, both recoverable)."""
    fs, jtarget = _fs_path(spark, target_dir)
    stage_root = target_dir.rstrip("/") + "__compactstage"
    parked_root = f"{stage_root}/parked"
    staged_root = f"{stage_root}/staged"
    _, jstage = _fs_path(spark, stage_root)
    _, jparked = _fs_path(spark, parked_root)
    _, jstaged_root = _fs_path(spark, staged_root)

    def _checked_rename(src, dst, what: str) -> None:
        if not fs.rename(src, dst):
            raise IOError(f"rename failed ({what}): {src} -> {dst}")

    # recovery preamble: a previous crash may have parked a live
    # partition without completing the swap — restore any parked dir
    # whose live counterpart is absent.  Leftover staged dirs are
    # incomplete-by-construction and safely discarded (the source rows
    # are live or parked).
    if fs.exists(jparked):
        for st in fs.listStatus(jparked):
            name = st.getPath().getName()
            _, jlive = _fs_path(spark, f"{target_dir.rstrip('/')}/{name}")
            if not fs.exists(jlive):
                _checked_rename(st.getPath(), jlive, "recover parked")
            else:
                fs.delete(st.getPath(), True)
    if fs.exists(jstage):
        # legacy layout compatibility: an earlier revision parked live
        # dirs as <stage>/<name>__old at the TOP of the stage root —
        # restore those too, so upgrading mid-crash cannot strand a
        # partition (values genuinely ending in '__old' were never
        # parked top-level by this code, only by the ambiguous legacy
        # layout this namespace split replaced)
        for st in fs.listStatus(jstage):
            name = st.getPath().getName()
            if name in ("parked", "staged") or not name.endswith("__old"):
                continue
            live = name[: -len("__old")]
            _, jlive = _fs_path(spark, f"{target_dir.rstrip('/')}/{live}")
            if not fs.exists(jlive):
                _checked_rename(st.getPath(), jlive, "recover legacy parked")
            else:
                fs.delete(st.getPath(), True)
    if fs.exists(jstaged_root):
        fs.delete(jstaged_root, True)

    compacted: list[str] = []
    for st in fs.listStatus(jtarget):
        if not st.isDirectory():
            continue
        name = st.getPath().getName()
        if "=" not in name:
            continue
        children = fs.listStatus(st.getPath())
        nested = [
            c.getPath().getName()
            for c in children
            if c.isDirectory() and "=" in c.getPath().getName()
        ]
        if nested:
            # single-level hive layouts only: a nested layout
            # (a=1/b=2/...) would count 0 parquet files here and be
            # silently skipped — surface that instead of no-op'ing
            raise ValueError(
                f"compact_partitions supports single-level hive "
                f"partitioning only; {name!r} contains nested "
                f"partition dirs (e.g. {nested[0]!r}) — compact each "
                f"leaf dir, or use compact_parquet on the whole table"
            )
        files = [
            f
            for f in children
            if f.getPath().getName().endswith(".parquet")
        ]
        if len(files) <= max_files:
            continue
        nbytes = sum(f.getLen() for f in files)
        n_out = max(1, math.ceil(nbytes / target_file_bytes))
        if n_out >= len(files):
            continue  # already at/below the achievable count
        part_dir = f"{target_dir.rstrip('/')}/{name}"
        staged = f"{staged_root}/{name}"
        (
            spark.read.parquet(part_dir)
            .repartition(n_out)
            .write.mode("overwrite")
            .parquet(staged)
        )
        _, jlive = _fs_path(spark, part_dir)
        _, jstaged = _fs_path(spark, staged)
        _, jold = _fs_path(spark, f"{parked_root}/{name}")
        if not fs.exists(jparked):
            fs.mkdirs(jparked)
        if fs.exists(jold):
            fs.delete(jold, True)
        _checked_rename(jlive, jold, "park live copy")
        try:
            _checked_rename(jstaged, jlive, "promote compacted copy")
        except IOError:
            # the promote failed with the live dir already parked —
            # restore it before surfacing, so the table never loses the
            # partition to a reported-by-boolean rename failure
            _checked_rename(jold, jlive, "restore after failed promote")
            raise
        fs.delete(jold, True)
        compacted.append(name)
    if fs.exists(jstage):
        for sub in (jstaged_root, jparked):
            if fs.exists(sub) and len(fs.listStatus(sub)) == 0:
                fs.delete(sub, True)
        if len(fs.listStatus(jstage)) == 0:
            fs.delete(jstage, True)
    return compacted
