"""Compaction + sorted-write maintenance: file counts, data equality,
and the footer statistics that make data skipping real."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.sources.maintenance import (
    compact_parquet,
    write_sorted,
)


def _files(path: str) -> list[str]:
    return sorted(glob.glob(f"{path}/*.parquet"))


def test_compact_binpacks_small_files(spark, sf_dir, tmp_path):
    """50 shredded files -> ~total/target files, bytes-driven, with the
    data intact."""
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    shredded = str(tmp_path / "shredded")
    src.repartition(50).write.parquet(shredded)
    assert len(_files(shredded)) == 50

    from kmeans_mapreduce_spark.sources.maintenance import _tree_bytes

    total = _tree_bytes(spark, shredded)
    compacted = str(tmp_path / "compacted")
    n = compact_parquet(spark, shredded, compacted, target_file_bytes=total // 4)
    got_files = _files(compacted)
    assert len(got_files) == n <= 6  # ceil(total/(total//4)) with slack
    before = sorted(r["doc_id"] for r in src.collect())
    after = sorted(
        r["doc_id"] for r in spark.read.parquet(compacted).collect()
    )
    assert before == after


def test_write_sorted_produces_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """After write_sorted on o_orderdate, parquet footers must show
    (near-)disjoint per-file min/max ranges — the property an engine's
    row-group pruning needs.  Unsorted writes fail this badly: every
    file spans the whole key range."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "sorted_orders")
    write_sorted(orders, out, ["o_orderdate"], num_files=8)

    ranges = []
    for f in _files(out):
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "o_orderdate"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 4
    # consecutive files may share at most the boundary key
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {hi1} > {lo2}"

    # and the data survives the round trip
    assert spark.read.parquet(out).count() == orders.count()

    # control: an unsorted write spans ~the whole range in every file
    unsorted = str(tmp_path / "unsorted_orders")
    orders.repartition(8).write.parquet(unsorted)
    f0 = _files(unsorted)[0]
    md = pq.ParquetFile(f0).metadata
    col_idx = next(
        i for i in range(md.num_columns)
        if md.row_group(0).column(i).path_in_schema == "o_orderdate"
    )
    st = md.row_group(0).column(col_idx).statistics
    global_lo, global_hi = ranges[0][0], ranges[-1][1]
    covered = (st.max - st.min).days if hasattr(st.max - st.min, "days") else (
        st.max - st.min
    )
    full = (global_hi - global_lo).days if hasattr(
        global_hi - global_lo, "days"
    ) else (global_hi - global_lo)
    assert covered > full * 0.5, "control failed: unsorted file unexpectedly narrow"


def test_upsert_unpartitioned(spark, tmp_path):
    from kmeans_mapreduce_spark.sources.maintenance import upsert_parquet

    t = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, val double",
    )
    upsert_parquet(spark, t, base, ["id"])
    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], "id long, name string, val double"
    )
    upsert_parquet(spark, t, updates, ["id"])
    got = {r["id"]: (r["name"], r["val"]) for r in spark.read.parquet(t).collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_upsert_partitioned_rewrites_only_touched_partitions(spark, tmp_path):
    import glob
    import os

    from kmeans_mapreduce_spark.sources.maintenance import upsert_parquet

    t = str(tmp_path / "ptbl")
    base = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (2, "2024-01-01", 20.0), (3, "2024-01-02", 30.0)],
        "id long, day string, val double",
    )
    upsert_parquet(spark, t, base, ["id"], partition_col="day")
    untouched_files = {
        f: os.path.getmtime(f) for f in glob.glob(f"{t}/day=2024-01-02/*.parquet")
    }
    updates = spark.createDataFrame(
        [(2, "2024-01-01", 21.0), (4, "2024-01-01", 40.0)],
        "id long, day string, val double",
    )
    upsert_parquet(spark, t, updates, ["id"], partition_col="day")
    got = {r["id"]: r["val"] for r in spark.read.parquet(t).collect()}
    assert got == {1: 10.0, 2: 21.0, 3: 30.0, 4: 40.0}
    # dynamic overwrite must not have touched the 2024-01-02 partition
    for f, mtime in untouched_files.items():
        assert os.path.exists(f) and os.path.getmtime(f) == mtime


def test_write_zorder_bounds_both_columns(spark, sf_dir, tmp_path):
    """Z-order clustering must bound the per-file range of EVERY
    clustered column (lexicographic sort only bounds the first).
    Check footer min/max: the mean per-file coverage fraction of both
    o_custkey and o_totalprice must be well under the whole range,
    while a plain write_sorted on (o_custkey, o_totalprice) leaves
    o_totalprice unclustered (~full range in most files)."""
    from kmeans_mapreduce_spark.sources.maintenance import write_zorder

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cols = ["o_custkey", "o_totalprice"]

    def mean_coverage(path: str) -> dict[str, float]:
        spans: dict[str, list[float]] = {c: [] for c in cols}
        glo: dict[str, list[float]] = {c: [float("inf"), float("-inf")] for c in cols}
        for f in _files(path):
            md = pq.ParquetFile(f).metadata
            for c in cols:
                idx = next(
                    i for i in range(md.num_columns)
                    if md.row_group(0).column(i).path_in_schema == c
                )
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    mins.append(float(st.min))
                    maxs.append(float(st.max))
                spans[c].append(max(maxs) - min(mins))
                glo[c][0] = min(glo[c][0], min(mins))
                glo[c][1] = max(glo[c][1], max(maxs))
        return {
            c: (sum(s) / len(s)) / ((glo[c][1] - glo[c][0]) or 1.0)
            for c, s in spans.items()
        }

    zpath = str(tmp_path / "zorders")
    write_zorder(orders, zpath, cols, num_files=16)
    zc = mean_coverage(zpath)
    assert spark.read.parquet(zpath).count() == orders.count()

    spath = str(tmp_path / "lexorders")
    write_sorted(orders, spath, cols, num_files=16)
    sc = mean_coverage(spath)

    # both dims bounded under z-order…
    assert zc["o_custkey"] < 0.6, zc
    assert zc["o_totalprice"] < 0.6, zc
    # …while lexicographic leaves the secondary column near-global
    assert sc["o_totalprice"] > zc["o_totalprice"] * 1.5, (sc, zc)


def test_upsert_partition_move_leaves_no_stale_copy(spark, tmp_path):
    """An update that CHANGES a row's partition value must remove the
    old-partition copy — and drop the old partition's dir entirely when
    the move empties it."""
    import os

    from kmeans_mapreduce_spark.sources.maintenance import upsert_parquet

    t = str(tmp_path / "mvtbl")
    base = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (2, "2024-01-02", 20.0)],
        "id long, day string, val double",
    )
    upsert_parquet(spark, t, base, ["id"], partition_col="day")
    # move id=2 from 01-02 to 01-03 (01-02 becomes empty)
    updates = spark.createDataFrame(
        [(2, "2024-01-03", 21.0)], "id long, day string, val double"
    )
    upsert_parquet(spark, t, updates, ["id"], partition_col="day")
    rows = spark.read.parquet(t).collect()
    # partition-type inference reads day back as DATE — compare as str
    got = {(r["id"], str(r["day"])): r["val"] for r in rows}
    assert got == {(1, "2024-01-01"): 10.0, (2, "2024-01-03"): 21.0}
    assert len(rows) == 2, "stale copy survived the partition move"
    assert not os.path.exists(f"{t}/day=2024-01-02"), "emptied dir not dropped"


def test_delete_partitioned_special_char_values(spark, tmp_path):
    """Partition values containing hive-escaped characters (: / =)
    round-trip through the emptied-partition cleanup — the dir name we
    delete must match the escaped name Spark's writer produced."""
    import os

    from kmeans_mapreduce_spark.sources.maintenance import delete_rows

    t = str(tmp_path / "esc")
    base = spark.createDataFrame(
        [(1, "a:b", 1.0), (2, "a:b", 2.0), (3, "plain", 3.0)],
        "id long, grp string, val double",
    )
    base.write.partitionBy("grp").parquet(t)
    assert os.path.exists(f"{t}/grp=a%3Ab")  # writer escaped the colon
    keys = spark.createDataFrame([(1,), (2,)], "id long")
    delete_rows(spark, t, keys, ["id"], partition_col="grp")
    got = {r["id"] for r in spark.read.parquet(t).collect()}
    assert got == {3}
    assert not os.path.exists(f"{t}/grp=a%3Ab"), "escaped dir survived erase"

def test_delete_null_partition_keeps_unrequested_rows(spark, tmp_path):
    """Deleting a key that lives in the NULL partition must NOT erase
    the OTHER null-partition rows: the scope predicate needs an
    isNull() branch (isin() never matches NULL) or the whole
    __HIVE_DEFAULT_PARTITION__ dir is dropped by the swap while its
    surviving rows were never rewritten."""
    from kmeans_mapreduce_spark.sources.maintenance import delete_rows

    t = str(tmp_path / "nulldel")
    base = spark.createDataFrame(
        [(1, None, 1.0), (2, None, 2.0), (3, "g", 3.0)],
        "id long, grp string, val double",
    )
    base.write.partitionBy("grp").parquet(t)
    keys = spark.createDataFrame([(1,)], "id long")
    delete_rows(spark, t, keys, ["id"], partition_col="grp")
    got = {(r["id"], r["grp"]) for r in spark.read.parquet(t).collect()}
    assert got == {(2, None), (3, "g")}, (
        "null-partition rows not requested for deletion must survive"
    )


def test_hive_dirname_rejects_unsupported_types_and_escapes_del(spark):
    """str(True)='True' and float/timestamp formatting diverge from
    Spark's writer -> must raise, not silently build a wrong dir name;
    DEL (0x7F) is escaped like other control chars; bools format
    lowercase like the writer."""
    import datetime

    import pytest as _pytest

    from kmeans_mapreduce_spark.sources.maintenance import (
        _hive_partition_dirname,
    )

    assert _hive_partition_dirname("c", "a\x7fb") == "c=a%7Fb"
    assert _hive_partition_dirname("c", True) == "c=true"
    assert _hive_partition_dirname("c", datetime.date(2024, 1, 2)) == (
        "c=2024-01-02"
    )
    for bad in (1.5, datetime.datetime(2024, 1, 2, 3, 4, 5), b"x"):
        with _pytest.raises(TypeError):
            _hive_partition_dirname("c", bad)


# --- partition-scoped compaction ---------------------------------------------


def _part_files(spark, tdir, name):
    from kmeans_mapreduce_spark.sources.maintenance import _fs_path

    fs, jp = _fs_path(spark, f"{tdir}/{name}")
    return sorted(
        (st.getPath().getName(), st.getModificationTime())
        for st in fs.listStatus(jp)
        if st.getPath().getName().endswith(".parquet")
    )


def _fragmented_table(spark, tdir):
    """day=hot gets 12 tiny files, day=cold gets 2."""
    hot = spark.range(1200).selectExpr(
        "id AS k", "'hot' AS day", "id * 3 AS v"
    )
    cold = spark.range(200).selectExpr(
        "id + 10000 AS k", "'cold' AS day", "id AS v"
    )
    hot.repartition(12).write.partitionBy("day").mode("overwrite").parquet(tdir)
    cold.repartition(2).write.partitionBy("day").mode("append").parquet(tdir)


def test_compact_partitions_rewrites_only_offenders(spark, tmp_path):
    from kmeans_mapreduce_spark.sources.maintenance import compact_partitions

    tdir = str(tmp_path / "t")
    _fragmented_table(spark, tdir)
    before = {
        r["k"]: (r["day"], r["v"])
        for r in spark.read.parquet(tdir).collect()
    }
    cold_before = _part_files(spark, tdir, "day=cold")
    assert len(_part_files(spark, tdir, "day=hot")) == 12

    done = compact_partitions(spark, tdir, max_files=4)
    assert done == ["day=hot"]
    # offender compacted to a small file count; data identical
    assert len(_part_files(spark, tdir, "day=hot")) <= 4
    after = {
        r["k"]: (r["day"], r["v"])
        for r in spark.read.parquet(tdir).collect()
    }
    assert after == before
    # untouched partition: SAME files, SAME mtimes (never opened/moved)
    assert _part_files(spark, tdir, "day=cold") == cold_before
    # idempotent: second run finds nothing to do
    assert compact_partitions(spark, tdir, max_files=4) == []


def test_compact_partitions_recovers_parked_partition(spark, tmp_path):
    """Crash simulation: the live dir was renamed into the stage root
    (the window between the two renames) — the next call restores it
    before compacting, so retry IS the repair procedure."""
    from kmeans_mapreduce_spark.sources.maintenance import (
        _fs_path,
        compact_partitions,
    )

    tdir = str(tmp_path / "t")
    _fragmented_table(spark, tdir)
    before = {
        r["k"]: (r["day"], r["v"])
        for r in spark.read.parquet(tdir).collect()
    }
    fs, _ = _fs_path(spark, tdir)
    parked = tdir + "__compactstage/parked"
    _, jparked = _fs_path(spark, parked)
    fs.mkdirs(jparked)
    _, jlive = _fs_path(spark, f"{tdir}/day=hot")
    _, jold = _fs_path(spark, f"{parked}/day=hot")
    fs.rename(jlive, jold)  # the mid-swap crash state
    assert "day=hot" not in {
        r["day"] for r in spark.read.parquet(tdir).select("day").collect()
    }
    done = compact_partitions(spark, tdir, max_files=4)
    assert done == ["day=hot"]  # restored, then compacted
    after = {
        r["k"]: (r["day"], r["v"])
        for r in spark.read.parquet(tdir).collect()
    }
    assert after == before


def test_compact_partitions_recovers_legacy_parked_layout(spark, tmp_path):
    """An earlier revision parked live dirs at the TOP of the stage
    root as <name>__old; the preamble must restore those too, so an
    upgrade mid-crash cannot strand a partition."""
    from kmeans_mapreduce_spark.sources.maintenance import (
        _fs_path,
        compact_partitions,
    )

    tdir = str(tmp_path / "t")
    _fragmented_table(spark, tdir)
    before = {
        r["k"]: (r["day"], r["v"])
        for r in spark.read.parquet(tdir).collect()
    }
    fs, _ = _fs_path(spark, tdir)
    stage = tdir + "__compactstage"
    _, jstage = _fs_path(spark, stage)
    fs.mkdirs(jstage)
    _, jlive = _fs_path(spark, f"{tdir}/day=hot")
    _, jold = _fs_path(spark, f"{stage}/day=hot__old")  # legacy location
    fs.rename(jlive, jold)
    done = compact_partitions(spark, tdir, max_files=4)
    assert done == ["day=hot"]
    after = {
        r["k"]: (r["day"], r["v"])
        for r in spark.read.parquet(tdir).collect()
    }
    assert after == before


def test_compact_partitions_rejects_nested_layout(spark, tmp_path):
    """Nested hive layouts (a=.../b=.../) hold no top-level .parquet
    files, so the pre-fix code silently skipped every partition.  The
    contract is now explicit: single-level only, ValueError otherwise."""
    import pytest

    from kmeans_mapreduce_spark.sources.maintenance import compact_partitions

    tdir = str(tmp_path / "nested")
    spark.range(100).selectExpr(
        "id AS k", "id % 2 AS a", "id % 3 AS b"
    ).write.partitionBy("a", "b").parquet(tdir)
    with pytest.raises(ValueError, match="single-level"):
        compact_partitions(spark, tdir, max_files=0)
