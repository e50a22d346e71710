"""delete_rows (targeted erasure) and schema-evolution helpers."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import types as T

from kmeans_mapreduce_spark.sources.evolution import (
    align_to_schema,
    read_merged,
)
from kmeans_mapreduce_spark.sources.maintenance import delete_rows


def test_delete_unpartitioned(spark, tmp_path):
    t = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "id long, name string"
    ).write.parquet(t)
    keys = spark.createDataFrame([(2,), (4,), (99,)], "id long")
    delete_rows(spark, t, keys, ["id"])
    got = sorted(r["id"] for r in spark.read.parquet(t).collect())
    assert got == [1, 3]


def test_delete_missing_table_raises(spark, tmp_path):
    keys = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(FileNotFoundError):
        delete_rows(spark, str(tmp_path / "absent"), keys, ["id"])


def test_delete_partitioned_rewrites_only_containing_partitions(
    spark, tmp_path
):
    t = str(tmp_path / "ptbl")
    spark.createDataFrame(
        [
            (1, "2024-01-01", 10.0),
            (2, "2024-01-01", 20.0),
            (3, "2024-01-02", 30.0),
            (4, "2024-01-03", 40.0),
        ],
        "id long, day string, val double",
    ).write.partitionBy("day").parquet(t)
    untouched = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{t}/day=2024-01-02/*.parquet")
        + glob.glob(f"{t}/day=2024-01-03/*.parquet")
    }
    assert untouched
    delete_rows(
        spark,
        t,
        spark.createDataFrame([(2,)], "id long"),
        ["id"],
        partition_col="day",
    )
    got = sorted(r["id"] for r in spark.read.parquet(t).collect())
    assert got == [1, 3, 4]
    for f, mtime in untouched.items():
        assert os.path.exists(f) and os.path.getmtime(f) == mtime


def test_delete_partitioned_drops_emptied_partition(spark, tmp_path):
    t = str(tmp_path / "ptbl2")
    spark.createDataFrame(
        [(1, "2024-01-01", 1.0), (2, "2024-01-02", 2.0), (3, "2024-01-02", 3.0)],
        "id long, day string, val double",
    ).write.partitionBy("day").parquet(t)
    delete_rows(
        spark,
        t,
        spark.createDataFrame([(2,), (3,)], "id long"),
        ["id"],
        partition_col="day",
    )
    assert not glob.glob(f"{t}/day=2024-01-02")
    got = sorted(r["id"] for r in spark.read.parquet(t).collect())
    assert got == [1]


def test_delete_no_matching_keys_is_noop(spark, tmp_path):
    t = str(tmp_path / "ptbl3")
    spark.createDataFrame(
        [(1, "2024-01-01", 1.0)], "id long, day string, val double"
    ).write.partitionBy("day").parquet(t)
    files = {
        f: os.path.getmtime(f) for f in glob.glob(f"{t}/day=*/*.parquet")
    }
    delete_rows(
        spark,
        t,
        spark.createDataFrame([(42,)], "id long"),
        ["id"],
        partition_col="day",
    )
    for f, mtime in files.items():
        assert os.path.getmtime(f) == mtime  # nothing rewritten


def test_read_merged_unions_file_schemas(spark, tmp_path):
    t = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(t)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(t)
    df = read_merged(spark, t)
    assert set(df.columns) == {"id", "name", "score"}
    got = {r["id"]: r["score"] for r in df.collect()}
    assert got == {1: None, 2: 9.5}


def test_align_adds_missing_and_widens(spark):
    df = spark.createDataFrame([(1, 2)], "a int, b int")
    target = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
            T.StructField("c", T.DoubleType()),
        ]
    )
    out = align_to_schema(df, target)
    assert [f.dataType.typeName() for f in out.schema.fields] == [
        "long",
        "string",
        "double",
    ]
    r = out.collect()[0]
    assert (r["a"], r["b"], r["c"]) == (1, "2", None)


def test_align_refuses_lossy_and_extra(spark):
    df = spark.createDataFrame([(1, 1.5)], "a long, b double")
    narrow = T.StructType([T.StructField("a", T.IntegerType()),
                           T.StructField("b", T.DoubleType())])
    with pytest.raises(ValueError, match="lossy"):
        align_to_schema(df, narrow)
    shrunk = T.StructType([T.StructField("a", T.LongType())])
    with pytest.raises(ValueError, match="drop_extra"):
        align_to_schema(df, shrunk)
    assert align_to_schema(df, shrunk, drop_extra=True).columns == ["a"]
