"""Interchange formats: write/read roundtrips must be lossless, and
partitioned writes must prune at the scan."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.sources.formats import read_table, write_table


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    # timestamps -> date strings keep CSV/JSON roundtrips type-exact
    return (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
        .cache()
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip_lossless(spark, orders, tmp_path, fmt):
    path = str(tmp_path / f"orders_{fmt}")
    write_table(orders, path, fmt)
    back = read_table(spark, path, fmt, orders.schema)
    assert back.schema == orders.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, orders.collect()))


def test_csv_rejects_nested_columns(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError, match="flatten first"):
        write_table(emb, str(tmp_path / "bad"), "csv")


def test_partitioned_write_prunes_at_scan(spark, orders, tmp_path):
    path = str(tmp_path / "orders_part")
    write_table(orders, path, "parquet", partition_by=["o_orderpriority"])
    filtered = spark.read.parquet(path).where(F.col("o_orderpriority") == "1-URGENT")
    buf = io.StringIO()
    with redirect_stdout(buf):
        filtered.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "1-URGENT" in plan  # predicate reached the partition pruner
    n_urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").count()
    assert filtered.count() == n_urgent
