"""Bucketed-table co-located join: the write-once-shuffle-never path.

Pins the property that makes bucketing worth it at 100 TB: a join of
two tables bucketed (and sorted) on the join key with equal bucket
counts plans with NO Exchange — the shuffle happened at write time.
"""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.operators.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(
        orders, "orders_b", "o_orderkey", 8, path=str(warehouse / "orders_b")
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        8,
        path=str(warehouse / "lineitem_b"),
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # force the join path (broadcast would trivially avoid exchanges)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, "o_orderkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    n_bucketed = bucketed_join(spark, left, right, "o_orderkey").count()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n_plain = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).count()
    assert n_bucketed == n_plain


def test_bucketed_groupby_on_key_has_no_exchange(spark, bucketed_tables):
    _, right = bucketed_tables
    agg = (
        spark.table(right)
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = _plan(agg)
    assert "Exchange" not in plan, "groupBy on the bucket key must not shuffle"
