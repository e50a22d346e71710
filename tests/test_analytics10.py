"""Invariant tests for analytics pack 10 (plans/analytics10.py)."""

from __future__ import annotations

import pytest

from kmeans_mapreduce_spark.plans import analytics10 as AN10


def test_streaks_fixture_islands(spark):
    """Hand-built islands: days {1,2,3, 7, 9,10} -> longest streak 3."""
    import datetime

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [
        (1, datetime.datetime(2024, 1, d)) for d in (1, 2, 3, 7, 9, 10)
    ] + [(2, datetime.datetime(2024, 1, 5))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    ud = df.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day_i"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_i")
    got = (
        ud.select(
            "user_id", (F.col("day_i") - F.row_number().over(w)).alias("isl")
        )
        .groupBy("user_id", "isl")
        .count()
        .groupBy("user_id")
        .agg(F.max("count").alias("longest"))
        .collect()
    )
    assert {r["user_id"]: r["longest"] for r in got} == {1: 3, 2: 1}


def test_streaks_distribution_covers_users(spark, sf_dir):
    rows = AN10.users_longest_streaks(spark, sf_dir).collect()
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_users"] for r in rows) == n_users
    assert all(r["longest"] >= 1 for r in rows)


def test_forecast_backtest_bounds(spark, sf_dir):
    rows = AN10.events_forecast_backtest(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_days_scored"] > 0
        assert r["mape_pct"] >= 0
        assert abs(r["bias_pct"]) <= r["mape_pct"] + 1e-6  # |mean e| <= mean |e|


def test_new_vs_returning_first_order_accounting(spark, sf_dir):
    rows = AN10.orders_new_vs_returning(spark, sf_dir).collect()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_cust = o.select("o_custkey").distinct().count()
    n_orders = o.count()
    assert sum(r["new_orders"] for r in rows) == n_cust  # one first each
    assert (
        sum(r["new_orders"] + r["returning_orders"] for r in rows) == n_orders
    )


def test_hist2d_mass_and_bounds(spark, sf_dir):
    rows = AN10.orders_hist2d_price_quantity(spark, sf_dir).collect()
    n_orders_with_lines = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    assert sum(r["n"] for r in rows) == n_orders_with_lines
    assert all(r["price_cell"] >= 0 and r["qty_cell"] >= 0 for r in rows)


def test_variant_schema_inference_and_typed_probe(spark, sf_dir):
    """schema_of_variant sees the object shape; a typed probe on a
    missing path is NULL (not an error); counts reconcile."""
    from pyspark.sql import functions as F

    from kmeans_mapreduce_spark.plans.relational import _events

    rows = AN10.events_variant_props(spark, sf_dir).collect()
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r["n"] for r in rows) == n_events
    for r in rows:
        if r["null_k"] < r["n"]:
            assert r["min_k"] <= r["avg_k"] <= r["max_k"]

    ev = _events(spark, sf_dir).limit(1)
    probe = ev.select(
        F.schema_of_variant(F.parse_json("props")).alias("schema"),
        F.variant_get(F.parse_json("props"), "$.does_not_exist", "int").alias(
            "missing"
        ),
    ).collect()[0]
    assert "OBJECT<" in probe["schema"] and "k:" in probe["schema"]
    assert probe["missing"] is None


def test_returns_by_brand_bounds(spark, sf_dir):
    rows = AN10.lineitem_returns_by_brand(spark, sf_dir).collect()
    assert rows
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert sum(r["n_lines"] for r in rows) == li.count()
    for r in rows:
        assert 0.0 <= r["return_rate"] <= 1.0
        assert 0.0 <= r["returned_rev_share"] <= 1.0
        assert r["n_returned"] <= r["n_lines"]


def test_dup_rate_consistent_with_exact_dedup(spark, sf_dir):
    """n_duped summed across sources equals (total docs) minus the
    docs whose text hash is a singleton — the same partition of the
    corpus dedup_exact uses."""
    from pyspark.sql import functions as F

    rows = AN10.docs_dup_rate_by_source(spark, sf_dir).collect()
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sizes = d.groupBy(F.md5("text")).count()
    singles = sizes.where("count = 1").count()
    total = d.count()
    assert sum(r["n_docs"] for r in rows) == total
    assert sum(r["n_duped"] for r in rows) == total - singles
