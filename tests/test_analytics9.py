"""Invariant tests for analytics pack 9 (plans/analytics9.py)."""

from __future__ import annotations

import pytest

from kmeans_mapreduce_spark.plans import analytics9 as AN9


def test_market_basket_support_lift_identities(spark, sf_dir):
    from pyspark.sql import functions as F

    rows = AN9.parts_market_basket(spark, sf_dir).collect()
    assert rows
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    basket = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n_orders = basket.select("l_orderkey").distinct().count()
    for r in rows:
        assert r["brand_a"] < r["brand_b"]
        assert r["n_together"] >= AN9._BASKET_MIN_SUPPORT
        assert 0 < r["support"] <= 1
        assert r["support"] == pytest.approx(
            r["n_together"] / n_orders, abs=1e-6
        )
        assert r["lift"] > 0
    # spot-check one pair's co-occurrence count directly
    r0 = rows[0]
    direct = (
        basket.alias("a")
        .join(basket.alias("b"), F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        .where(
            (F.col("a.p_brand") == r0["brand_a"])
            & (F.col("b.p_brand") == r0["brand_b"])
        )
        .count()
    )
    assert direct == r0["n_together"]


def test_market_basket_plan_blocks_on_orderkey(spark, sf_dir):
    """The pair self-join must be an equi-join on the order key —
    never a brand×brand cartesian."""
    df = AN9.parts_market_basket(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_conversion_latency_bounds(spark, sf_dir):
    r = AN9.events_conversion_latency(spark, sf_dir).collect()[0]
    assert r["n_converters"] > 0
    assert 0 <= r["p25_h"] <= r["p50_h"] <= r["p90_h"]
    assert r["mean_h"] > 0
    # converters can't outnumber users who purchased at all
    from pyspark.sql import functions as F

    from kmeans_mapreduce_spark.plans.relational import _events

    purchasers = (
        _events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert r["n_converters"] <= purchasers
