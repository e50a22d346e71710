"""Invariant tests for analytics pack 4 (plans/analytics4.py)."""

from __future__ import annotations

from collections import defaultdict

import pytest

from kmeans_mapreduce_spark.plans import analytics4 as AN4


def test_lifecycle_accounting_identity(spark, sf_dir):
    """churned(w) == active(w-1) - retained(w): everyone active last
    week either stays (retained) or churns; and the three active
    classes partition each week's active users."""
    rows = AN4.events_user_lifecycle(spark, sf_dir).collect()
    grid = defaultdict(dict)
    for r in rows:
        grid[r["week_i"]][r["status"]] = r["n_users"]
    weeks = sorted(grid)
    assert weeks
    for w in weeks:
        g = grid[w]
        assert all(v > 0 for v in g.values())
        active = g.get("new", 0) + g.get("retained", 0) + g.get("resurrected", 0)
        if w == weeks[0]:
            assert g.get("retained", 0) == 0 and g.get("churned", 0) == 0
        prev = grid.get(w - 1, {})
        prev_active = (
            prev.get("new", 0) + prev.get("retained", 0) + prev.get("resurrected", 0)
        )
        if prev:
            assert g.get("churned", 0) == prev_active - g.get("retained", 0)
        assert active >= 0


def test_gini_bounded_and_zero_for_uniform(spark, sf_dir):
    for r in AN4.events_engagement_gini(spark, sf_dir).collect():
        assert 0.0 <= r["gini"] < 1.0

    # closed-form sanity: a perfectly uniform distribution scores ~0
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [("t", i, 10) for i in range(50)], "event_type string, user_id int, x int"
    )
    w = Window.partitionBy("event_type").orderBy("x", "user_id")
    ranked = df.select("event_type", "x", F.row_number().over(w).alias("rnk"))
    g = ranked.groupBy("event_type").agg(
        (
            (2 * F.sum(F.col("rnk") * F.col("x")))
            / (F.count("*") * F.sum("x"))
            - (F.count("*") + 1) / F.count("*")
        ).alias("gini")
    ).collect()[0]["gini"]
    assert g == pytest.approx(0.0, abs=1e-9)


def test_rfm_partitions_all_customers(spark, sf_dir):
    rows = AN4.customers_rfm_segments(spark, sf_dir).collect()
    n_cust = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert 1 <= r["r"] <= 5 and 1 <= r["f"] <= 5 and 1 <= r["m"] <= 5
        assert r["segment"] == f"{r['r']}-{r['f']}-{r['m']}"


def test_stickiness_bounds(spark, sf_dir):
    rows = AN4.events_stickiness_dau_mau(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["stickiness"] <= 1.0
        assert r["avg_dau"] <= r["mau"]
        assert 1 <= r["n_days"] <= 31


def test_bounce_rate_consistent(spark, sf_dir):
    rows = AN4.sessions_bounce_rate(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_bounced"] <= r["n_sessions"]
        assert r["bounce_rate"] == pytest.approx(
            r["n_bounced"] / r["n_sessions"], abs=1e-6
        )
