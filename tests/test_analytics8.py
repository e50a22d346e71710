"""Invariant tests for analytics pack 8 (plans/analytics8.py)."""

from __future__ import annotations

import pytest

from kmeans_mapreduce_spark.plans import analytics8 as AN8


def test_repurchase_percentiles_ordered(spark, sf_dir):
    for r in AN8.customers_repurchase_intervals(spark, sf_dir).collect():
        assert 0 <= r["p25"] <= r["p50"] <= r["p75"]
        assert r["n_gaps"] > 0
        assert r["mean_days"] >= 0


def test_session_durations_consistent_with_bounce(spark, sf_dir):
    """Session counts must agree with sessions_bounce_rate (same
    sessionization stack), and percentiles must be ordered."""
    from kmeans_mapreduce_spark.plans.analytics4 import sessions_bounce_rate

    dur = {
        r["event_type"]: r
        for r in AN8.sessions_duration_stats(spark, sf_dir).collect()
    }
    bounce = {
        r["event_type"]: r
        for r in sessions_bounce_rate(spark, sf_dir).collect()
    }
    assert set(dur) == set(bounce)
    for et, r in dur.items():
        assert r["n_sessions"] == bounce[et]["n_sessions"], et
        assert 0 <= r["p50_s"] <= r["p90_s"]
        assert r["mean_s"] >= 0


def test_lead_time_within_week_bounds(spark, sf_dir):
    for r in AN8.lineitem_shipping_lead_time(spark, sf_dir).collect():
        assert 0.0 <= r["within_week"] <= 1.0
        assert r["p50_d"] <= r["p90_d"]
        assert r["n_lines"] > 0


def test_brand_share_topn_folds_tail(spark, sf_dir):
    rows = AN8.parts_brand_share_topn(spark, sf_dir).collect()
    named = [r for r in rows if r["brand"] != "OTHER"]
    other = [r for r in rows if r["brand"] == "OTHER"]
    assert len(named) <= AN8._TOP_BRANDS
    assert all(r["n_brands"] == 1 for r in named)
    assert sum(r["share"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    if other:
        # every named brand out-earns the biggest tail member:
        # OTHER's AVERAGE member revenue is a safe lower-bound check
        avg_other = other[0]["revenue"] / other[0]["n_brands"]
        assert all(r["revenue"] >= avg_other for r in named)


def test_hourly_heatmap_mass_conservation(spark, sf_dir):
    """All 7 weekdays appear and the matrix total equals the event
    count."""
    rows = AN8.events_hourly_heatmap(spark, sf_dir).collect()
    assert [r["isodow"] for r in rows] == list(range(1, 8))
    total = sum(
        r["h00_06"] + r["h06_12"] + r["h12_18"] + r["h18_24"] for r in rows
    )
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert total == n_events
