"""Invariant + plan tests for analytics pack 5 (plans/analytics5.py)."""

from __future__ import annotations

from collections import defaultdict

import pytest

from kmeans_mapreduce_spark.plans import analytics5 as AN5


def test_hhi_bounds_and_broadcast_dims(spark, sf_dir):
    rows = AN5.suppliers_nation_hhi(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 1/n <= HHI <= 1
        assert 1.0 / r["n_suppliers"] - 1e-6 <= r["hhi"] <= 1.0 + 1e-9
    plan = (
        AN5.suppliers_nation_hhi(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # dims never shuffle the fact side
    assert "BroadcastNestedLoopJoin" not in plan


def test_priority_mix_shares_sum_to_one(spark, sf_dir):
    rows = AN5.orders_priority_mix_shift(spark, sf_dir).collect()
    per_q = defaultdict(float)
    for r in rows:
        per_q[r["yq"]] += r["share"]
    for yq, total in per_q.items():
        assert total == pytest.approx(1.0, abs=1e-4), yq
    # shifts reconcile with the share series where quarters are adjacent
    by_prio = defaultdict(dict)
    for r in rows:
        y, q = r["yq"].split("-")
        by_prio[r["o_orderpriority"]][int(y) * 4 + int(q) - 1] = r
    for prio, series in by_prio.items():
        for qi, r in series.items():
            prev = series.get(qi - 1)
            if r["share_shift"] is not None:
                assert prev is not None
                assert r["share_shift"] == pytest.approx(
                    round(r["share"] - prev["share"], 6), abs=2e-6
                )


def test_quantile_sketch_error_bounded_by_bucket_width(spark, sf_dir):
    """The merged-histogram estimates must land within two bucket
    widths of the EXACT weekly quantiles recomputed from raw events
    (one width of intra-bucket interpolation error, plus up to one
    more when the sketch's n*q rank convention and percentile()'s
    (n-1)*q+1 convention straddle a bucket boundary)."""
    import pyspark.sql.functions as F

    from kmeans_mapreduce_spark.plans.relational import _events

    est = {
        (r["event_type"], r["week_i"]): r
        for r in AN5.sketch_quantile_rollup(spark, sf_dir).collect()
    }
    ev = _events(spark, sf_dir)
    exact = (
        ev.groupBy(
            "event_type",
            (F.datediff(F.to_date("ts"), F.lit("1970-01-01")) / 7)
            .cast("long")
            .alias("week_i"),
        )
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert est
    for r in exact:
        e = est[(r["event_type"], r["week_i"])]
        assert e["n_events"] == r["n"]
        assert abs(e["p50_est"] - r["p50"]) <= 2 * AN5._QSK_WIDTH
        assert abs(e["p90_est"] - r["p90"]) <= 2 * AN5._QSK_WIDTH


def test_trade_balance_nets_to_zero(spark, sf_dir):
    """Every revenue unit is supplied by some nation and bought by
    some nation, so the nets sum to ~0 across nations."""
    rows = AN5.nations_trade_balance(spark, sf_dir).collect()
    assert rows
    total_supplied = sum(r["supplied"] for r in rows)
    total_bought = sum(r["bought"] for r in rows)
    assert total_supplied == pytest.approx(total_bought, rel=1e-9)
    assert sum(r["net"] for r in rows) == pytest.approx(0.0, abs=1.0)
