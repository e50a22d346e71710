"""Invariant tests for analytics pack 3 (plans/analytics3.py).

The oracle sweep (tools/compare.py + the driver gate) pins exact
values; these tests pin the properties that would survive a refactor
of either engine — dominance correctness for the skyline, probability
mass for the Markov matrix, bounded statistics, and the plan shapes
the 100 TB posture depends on.
"""

from __future__ import annotations

import pytest

from kmeans_mapreduce_spark.plans import analytics3 as AN3


def test_pareto_frontier_dominance(spark, sf_dir):
    """No frontier point may dominate another; every non-frontier
    point must be dominated by some frontier point (checked against a
    brute-force pass over the distinct points)."""
    from pyspark.sql import functions as F

    front = AN3.orders_pareto_frontier(spark, sf_dir).collect()
    pts = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(
            F.round("o_totalprice", 2).alias("price"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
        )
        .count()
        .collect()
    )
    fset = {(r["price"], r["odate"]) for r in front}
    assert fset  # non-empty frontier

    def dominates(a, b):
        return a[0] >= b[0] and a[1] >= b[1] and a != b

    for a in fset:
        assert not any(dominates(b, a) for b in fset), (a, "dominated in frontier")
    others = [(r["price"], r["odate"]) for r in pts if (r["price"], r["odate"]) not in fset]
    for b in others[:500]:  # bounded brute-force spot check
        assert any(dominates(a, b) for a in fset), (b, "undominated but excluded")


def test_pareto_frontier_plan_two_phase(spark, sf_dir):
    """The global (unpartitioned) window must run AFTER the bucketed
    local-frontier pass — two Window nodes, no nested-loop join."""
    df = AN3.orders_pareto_frontier(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 2
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_markov_rows_are_distributions(spark, sf_dir):
    rows = AN3.events_markov_transitions(spark, sf_dir).collect()
    from collections import defaultdict

    mass = defaultdict(float)
    for r in rows:
        assert 0.0 <= r["prob"] <= 1.0
        mass[r["from_type"]] += r["prob"]
    for ft, m in mass.items():
        assert m == pytest.approx(1.0, abs=1e-4), ft


def test_autocorr_bounded(spark, sf_dir):
    for r in AN3.events_autocorr_daily(spark, sf_dir).collect():
        for c in ("acf_1", "acf_7"):
            if r[c] is not None:
                assert -1.0 <= r[c] <= 1.0


def test_rolling_corr_window_len(spark, sf_dir):
    for r in AN3.events_rolling_corr(spark, sf_dir).collect():
        assert 1 <= r["n_days"] <= AN3._ROLLCORR_DAYS
        assert -1.0 <= r["roll_corr"] <= 1.0


def test_equidepth_buckets_balanced(spark, sf_dir):
    rows = AN3.hist_equidepth_prices(spark, sf_dir).collect()
    assert [r["bucket"] for r in rows] == list(range(1, AN3._HIST_BUCKETS + 1))
    counts = [r["n"] for r in rows]
    assert max(counts) - min(counts) <= 1  # ntile guarantee
    # spans are ordered and non-overlapping (prices are near-unique)
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"]


def test_vocab_coverage_monotone(spark, sf_dir):
    rows = AN3.docs_vocab_coverage(spark, sf_dir).collect()
    assert [r["threshold"] for r in rows] == [0.5, 0.9, 0.99]
    sizes = [r["vocab_size"] for r in rows]
    assert sizes == sorted(sizes)
    assert all(s >= 1 for s in sizes)
    assert len({r["total_tokens"] for r in rows}) == 1


def test_dow_index_weighted_mean_is_one(spark, sf_dir):
    from collections import defaultdict

    rows = AN3.events_dow_seasonality(spark, sf_dir).collect()
    acc = defaultdict(lambda: [0.0, 0])
    for r in rows:
        assert 1 <= r["isodow"] <= 7
        acc[r["event_type"]][0] += r["dow_index"] * r["n_days"]
        acc[r["event_type"]][1] += r["n_days"]
    for et, (s, n) in acc.items():
        assert s / n == pytest.approx(1.0, abs=1e-3), et


def test_mom_growth_consecutive_only(spark, sf_dir):
    import datetime

    rows = AN3.orders_mom_growth(spark, sf_dir).collect()
    by_month = {r["month"]: r for r in rows}
    for r in rows:
        m = datetime.date.fromisoformat(r["month"])
        prev = (m.replace(day=1) - datetime.timedelta(days=1)).replace(day=1)
        if prev.isoformat() in by_month:
            assert r["prev_revenue"] == by_month[prev.isoformat()]["revenue"]
        else:
            assert r["prev_revenue"] is None and r["growth_pct"] is None
