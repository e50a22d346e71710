"""Invariant tests for analytics pack 6 (plans/analytics6.py)."""

from __future__ import annotations

import math

import pytest

from kmeans_mapreduce_spark.plans import analytics6 as AN6


def test_ks_matches_scipy_free_reference(spark, sf_dir):
    """Recompute D driver-side from the raw samples (plain Python
    ECDF) and check the distributed statistic matches exactly."""
    from pyspark.sql import functions as F

    from kmeans_mapreduce_spark.plans.relational import _events

    row = AN6.events_ks_two_sample(spark, sf_dir).collect()[0]
    ev = (
        _events(spark, sf_dir)
        .where(F.col("event_type").isin("click", "purchase"))
        .select("event_type", "value")
        .collect()
    )
    a = sorted(r["value"] for r in ev if r["event_type"] == "click")
    b = sorted(r["value"] for r in ev if r["event_type"] == "purchase")
    assert (row["n_a"], row["n_b"]) == (len(a), len(b))

    import bisect

    d = 0.0
    for v in sorted(set(a) | set(b)):
        fa = bisect.bisect_right(a, v) / len(a)
        fb = bisect.bisect_right(b, v) / len(b)
        d = max(d, abs(fa - fb))
    assert row["ks_stat"] == pytest.approx(d, abs=1e-6)
    crit = 1.3581015157406195 * math.sqrt(
        (len(a) + len(b)) / (len(a) * len(b))
    )
    assert row["crit_05"] == pytest.approx(crit, abs=1e-6)
    assert row["reject_same_dist"] == (d > crit)


def test_ks_identical_samples_score_zero(spark):
    """Two samples drawn as THE SAME multiset must give D == 0."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    rows = [("a", float(v)) for v in (1, 2, 2, 3, 9)] + [
        ("b", float(v)) for v in (1, 2, 2, 3, 9)
    ]
    df = spark.createDataFrame(rows, "event_type string, value double")
    per_value = df.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == "a", 1)).alias("na"),
        F.count(F.when(F.col("event_type") == "b", 1)).alias("nb"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    d = (
        per_value.select(
            F.abs(
                F.sum("na").over(w) / F.sum("na").over(tot)
                - F.sum("nb").over(w) / F.sum("nb").over(tot)
            ).alias("diff")
        )
        .agg(F.max("diff"))
        .collect()[0][0]
    )
    assert d == pytest.approx(0.0, abs=1e-12)


def test_benford_shares_and_expectation(spark, sf_dir):
    rows = AN6.orders_benford_digits(spark, sf_dir).collect()
    assert [r["digit"] for r in rows] == sorted({r["digit"] for r in rows})
    assert all(1 <= r["digit"] <= 9 for r in rows)
    assert sum(r["obs_share"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    # the Benford expectation itself sums to 1 over digits 1..9
    assert sum(math.log10(1 + 1 / d) for d in range(1, 10)) == pytest.approx(
        1.0, abs=1e-12
    )
    for r in rows:
        assert r["benford_share"] == pytest.approx(
            math.log10(1 + 1 / r["digit"]), abs=1e-6
        )
        assert r["abs_dev"] == pytest.approx(
            abs(r["obs_share"] - r["benford_share"]), abs=2e-6
        )


def test_oov_rate_bounds_and_vocab_coverage_link(spark, sf_dir):
    """OOV rates in [0,1]; corpus-wide OOV mass equals total minus
    the top-K vocabulary's token mass (recomputed directly)."""
    from pyspark.sql import functions as F

    rows = AN6.docs_oov_rate(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["oov_rate"] <= 1.0
        assert r["n_oov"] <= r["n_tokens"]
    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .collect()
    )
    total = sum(r["cnt"] for r in toks)
    in_vocab = sum(r["cnt"] for r in toks[: AN6._OOV_VOCAB_K])
    assert sum(r["n_tokens"] for r in rows) == total
    assert sum(r["n_oov"] for r in rows) == total - in_vocab
