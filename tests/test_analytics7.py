"""Invariant tests for analytics pack 7 (plans/analytics7.py)."""

from __future__ import annotations

import pytest

from kmeans_mapreduce_spark.plans import analytics7 as AN7


def test_top_paths_shape_and_mass(spark, sf_dir):
    from pyspark.sql import functions as F

    from kmeans_mapreduce_spark.plans.relational import _events

    rows = AN7.events_top_paths(spark, sf_dir).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) <= AN7._TOP_PATHS
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        assert len(r["path"].split(">")) == AN7._PATH_LEN
    # trigram total mass: every user with k events contributes k-2
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("k")).collect()
    expected_total = sum(max(r["k"] - 2, 0) for r in per_user)
    # top-10 can't exceed the total trigram count
    assert sum(ns) <= expected_total


def test_cohort_ltv_monotone_per_cohort(spark, sf_dir):
    rows = AN7.cohort_ltv_curves(spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    curves = defaultdict(list)
    for r in rows:
        curves[r["cohort_w"]].append((r["offset"], r["cum_rev_per_user"]))
    for cw, pts in curves.items():
        pts.sort()
        assert pts[0][0] == 0, cw  # every cohort starts at offset 0
        vals = [v for _, v in pts]
        assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:])), cw
        assert all(v >= 0 for v in vals)
    # cohort sizes partition the user base
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    sizes = {r["cohort_w"]: r["cohort_users"] for r in rows}
    assert sum(sizes.values()) == n_users


def test_peaks_dominate_neighbors(spark, sf_dir):
    rows = AN7.events_peak_detection(spark, sf_dir).collect()
    for r in rows:
        assert r["n"] >= r["prev_n"] * AN7._PEAK_MIN_RATIO - 1e-9
        assert r["n"] >= r["next_n"] * AN7._PEAK_MIN_RATIO - 1e-9
        assert r["prominence"] >= AN7._PEAK_MIN_RATIO - 1e-4


def test_peak_fixture_interior_only(spark):
    """Edges and gap-adjacent days must never flag, even when large."""
    import datetime

    from pyspark.sql import functions as F

    rows = []
    # series: day 0..4 counts [10, 9, 20, 9, 100]; day 6 (gap!) 1000
    for day, n in [(0, 10), (1, 9), (2, 20), (3, 9), (4, 100), (6, 1000)]:
        for i in range(n):
            rows.append(
                (
                    len(rows),
                    datetime.datetime(2024, 1, 1) + datetime.timedelta(days=day),
                    1,
                    "t",
                    1.0,
                )
            )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    daily = (
        df.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
        .withColumn("day_i", F.datediff("day", F.lit("1970-01-01")))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("day_i")
    flagged = (
        daily.select(
            "day",
            "n",
            F.lag("n").over(w).alias("prev_n"),
            F.lead("n").over(w).alias("next_n"),
            (F.lag("day_i").over(w) == F.col("day_i") - 1).alias("pa"),
            (F.lead("day_i").over(w) == F.col("day_i") + 1).alias("na"),
        )
        .where(
            F.col("pa")
            & F.col("na")
            & (F.col("n") >= F.col("prev_n") * AN7._PEAK_MIN_RATIO)
            & (F.col("n") >= F.col("next_n") * AN7._PEAK_MIN_RATIO)
        )
        .collect()
    )
    # only day 2 (20 vs 9/9) qualifies: day 4 lacks a next neighbor,
    # day 6 sits across a gap, day 0 is an edge
    assert [r["n"] for r in flagged] == [20]
