"""Event-analytics pack 2: EWMA smoothing, A/B significance testing,
marketing attribution, and a chi-square independence test.

The reference engine is numeric-K-Means-only (SURVEY §1); these are
the statistical query shapes every product/ops analytics workload runs
on an events table, expressed Spark-first with DuckDB oracles.

Scale posture (shared):
  * everything keys on user_id or event_type — high-cardinality or
    tiny-cardinality respectively, never a skewed middle;
  * EWMA is ONE window shuffle (no band self-join on the Spark side:
    the frame is collected per-row into a bounded 10-element array and
    folded by a Catalyst higher-order function, so state per row is
    O(window), not O(history));
  * the test-statistic queries aggregate to O(groups) rows before any
    join, so AQE broadcasts every post-agg join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.plans.relational import _events

# EWMA decay and frame length.  A 10-row frame bounds both the Spark
# array state and the oracle's band join; 0.8**9 ~= 0.13 so the
# truncated tail is negligible analytically but the truncation is part
# of the query's DEFINITION (both engines compute the same 10-term sum
# exactly, so the hash check is exact, not approximate).
_EWMA_ALPHA_COMP = 0.8  # (1 - alpha): weight multiplier per step back
_EWMA_FRAME = 10

_ZTEST_CRIT = 1.959963984540054  # two-sided 5% normal critical value
_CHI2_VALUE_CUT = 50.0
_CHI2_CRIT_4DF = 9.487729036781154  # chi2 95% critical value, dof=4
_ATTR_WINDOW_DAYS = 7


def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of `value` over
    each user's last 10 events (decay 0.8 per step), reported at the
    user's final event — the smoothed-engagement score ranking/alerting
    pipelines maintain per entity.

    Plan: ONE window shuffle on user_id.  collect_list over a
    ROWS-bounded frame materializes at most 10 doubles per row, then a
    zip_with/aggregate fold computes the weighted sum JVM-side — no
    Python, no self-join, state independent of history length.  The
    oracle expresses the same 10-term sum as a band self-join, which is
    the formulation we deliberately avoid at scale (it re-shuffles the
    fact table twice)."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_FRAME - 1), 0)
    )
    wn = Window.partitionBy("user_id").orderBy("ts", "event_id")
    a = repr(_EWMA_ALPHA_COMP)
    fold = (
        "aggregate(zip_with(vals, sequence(size(vals) - 1, 0, -1),"
        f" (v, p) -> v * pow({a}, p)), 0D, (acc, x) -> acc + x)"
        f" / aggregate(sequence(size(vals) - 1, 0, -1), 0D,"
        f" (acc, p) -> acc + pow({a}, p))"
    )
    return (
        ev.select(
            "user_id",
            "value",
            F.collect_list("value").over(w).alias("vals"),
            F.row_number().over(wn).alias("rn"),
            F.count("*").over(Window.partitionBy("user_id")).alias("n_events"),
        )
        .where(F.col("rn") == F.col("n_events"))
        .select(
            "user_id",
            "n_events",
            F.round("value", 6).alias("last_value"),
            F.round(F.expr(fold), 6).alias("ewma"),
        )
    )


EWMA_SQL = f"""
WITH seq AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS i,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events),
last AS (SELECT user_id, i AS li, n, value AS last_value FROM seq WHERE i = n)
SELECT l.user_id,
       l.n AS n_events,
       ROUND(l.last_value, 6) AS last_value,
       ROUND(SUM(s.value * POWER({_EWMA_ALPHA_COMP!r}, l.li - s.i))
             / SUM(POWER({_EWMA_ALPHA_COMP!r}, l.li - s.i)), 6) AS ewma
FROM last l
JOIN seq s ON s.user_id = l.user_id
          AND s.i BETWEEN l.li - {_EWMA_FRAME - 1} AND l.li
GROUP BY l.user_id, l.n, l.last_value
"""


def ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Welch z-test per event_type: users are split into a
    deterministic A/B arm by user_id parity, and the test asks whether
    mean `value` differs between arms — the workhorse experiment
    readout.

    Plan: ONE partial-aggregated groupBy over event_type (5 groups);
    conditional aggregates compute both arms in a single pass (no
    self-join, no second scan).  All downstream arithmetic is on 5
    rows."""
    ev = _events(spark, sf_dir).select(
        "event_type", (F.col("user_id") % 2).alias("arm"), "value"
    )
    a0 = F.col("arm") == 0
    a1 = F.col("arm") == 1
    g = ev.groupBy("event_type").agg(
        F.count(F.when(a0, 1)).alias("n_a"),
        F.count(F.when(a1, 1)).alias("n_b"),
        F.avg(F.when(a0, F.col("value"))).alias("mean_a"),
        F.avg(F.when(a1, F.col("value"))).alias("mean_b"),
        F.var_samp(F.when(a0, F.col("value"))).alias("var_a"),
        F.var_samp(F.when(a1, F.col("value"))).alias("var_b"),
    )
    z = (F.col("mean_b") - F.col("mean_a")) / F.sqrt(
        F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")
    )
    return g.select(
        "event_type",
        "n_a",
        "n_b",
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) > _ZTEST_CRIT).alias("significant"),
    ).orderBy("event_type")


ZTEST_SQL = f"""
WITH g AS (
  SELECT event_type,
         COUNT(*) FILTER (WHERE user_id % 2 = 0) AS n_a,
         COUNT(*) FILTER (WHERE user_id % 2 = 1) AS n_b,
         AVG(value) FILTER (WHERE user_id % 2 = 0) AS mean_a,
         AVG(value) FILTER (WHERE user_id % 2 = 1) AS mean_b,
         VAR_SAMP(value) FILTER (WHERE user_id % 2 = 0) AS var_a,
         VAR_SAMP(value) FILTER (WHERE user_id % 2 = 1) AS var_b
  FROM events GROUP BY event_type)
SELECT event_type, n_a, n_b,
       ROUND(mean_a, 6) AS mean_a,
       ROUND(mean_b, 6) AS mean_b,
       ROUND((mean_b - mean_a) / SQRT(var_a / n_a + var_b / n_b), 6) AS z_score,
       ABS((mean_b - mean_a) / SQRT(var_a / n_a + var_b / n_b))
         > {_ZTEST_CRIT!r} AS significant
FROM g ORDER BY event_type
"""


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the user's
    most recent non-purchase event within the preceding 7 days (or
    'none').  Output: conversions + attributed revenue per touch type.

    Plan: ONE window shuffle on user_id — last(...ignorenulls) over an
    UNBOUNDED PRECEDING..1 PRECEDING frame carries the latest touch
    forward, so no self-join against the (large) touch stream; the
    7-day recency check is a per-row filter after the window.  The
    final agg is O(event types)."""
    ev = _events(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_purchase = F.col("event_type") != "purchase"
    touched = ev.select(
        "*",
        F.last(F.when(non_purchase, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(non_purchase, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
    )
    credited = touched.where(F.col("event_type") == "purchase").select(
        F.when(
            F.col("touch_ts")
            >= F.col("ts") - F.expr(f"INTERVAL {_ATTR_WINDOW_DAYS} DAYS"),
            F.col("touch_type"),
        )
        .otherwise(F.lit("none"))
        .alias("credit"),
        "value",
    )
    return (
        credited.groupBy("credit")
        .agg(
            F.count("*").alias("conversions"),
            F.round(F.sum("value"), 4).alias("revenue"),
        )
        .orderBy("credit")
    )


ATTRIBUTION_SQL = f"""
WITH touched AS (
  SELECT user_id, ts, event_type, value,
         last_value(CASE WHEN event_type != 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_type,
         last_value(CASE WHEN event_type != 'purchase' THEN ts END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_ts
  FROM events)
SELECT COALESCE(CASE WHEN touch_ts >= ts - INTERVAL {_ATTR_WINDOW_DAYS} DAY
                     THEN touch_type END, 'none') AS credit,
       COUNT(*) AS conversions,
       ROUND(SUM(value), 4) AS revenue
FROM touched
WHERE event_type = 'purchase'
GROUP BY 1 ORDER BY 1
"""


def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between event_type and a
    high-value flag (value > 50) — the categorical-association screen
    run over every (dimension, outcome) pair in feature triage.

    Plan: one 10-cell contingency aggregation, then expected counts via
    window totals over those 10 rows (no re-scan, no driver math).
    Output is a single decision row."""
    ev = _events(spark, sf_dir).select(
        "event_type", (F.col("value") > _CHI2_VALUE_CUT).alias("high")
    )
    cells = ev.groupBy("event_type", "high").agg(F.count("*").alias("o"))
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("high")
    wall = Window.partitionBy()
    with_e = cells.select(
        "o",
        (
            F.sum("o").over(wr)
            * F.sum("o").over(wc)
            / F.sum("o").over(wall)
        ).alias("e"),
    )
    return with_e.agg(
        F.round(F.sum((F.col("o") - F.col("e")) ** 2 / F.col("e")), 6).alias(
            "chi2"
        ),
        F.lit(4).alias("dof"),
        (
            F.sum((F.col("o") - F.col("e")) ** 2 / F.col("e")) > _CHI2_CRIT_4DF
        ).alias("dependent"),
    )


CHI2_SQL = f"""
WITH cells AS (
  SELECT event_type, value > {_CHI2_VALUE_CUT!r} AS high, COUNT(*) AS o
  FROM events GROUP BY 1, 2),
with_e AS (
  SELECT o,
         SUM(o) OVER (PARTITION BY event_type)
           * SUM(o) OVER (PARTITION BY high)
           / SUM(o) OVER () AS e
  FROM cells)
SELECT ROUND(SUM((o - e) * (o - e) / e), 6) AS chi2,
       4 AS dof,
       SUM((o - e) * (o - e) / e) > {_CHI2_CRIT_4DF!r} AS dependent
FROM with_e
"""
