"""Analytics pack 8: duration/interval statistics and top-N+other
reporting — inter-purchase intervals, session durations, shipping
lead times, and brand share with an OTHER rollup.

Scale posture (shared): all four shuffle the fact once (user/customer
window or plain groupBy), then run percentile/share arithmetic on the
reduced frame.  Exact percentiles here are grouped (per type/priority
— bounded groups); the 100 TB swap to approx_percentile changes one
function name and is noted per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.plans.relational import _events, _t

_SESSION_GAP_US = 1800 * 1_000_000
_TOP_BRANDS = 5


def customers_repurchase_intervals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Inter-purchase interval distribution: days between a customer's
    consecutive orders, summarized as p25/p50/p75 and mean per order
    priority of the LATER order — the replenishment-cadence readout
    behind reorder nudges and churn windows.

    Plan: one window shuffle on custkey (lag with (date, orderkey)
    tiebreak), then grouped exact percentiles over the bounded
    priority groups (approx_percentile is the 100 TB swap)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.to_date("o_orderdate"), "o_orderkey"
    )
    gaps = (
        o.select(
            "o_orderpriority",
            F.datediff(
                F.to_date("o_orderdate"),
                F.lag(F.to_date("o_orderdate")).over(w),
            ).alias("gap_days"),
        )
        .where(F.col("gap_days").isNotNull())
    )
    return (
        gaps.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_gaps"),
            F.expr("percentile(gap_days, 0.25)").alias("p25"),
            F.expr("percentile(gap_days, 0.5)").alias("p50"),
            F.expr("percentile(gap_days, 0.75)").alias("p75"),
            F.round(F.avg("gap_days"), 4).alias("mean_days"),
        )
        .orderBy("o_orderpriority")
    )


REPURCHASE_SQL = """
WITH gaps AS (
  SELECT o_orderpriority,
         DATEDIFF('day',
                  LAG(CAST(o_orderdate AS DATE))
                    OVER (PARTITION BY o_custkey
                          ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
                  CAST(o_orderdate AS DATE)) AS gap_days
  FROM orders)
SELECT o_orderpriority, COUNT(*) AS n_gaps,
       quantile_cont(gap_days, 0.25) AS p25,
       quantile_cont(gap_days, 0.5) AS p50,
       quantile_cont(gap_days, 0.75) AS p75,
       ROUND(AVG(gap_days), 4) AS mean_days
FROM gaps WHERE gap_days IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def sessions_duration_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session duration distribution per event type (30-min-gap
    sessions, duration = last−first event in seconds; single-event
    sessions count as 0): p50/p90 + mean — the engagement-depth
    companion to sessions_bounce_rate.

    Plan: the sessionize window stack (one user shuffle), session
    spans via groupBy, grouped exact percentiles over the bounded
    type groups."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gap = us - F.lag(us).over(w)
    seq = ev.select(
        "user_id",
        "event_type",
        "event_id",
        us.alias("us"),
        F.when(gap.isNull() | (gap > _SESSION_GAP_US), 1)
        .otherwise(0)
        .alias("ns"),
    )
    wc = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = (
        seq.withColumn("sid", F.sum("ns").over(wc))
        .groupBy("user_id", "event_type", "sid")
        .agg(
            ((F.max("us") - F.min("us")) / 1_000_000.0).alias("dur_s")
        )
    )
    return (
        sess.groupBy("event_type")
        .agg(
            F.count("*").alias("n_sessions"),
            F.round(F.expr("percentile(dur_s, 0.5)"), 4).alias("p50_s"),
            F.round(F.expr("percentile(dur_s, 0.9)"), 4).alias("p90_s"),
            F.round(F.avg("dur_s"), 4).alias("mean_s"),
        )
        .orderBy("event_type")
    )


SESSION_DURATION_SQL = """
WITH seq AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
         CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                      > 1800 * 1000000
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, event_type, sid,
         (MAX(us) - MIN(us)) / 1000000.0 AS dur_s
  FROM (
    SELECT user_id, event_type, us,
           SUM(ns) OVER (PARTITION BY user_id, event_type
                         ORDER BY us, event_id
                         ROWS UNBOUNDED PRECEDING) AS sid
    FROM seq)
  GROUP BY 1, 2, 3)
SELECT event_type, COUNT(*) AS n_sessions,
       ROUND(quantile_cont(dur_s, 0.5), 4) AS p50_s,
       ROUND(quantile_cont(dur_s, 0.9), 4) AS p90_s,
       ROUND(AVG(dur_s), 4) AS mean_s
FROM sess GROUP BY 1 ORDER BY 1
"""


def lineitem_shipping_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping lead time (days from order to line shipment) per order
    priority: p50/p90 + share shipped within a week — the fulfillment
    SLA readout.

    Plan: one fact-fact equi-join (lineitem↔orders, both big: sort-
    merge/shuffled-hash, never broadcast) followed by a bounded-group
    aggregation; at 100 TB both sides pre-bucket on orderkey and the
    join is co-located (operators/bucketing.py)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    lead = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "o_orderpriority",
            F.datediff(
                F.to_date("l_shipdate"), F.to_date("o_orderdate")
            ).alias("lead_days"),
        )
    )
    return (
        lead.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.expr("percentile(lead_days, 0.5)"), 4).alias("p50_d"),
            F.round(F.expr("percentile(lead_days, 0.9)"), 4).alias("p90_d"),
            F.round(
                F.avg(F.when(F.col("lead_days") <= 7, 1.0).otherwise(0.0)), 6
            ).alias("within_week"),
        )
        .orderBy("o_orderpriority")
    )


LEAD_TIME_SQL = """
WITH lead AS (
  SELECT o.o_orderpriority,
         DATEDIFF('day', CAST(o.o_orderdate AS DATE),
                  CAST(l.l_shipdate AS DATE)) AS lead_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
SELECT o_orderpriority, COUNT(*) AS n_lines,
       ROUND(quantile_cont(lead_days, 0.5), 4) AS p50_d,
       ROUND(quantile_cont(lead_days, 0.9), 4) AS p90_d,
       ROUND(AVG(CASE WHEN lead_days <= 7 THEN 1.0 ELSE 0.0 END), 6)
         AS within_week
FROM lead GROUP BY 1 ORDER BY 1
"""


def parts_brand_share_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue share by part brand, top-5 named + everything else as
    'OTHER' — the long-tail rollup every share chart uses so the tail
    can't drown the legend.

    Plan: fact joined to the broadcast part dimension, aggregated to
    O(brands) rows; the top-N cut and OTHER fold happen on that tiny
    frame (rank ties break on brand).  Shares re-derive from the
    folded totals so OTHER's share is exact, not 1−sum-of-rounded."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("rev")
        )
    )
    w = Window.orderBy(F.desc("rev"), F.asc("p_brand"))
    folded = (
        rev.select(
            "p_brand", "rev", F.row_number().over(w).alias("rk")
        )
        .select(
            F.when(F.col("rk") <= _TOP_BRANDS, F.col("p_brand"))
            .otherwise(F.lit("OTHER"))
            .alias("brand"),
            "rev",
        )
        .groupBy("brand")
        .agg(F.sum("rev").alias("rev"), F.count("*").alias("n_brands"))
    )
    tot = Window.partitionBy()
    return (
        folded.select(
            "brand",
            "n_brands",
            F.round("rev", 2).alias("revenue"),
            F.round(F.col("rev") / F.sum("rev").over(tot), 6).alias("share"),
        )
        .orderBy(F.desc("revenue"), "brand")
    )


def events_hourly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity heatmap: ISO weekday × 4 six-hour day-parts event
    counts, pivoted wide (one row per weekday, one column per part) —
    the load-pattern matrix behind staffing/capacity views.

    Plan: one aggregation to the 7×4 grid, then a pivot with an
    EXPLICIT column list (no extra distinct-discovery job; output
    schema is static).  weekday()+1 matches DuckDB isodow, same
    portability note as events_dow_seasonality."""
    ev = _events(spark, sf_dir)
    grid = ev.groupBy(
        (F.weekday(F.to_date("ts")) + 1).alias("isodow"),
        F.floor(F.hour("ts") / 6).cast("int").alias("daypart"),
    ).agg(F.count("*").alias("n"))
    return (
        grid.groupBy("isodow")
        .pivot("daypart", [0, 1, 2, 3])
        .sum("n")
        .select(
            "isodow",
            F.coalesce(F.col("0"), F.lit(0)).alias("h00_06"),
            F.coalesce(F.col("1"), F.lit(0)).alias("h06_12"),
            F.coalesce(F.col("2"), F.lit(0)).alias("h12_18"),
            F.coalesce(F.col("3"), F.lit(0)).alias("h18_24"),
        )
        .orderBy("isodow")
    )


HOURLY_HEATMAP_SQL = """
WITH grid AS (
  SELECT isodow(CAST(ts AS DATE)) AS isodow,
         CAST(FLOOR(EXTRACT(hour FROM ts) / 6) AS INT) AS daypart,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2)
SELECT isodow,
       CAST(COALESCE(SUM(n) FILTER (WHERE daypart = 0), 0) AS BIGINT) AS h00_06,
       CAST(COALESCE(SUM(n) FILTER (WHERE daypart = 1), 0) AS BIGINT) AS h06_12,
       CAST(COALESCE(SUM(n) FILTER (WHERE daypart = 2), 0) AS BIGINT) AS h12_18,
       CAST(COALESCE(SUM(n) FILTER (WHERE daypart = 3), 0) AS BIGINT) AS h18_24
FROM grid GROUP BY 1 ORDER BY 1
"""


BRAND_SHARE_SQL = f"""
WITH rev AS (
  SELECT p.p_brand, SUM(l.l_extendedprice * (1 - l.l_discount)) AS rev
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1),
folded AS (
  SELECT CASE WHEN rk <= {_TOP_BRANDS} THEN p_brand ELSE 'OTHER' END AS brand,
         rev
  FROM (
    SELECT p_brand, rev,
           ROW_NUMBER() OVER (ORDER BY rev DESC, p_brand ASC) AS rk
    FROM rev)),
agg AS (
  SELECT brand, SUM(rev) AS rev, COUNT(*) AS n_brands
  FROM folded GROUP BY 1)
SELECT brand, n_brands,
       ROUND(rev, 2) AS revenue,
       ROUND(rev / SUM(rev) OVER (), 6) AS share
FROM agg ORDER BY revenue DESC, brand
"""
