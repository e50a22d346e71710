"""Analytics pack 9: market-basket co-occurrence (support/lift) and
funnel conversion latency.

Scale posture:
  * the basket pair generator self-joins WITHIN an order (equi-join
    on orderkey), so candidate volume is sum(basket_size²) — bounded
    by the ~4-line average basket, never corpus² (the same blocking
    argument as linkage/PMI);
  * conversion latency reduces events to one row per user (two
    conditional min-aggregates in a single pass) before any
    percentile math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.plans.relational import _events, _t

_BASKET_MIN_SUPPORT = 3  # pairs seen in fewer orders are noise


def parts_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket analysis on order line items: for every part
    BRAND pair co-occurring in ≥3 orders, the support and lift
    (lift > 1 ⇔ bought together more than independence predicts) —
    the co-purchase signal behind "frequently bought together".

    Brands (25 values) rather than raw parts keep the fixture's output
    stable; the plan is identical at part grain.  Pair generation is a
    self-join ON o_orderkey over the per-order DISTINCT brand list —
    candidates are per-basket pairs only.  Lift divides by broadcast
    per-brand order counts; ties in the report order break on the
    brand pair."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    basket = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n_orders = basket.select("l_orderkey").distinct().count()
    brand_orders = basket.groupBy("p_brand").agg(
        F.count("*").alias("n_orders_brand")
    )
    a = basket.select(
        F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand_a")
    )
    b = basket.select(
        F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand_b")
    )
    pairs = (
        a.join(b, "ok")
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_together"))
        .where(F.col("n_together") >= _BASKET_MIN_SUPPORT)
    )
    ca = brand_orders.select(
        F.col("p_brand").alias("brand_a"),
        F.col("n_orders_brand").alias("n_a"),
    )
    cb = brand_orders.select(
        F.col("p_brand").alias("brand_b"),
        F.col("n_orders_brand").alias("n_b"),
    )
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            "n_together",
            F.round(F.col("n_together") / F.lit(n_orders), 6).alias("support"),
            F.round(
                (F.col("n_together") * F.lit(n_orders))
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "brand_a", "brand_b")
    )


MARKET_BASKET_SQL = f"""
WITH basket AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM basket),
brand_orders AS (
  SELECT p_brand, COUNT(*) AS n_orders_brand FROM basket GROUP BY 1),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
         COUNT(*) AS n_together
  FROM basket a JOIN basket b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_BASKET_MIN_SUPPORT})
SELECT p.brand_a, p.brand_b, p.n_together,
       ROUND(p.n_together * 1.0 / n.n_orders, 6) AS support,
       ROUND((p.n_together * 1.0 * n.n_orders)
             / (ca.n_orders_brand * cb.n_orders_brand), 6) AS lift
FROM pairs p
CROSS JOIN n
JOIN brand_orders ca ON p.brand_a = ca.p_brand
JOIN brand_orders cb ON p.brand_b = cb.p_brand
ORDER BY lift DESC, brand_a, brand_b
"""


def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion latency: for users whose first 'view' precedes their
    first 'purchase', the view→purchase delay distribution (p25/p50/
    p90 in hours, plus converter counts) — the time-to-value readout
    next to events_funnel's conversion RATE.

    Plan: ONE conditional-min aggregation per user (no joins between
    event subsets), then exact percentiles over the single resulting
    group (approx_percentile is the 100 TB swap)."""
    ev = _events(spark, sf_dir)
    us = F.unix_micros("ts")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias(
            "first_purchase"
        ),
    )
    conv = per_user.where(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_view") < F.col("first_purchase"))
    ).select(
        (
            (F.col("first_purchase") - F.col("first_view"))
            / (3600.0 * 1_000_000)
        ).alias("hours")
    )
    return conv.agg(
        F.count("*").alias("n_converters"),
        F.round(F.expr("percentile(hours, 0.25)"), 4).alias("p25_h"),
        F.round(F.expr("percentile(hours, 0.5)"), 4).alias("p50_h"),
        F.round(F.expr("percentile(hours, 0.9)"), 4).alias("p90_h"),
        F.round(F.avg("hours"), 4).alias("mean_h"),
    )


CONVERSION_LATENCY_SQL = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
           AS first_view,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           AS first_purchase
  FROM events GROUP BY 1),
conv AS (
  SELECT (first_purchase - first_view) / (3600.0 * 1000000) AS hours
  FROM per_user
  WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
    AND first_view < first_purchase)
SELECT COUNT(*) AS n_converters,
       ROUND(quantile_cont(hours, 0.25), 4) AS p25_h,
       ROUND(quantile_cont(hours, 0.5), 4) AS p50_h,
       ROUND(quantile_cont(hours, 0.9), 4) AS p90_h,
       ROUND(AVG(hours), 4) AS mean_h
FROM conv
"""
