"""Analytics pack 11: ABC (Pareto-class) customer classification and
price positioning vs brand median.

Scale posture: both queries aggregate the fact to entity grain first
(customers / parts); the cumulative-share window for ABC and the
median join for positioning run over those reduced frames only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.plans.relational import _t

_ABC_A = 0.80  # A: first 80% of cumulative revenue
_ABC_B = 0.95  # B: next 15%; C: the tail


def customers_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory-style classification of customers by revenue:
    class A holds the first 80% of cumulative revenue (highest
    spenders first), B the next 15%, C the tail — the Pareto cut
    behind tiered account management.

    A customer is classed by the cumulative share INCLUDING itself,
    with (revenue DESC, custkey) ordering so ties split
    deterministically.  Output: per class, customer count, revenue,
    revenue share.

    Plan: per-customer aggregate (one shuffle), ONE global cumulative
    window over O(customers) rows (the honest cost of an exact global
    Pareto cut — at extreme cardinality swap to approx quantiles of
    the revenue distribution), then a 3-row agg."""
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("rev")
    )
    w = Window.orderBy(F.desc("rev"), F.asc("o_custkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy()
    classed = per_cust.select(
        "rev",
        (F.sum("rev").over(w) / F.sum("rev").over(tot)).alias("cum_share"),
    ).select(
        "rev",
        F.when(F.col("cum_share") <= _ABC_A, "A")
        .when(F.col("cum_share") <= _ABC_B, "B")
        .otherwise("C")
        .alias("abc"),
    )
    return (
        classed.groupBy("abc")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("rev"), 2).alias("revenue"),
        )
        .withColumn(
            "rev_share",
            F.round(
                F.col("revenue") / F.sum("revenue").over(Window.partitionBy()),
                6,
            ),
        )
        .orderBy("abc")
    )


ABC_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey, SUM(o_totalprice) AS rev
  FROM orders GROUP BY 1),
classed AS (
  SELECT rev,
         CASE WHEN cum_share <= {_ABC_A!r} THEN 'A'
              WHEN cum_share <= {_ABC_B!r} THEN 'B'
              ELSE 'C' END AS abc
  FROM (
    SELECT rev,
           SUM(rev) OVER (ORDER BY rev DESC, o_custkey
                          ROWS UNBOUNDED PRECEDING)
             / SUM(rev) OVER () AS cum_share
    FROM per_cust)),
agg AS (
  SELECT abc, COUNT(*) AS n_customers, ROUND(SUM(rev), 2) AS revenue
  FROM classed GROUP BY 1)
SELECT abc, n_customers, revenue,
       ROUND(revenue / SUM(revenue) OVER (), 6) AS rev_share
FROM agg ORDER BY abc
"""


def parts_price_positioning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price positioning: how many parts sit ≥10% above (premium),
    within ±10% of (core), or ≥10% below (value) their brand's median
    retail price — the assortment-architecture readout.

    Plan: brand medians via one grouped exact-percentile aggregate
    (bounded groups), broadcast back onto the part dim, 3-way CASE,
    O(brands) output."""
    p = _t(spark, sf_dir, "part")
    med = p.groupBy("p_brand").agg(
        F.expr("percentile(p_retailprice, 0.5)").alias("med")
    )
    pos = (
        p.join(F.broadcast(med), "p_brand")
        .select(
            "p_brand",
            F.when(F.col("p_retailprice") >= F.col("med") * 1.10, "premium")
            .when(F.col("p_retailprice") <= F.col("med") * 0.90, "value")
            .otherwise("core")
            .alias("tier"),
        )
    )
    return (
        pos.groupBy("p_brand", "tier")
        .agg(F.count("*").alias("n_parts"))
        .orderBy("p_brand", "tier")
    )


PRICE_POSITIONING_SQL = """
WITH med AS (
  SELECT p_brand, quantile_cont(p_retailprice, 0.5) AS med
  FROM part GROUP BY 1)
SELECT p.p_brand,
       CASE WHEN p.p_retailprice >= m.med * 1.10 THEN 'premium'
            WHEN p.p_retailprice <= m.med * 0.90 THEN 'value'
            ELSE 'core' END AS tier,
       COUNT(*) AS n_parts
FROM part p JOIN med m ON p.p_brand = m.p_brand
GROUP BY 1, 2 ORDER BY 1, 2
"""
