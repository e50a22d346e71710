"""Relational coverage extensions — exact percentiles/statistics,
date/time functions, EXISTS / scalar subqueries, window value
functions, RANGE frames, multiset set-ops (EXCEPT/INTERSECT ALL),
conditional expressions, and array explode/top-k.

The reference engine has none of this surface (SURVEY §2.4-2.9 lists
every category as absent); these queries round out the inventory with
Spark built-ins, each hash-checked against a DuckDB oracle.

Scale posture per query is in its docstring; common themes match
relational.py: partial+final aggregation, high-cardinality window
partitions, pushdown-friendly filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions import text as TXT
from kmeans_mapreduce_spark.plans.pipeline_queries import _BLANK, _TOKS_ALL


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- exact percentiles & statistical aggregates ----------------------------

def agg_percentiles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``) + sample stddev + Pearson correlation, per
    returnflag.

    Exact percentiles need the full value multiset per group — Spark
    runs this as a sort-based aggregation within each of the 3 groups.
    At 100 TB you'd reach for approx_percentile (see agg_approx_stats,
    which carries GK sketches instead); this query is the exact-answer
    path and the oracle anchor for those sketches' error-bound tests."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5D)"), 4).alias("median_qty"),
            F.round(F.expr("percentile(l_extendedprice, 0.25D)"), 4).alias("p25_price"),
            F.round(F.expr("percentile(l_extendedprice, 0.75D)"), 4).alias("p75_price"),
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("std_price"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
            F.count("*").alias("n"),
        )
    )


PERCENTILES_SQL = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
       ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
       ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price,
       ROUND(stddev_samp(l_extendedprice), 2) AS std_price,
       ROUND(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


# --- date/time function family ---------------------------------------------

def date_orders_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function sweep: year/quarter/month extraction, date_trunc,
    datediff — orders per (year, quarter) with revenue and order-age
    stats.  All per-row date arithmetic inside codegen; one
    low-cardinality agg shuffle (≤ ~16 groups regardless of N)."""
    o = _t(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    return (
        o.select(
            F.year(od).alias("yr"),
            F.quarter(od).alias("qtr"),
            F.date_format(F.date_trunc("quarter", od), "yyyy-MM-dd").alias("qtr_start"),
            F.datediff(F.lit("1998-12-31").cast("date"), od).alias("age_days"),
            F.col("o_totalprice"),
        )
        .groupBy("yr", "qtr", "qtr_start")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.round(F.avg("age_days"), 2).alias("avg_age_days"),
            F.min("age_days").alias("min_age_days"),
            F.max("age_days").alias("max_age_days"),
        )
    )


DATE_SEASONALITY_SQL = """
SELECT year(o_orderdate) AS yr,
       quarter(o_orderdate) AS qtr,
       strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS qtr_start,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total,
       ROUND(AVG(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')), 2) AS avg_age_days,
       MIN(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')) AS min_age_days,
       MAX(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')) AS max_age_days
FROM orders GROUP BY 1, 2, 3
"""


# --- subqueries -------------------------------------------------------------

def subq_exists_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the SQL front-end: brands
    whose parts ship in bulk (quantity ≥ 45) but never as returns.

    Catalyst decorrelates both predicates to left-semi / left-anti hash
    joins on l_partkey — the EXISTS never executes per-row.  Both semi
    and anti probe sides carry only the join key across the exchange.

    DataFrames bind as SQL parameters ({part}/{lineitem}) rather than
    temp views: no session-catalog mutation, so two sf_dirs queried in
    one session can never silently read each other's data."""
    return spark.sql(
        """
        SELECT p_brand, COUNT(*) AS n_parts
        FROM {part} p
        WHERE EXISTS (SELECT 1 FROM {lineitem} l
                      WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45)
          AND NOT EXISTS (SELECT 1 FROM {lineitem} l
                          WHERE l.l_partkey = p.p_partkey
                            AND l.l_returnflag = 'R' AND l.l_quantity >= 45)
        GROUP BY p_brand
        """,
        part=_t(spark, sf_dir, "part"),
        lineitem=_t(spark, sf_dir, "lineitem"),
    )


SUBQ_EXISTS_SQL = """
SELECT p_brand, COUNT(*) AS n_parts
FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45)
  AND NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey
                    AND l.l_returnflag = 'R' AND l.l_quantity >= 45)
GROUP BY p_brand
"""


def subq_scalar_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: orders above 1.5× the global mean
    price, counted per priority.  The inner AVG runs once and broadcasts
    as a literal into the filter — one extra tiny job, no join."""
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_big,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM {orders}
        WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM {orders})
        GROUP BY o_orderpriority
        """,
        orders=_t(spark, sf_dir, "orders"),
    )


SUBQ_SCALAR_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_big,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
GROUP BY o_orderpriority
"""


# --- window value functions & RANGE frames ----------------------------------

def window_value_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value + percent_rank / cume_dist
    per customer order history.  Frames are spelled out (ROWS) so both
    engines agree; ordering is (date, key) — unique, so rank functions
    are deterministic.  Partitioned by o_custkey: ~N/|customers| rows
    per window state, no global sort."""
    o = _t(spark, sf_dir, "orders")
    run = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    full = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    rank_w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(run).alias("first_key"),
        F.last("o_orderkey").over(full).alias("last_key"),
        # coalesce: single-order customers get NULL from nth_value; a typed
        # sentinel keeps the column integral through every comparator
        # (pandas turns a nullable int column into float64).
        F.coalesce(F.nth_value("o_orderkey", 2).over(full), F.lit(-1)).alias("second_key"),
        F.round(F.percent_rank().over(rank_w), 6).alias("pr"),
        F.round(F.cume_dist().over(rank_w), 6).alias("cd"),
    )


WINDOW_VALUE_SQL = """
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_key,
       last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key,
       COALESCE(nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), -1) AS second_key,
       ROUND(percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 6) AS pr,
       ROUND(cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 6) AS cd
FROM orders
"""


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a numeric ordering: per customer, total price of
    orders whose key lies within 100 of the current one (value-based
    frame, not row-count-based — frame edges follow the ORDER BY value).
    Partitioned by customer: no single-partition window bottleneck."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey").rangeBetween(-100, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("nearby_total"),
        F.count("*").over(w).alias("nearby_n"),
    )


WINDOW_RANGE_SQL = """
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
           RANGE BETWEEN 100 PRECEDING AND CURRENT ROW), 2) AS nearby_total,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
           RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS nearby_n
FROM orders
"""


# --- multiset set operations -------------------------------------------------

def set_multiset_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL + INTERSECT ALL (bag semantics — the plain EXCEPT /
    INTERSECT queries in relational.py are set-semantic): priority
    multiset of 1995-97 orders vs the 1998 multiset.  except_all keeps
    per-value surplus counts; intersect_all keeps min(count_a, count_b).
    Spark plans both as aggregate+generate over counted rows — one
    shuffle each, never a row-by-row anti join."""
    o = _t(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderdate") < F.lit("1998-01-01")).select("o_orderpriority")
    b = o.where(F.col("o_orderdate") >= F.lit("1998-01-01")).select("o_orderpriority")
    ex = (
        a.exceptAll(b)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .withColumn("op", F.lit("except_all"))
    )
    it = (
        a.intersectAll(b)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .withColumn("op", F.lit("intersect_all"))
    )
    return ex.unionByName(it)


SET_MULTISET_SQL = """
WITH a AS (SELECT o_orderpriority FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
     b AS (SELECT o_orderpriority FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'),
     ex AS (SELECT o_orderpriority FROM a EXCEPT ALL SELECT o_orderpriority FROM b),
     it AS (SELECT o_orderpriority FROM a INTERSECT ALL SELECT o_orderpriority FROM b)
SELECT o_orderpriority, COUNT(*) AS n, 'except_all' AS op FROM ex GROUP BY 1
UNION ALL
SELECT o_orderpriority, COUNT(*) AS n, 'intersect_all' AS op FROM it GROUP BY 1
"""


# --- conditional expressions --------------------------------------------------

def case_coalesce_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-expression family: CASE WHEN price bands, NULLIF +
    COALESCE status normalization.  Pure per-row codegen + one tiny agg."""
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    status_adj = F.coalesce(
        F.expr("nullif(o_orderstatus, 'O')"), F.lit("OPEN")
    )
    return (
        o.select(bucket.alias("bucket"), status_adj.alias("status_adj"), "o_totalprice")
        .groupBy("bucket", "status_adj")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


CASE_COALESCE_SQL = """
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 200000 THEN 'medium'
            ELSE 'large' END AS bucket,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_adj,
       COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY 1, 2
"""


# --- array explode / lateral ---------------------------------------------------

def array_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (lateral fan-out) + global deterministic top-20: most
    frequent ≥4-char tokens across the corpus.  The explode fans out
    inside the scan stage (no materialized intermediate); the agg is
    partial+final; the top-20 is TakeOrderedAndProject (per-partition
    heap, driver merge of 20-row heads — no global sort)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        d.select(F.explode(TXT.tokens("text")).alias("tok"))
        .where(F.length("tok") >= 4)
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(20)
    )


ARRAY_TOP_TOKENS_SQL = f"""
SELECT tok, COUNT(*) AS n FROM (
  SELECT unnest({_TOKS_ALL}) AS tok FROM documents WHERE NOT ({_BLANK}))
WHERE length(tok) >= 4
GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 20
"""
