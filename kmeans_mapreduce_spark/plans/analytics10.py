"""Analytics pack 10: gaps-and-islands streaks, naive-seasonal
forecast backtesting, new-vs-returning revenue, and 2-D histograms.

Scale posture (shared): each query reduces the fact to its natural
grain in the first shuffle — (user, day) for streaks, (type, day) for
the backtest, (customer-order rank) for new-vs-returning, bounded 2-D
cells for the histogram — and runs all window/ratio arithmetic on the
reduced frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.plans.relational import _events, _t

_HIST2D_PRICE_W = 25000.0
_HIST2D_QTY_W = 10.0


def users_longest_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user, reported as
    the streak-length distribution — the classic gaps-and-islands
    problem (day_i − row_number is constant within an island), and the
    engagement-habit metric behind "N-day streak" product mechanics.

    Plan: distinct (user, day) grid in one shuffle, one row_number
    window per user, island groupBy, per-user max, then a ≤ O(max
    streak) histogram.  No self-joins, no calendar spine."""
    ev = _events(spark, sf_dir)
    ud = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day_i"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_i")
    islands = ud.select(
        "user_id",
        (F.col("day_i") - F.row_number().over(w)).alias("island"),
    )
    streaks = (
        islands.groupBy("user_id", "island")
        .agg(F.count("*").alias("len"))
        .groupBy("user_id")
        .agg(F.max("len").alias("longest"))
    )
    return (
        streaks.groupBy("longest")
        .agg(F.count("*").alias("n_users"))
        .orderBy("longest")
    )


STREAKS_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id,
         DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_i
  FROM events),
islands AS (
  SELECT user_id,
         day_i - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day_i)
           AS island
  FROM ud),
streaks AS (
  SELECT user_id, MAX(len) AS longest FROM (
    SELECT user_id, island, COUNT(*) AS len
    FROM islands GROUP BY 1, 2)
  GROUP BY 1)
SELECT longest, COUNT(*) AS n_users
FROM streaks GROUP BY 1 ORDER BY 1
"""


def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the naive seasonal forecaster (prediction = same
    weekday last week) on daily event counts: MAPE and bias per event
    type — the baseline every real forecasting model must beat, and
    the standard way to report whether it does.

    Plan: daily aggregate, lag(7) over the dense day index (gap ⇒ no
    prediction, not a stale one), error ratios averaged per type.
    Only days with an actual 7-days-prior observation score."""
    ev = _events(spark, sf_dir)
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
        .withColumn("day_i", F.datediff("day", F.lit("1970-01-01")))
    )
    w = Window.partitionBy("event_type").orderBy("day_i")
    scored = daily.select(
        "event_type",
        "n",
        F.when(
            F.lag("day_i", 7).over(w) == F.col("day_i") - 7,
            F.lag("n", 7).over(w),
        ).alias("pred"),
    ).where(F.col("pred").isNotNull())
    return (
        scored.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days_scored"),
            F.round(
                F.avg(F.abs(F.col("n") - F.col("pred")) / F.col("n")) * 100, 4
            ).alias("mape_pct"),
            F.round(
                F.avg((F.col("pred") - F.col("n")) / F.col("n")) * 100, 4
            ).alias("bias_pct"),
        )
        .orderBy("event_type")
    )


FORECAST_BACKTEST_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
         DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_i
  FROM events GROUP BY 1, 2, 4),
scored AS (
  SELECT event_type, n,
         CASE WHEN LAG(day_i, 7) OVER w = day_i - 7
              THEN LAG(n, 7) OVER w END AS pred
  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day_i))
SELECT event_type, COUNT(*) AS n_days_scored,
       ROUND(AVG(ABS(n - pred) * 1.0 / n) * 100, 4) AS mape_pct,
       ROUND(AVG((pred - n) * 1.0 / n) * 100, 4) AS bias_pct
FROM scored WHERE pred IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def orders_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue split into first-ever orders vs returning
    customers — the acquisition-vs-retention revenue mix every growth
    model starts from.

    Plan: one row_number window per customer (date, orderkey
    tiebreak) classifies each order exactly once; the monthly
    conditional aggregate follows in the same shuffle's output.  No
    join against a first-orders subset."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.to_date("o_orderdate"), "o_orderkey"
    )
    classed = o.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        (F.row_number().over(w) == 1).alias("is_first"),
        "o_totalprice",
    )
    return (
        classed.groupBy("month")
        .agg(
            F.round(
                F.sum(F.when(F.col("is_first"), F.col("o_totalprice"))), 2
            ).alias("new_revenue"),
            F.round(
                F.sum(F.when(~F.col("is_first"), F.col("o_totalprice"))), 2
            ).alias("returning_revenue"),
            F.count(F.when(F.col("is_first"), 1)).alias("new_orders"),
            F.count(F.when(~F.col("is_first"), 1)).alias("returning_orders"),
        )
        .orderBy("month")
    )


NEW_VS_RETURNING_SQL = """
WITH classed AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
           = 1 AS is_first,
         o_totalprice
  FROM orders)
SELECT month,
       ROUND(SUM(CASE WHEN is_first THEN o_totalprice END), 2)
         AS new_revenue,
       ROUND(SUM(CASE WHEN NOT is_first THEN o_totalprice END), 2)
         AS returning_revenue,
       COUNT(*) FILTER (WHERE is_first) AS new_orders,
       COUNT(*) FILTER (WHERE NOT is_first) AS returning_orders
FROM classed GROUP BY 1 ORDER BY 1
"""


def orders_hist2d_price_quantity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """2-D histogram (hexbin-style, rectangular cells) of order total
    vs total line quantity — the joint-distribution summary a scatter
    plot can't show at scale (10⁹ points overplot; bounded cells
    don't).

    Plan: one fact-fact join to per-order quantity (orderkey equi),
    then floor-division cell keys and a ≤ cells aggregate — output is
    bounded by the grid, independent of N."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    joined = o.join(per_order, o.o_orderkey == per_order.l_orderkey)
    return (
        joined.groupBy(
            F.floor(F.col("o_totalprice") / _HIST2D_PRICE_W)
            .cast("int")
            .alias("price_cell"),
            F.floor(F.col("qty") / _HIST2D_QTY_W).cast("int").alias("qty_cell"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy("price_cell", "qty_cell")
    )


def lineitem_returns_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate league table: per part brand, the share of line
    items (and of revenue) flagged returned (l_returnflag = 'R') —
    the quality/fit signal merchandising watches per assortment.

    Plan: broadcast part dim into the fact scan, ONE conditional
    aggregation to O(brands) rows; shares derive in the same agg (no
    second pass, no join back)."""
    from pyspark.sql.functions import broadcast

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ret = F.col("l_returnflag") == "R"
    return (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            F.count_if(ret).alias("n_returned"),
            F.round(F.count_if(ret) / F.count("*"), 6).alias("return_rate"),
            F.round(
                F.sum(F.when(ret, rev).otherwise(0.0)) / F.sum(rev), 6
            ).alias("returned_rev_share"),
        )
        .orderBy("p_brand")
    )


RETURNS_BY_BRAND_SQL = """
SELECT p.p_brand,
       COUNT(*) AS n_lines,
       COUNT(*) FILTER (WHERE l.l_returnflag = 'R') AS n_returned,
       ROUND(COUNT(*) FILTER (WHERE l.l_returnflag = 'R') * 1.0
             / COUNT(*), 6) AS return_rate,
       ROUND(SUM(CASE WHEN l.l_returnflag = 'R'
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0.0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 6)
         AS returned_rev_share
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1 ORDER BY 1
"""


def docs_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health scoreboard: per source, the share of documents
    whose exact text hash appears elsewhere in the corpus (cross- or
    intra-source) — the first number a crawl/source audit reports
    before any fuzzy dedup runs.

    Plan: one hash groupBy over the corpus (16-byte md5 keys, the
    dedup_exact shuffle), group sizes broadcast back by hash via a
    window-free join on the already-partitioned key, then an O(sources)
    aggregate."""
    d = _t(spark, sf_dir, "documents")
    hashed = d.select("doc_id", "source", F.md5("text").alias("h"))
    sizes = hashed.groupBy("h").agg(F.count("*").alias("grp"))
    return (
        hashed.join(sizes, "h")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_if(F.col("grp") > 1).alias("n_duped"),
            F.round(F.count_if(F.col("grp") > 1) / F.count("*"), 6).alias(
                "dup_rate"
            ),
        )
        .orderBy("source")
    )


DUP_RATE_SQL = """
WITH hashed AS (
  SELECT doc_id, source, md5(text) AS h FROM documents),
sizes AS (
  SELECT h, COUNT(*) AS grp FROM hashed GROUP BY 1)
SELECT hd.source,
       COUNT(*) AS n_docs,
       COUNT(*) FILTER (WHERE s.grp > 1) AS n_duped,
       ROUND(COUNT(*) FILTER (WHERE s.grp > 1) * 1.0 / COUNT(*), 6)
         AS dup_rate
FROM hashed hd JOIN sizes s ON hd.h = s.h
GROUP BY 1 ORDER BY 1
"""


def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via Spark 4's VARIANT type: parse each
    event's JSON props ONCE into a variant, extract typed fields with
    variant_get, aggregate per event type — the open-schema ingestion
    pattern that replaces per-path get_json_object string re-parsing
    (events_json_extract is the classic-API counterpart).

    At scale variant wins because the binary encoding parses the JSON
    a single time and every extraction is a cheap typed probe (and
    parquet writers can shred hot paths into columns); N string fields
    via get_json_object re-tokenize the text N times."""
    ev = _events(spark, sf_dir)
    parsed = ev.select(
        "event_type", F.parse_json("props").alias("v")
    ).select(
        "event_type", F.variant_get("v", "$.k", "int").alias("k")
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count_if(F.col("k").isNull()).alias("null_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


VARIANT_PROPS_SQL = """
WITH parsed AS (
  SELECT event_type, CAST(json_extract(props, '$.k') AS INT) AS k
  FROM events)
SELECT event_type, COUNT(*) AS n,
       COUNT(*) FILTER (WHERE k IS NULL) AS null_k,
       ROUND(AVG(k), 6) AS avg_k,
       MIN(k) AS min_k, MAX(k) AS max_k
FROM parsed GROUP BY 1 ORDER BY 1
"""


HIST2D_SQL = f"""
WITH per_order AS (
  SELECT l_orderkey, SUM(l_quantity) AS qty
  FROM lineitem GROUP BY 1)
SELECT CAST(FLOOR(o.o_totalprice / {_HIST2D_PRICE_W!r}) AS INT)
         AS price_cell,
       CAST(FLOOR(p.qty / {_HIST2D_QTY_W!r}) AS INT) AS qty_cell,
       COUNT(*) AS n
FROM orders o JOIN per_order p ON o.o_orderkey = p.l_orderkey
GROUP BY 1, 2 ORDER BY 1, 2
"""
