"""Analytics pack 5: market-structure queries over the TPC-H star —
supplier concentration (HHI), order-priority mix shift, and nation
trade balance.

Scale posture (shared): every query reduces the lineitem/orders fact
to a grouped frame in its FIRST shuffle; dimensions (supplier,
customer, nation — thousands of rows) broadcast into the fact scan,
so no query shuffles a dimension or carries fact-grain rows past the
first aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from kmeans_mapreduce_spark.plans.relational import _t

def _rev():
    # built lazily: a module-level Column would need an active
    # SparkContext at import time (breaks test collection)
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")


def suppliers_nation_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman index of supplier revenue concentration
    per nation: sum of squared revenue shares (1.0 = monopoly, 1/n =
    perfectly even across n suppliers) — the market-concentration
    screen, applied to the supply base.

    Plan: fact aggregated to (nation, supplier) revenue in one shuffle
    (supplier + nation broadcast into the scan), then the share/HHI
    arithmetic runs over O(suppliers) rows via one window total per
    nation."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    per_sup = (
        li.join(broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name", "s_suppkey")
        .agg(F.sum(_rev()).alias("rev"))
    )
    w = Window.partitionBy("n_name")
    shared = per_sup.select(
        "n_name", (F.col("rev") / F.sum("rev").over(w)).alias("share")
    )
    return (
        shared.groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum(F.col("share") ** 2), 6).alias("hhi"),
        )
        .orderBy("n_name")
    )


HHI_SQL = """
WITH per_sup AS (
  SELECT n.n_name, s.s_suppkey,
         SUM(l.l_extendedprice * (1 - l.l_discount)) AS rev
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1, 2),
shared AS (
  SELECT n_name, rev / SUM(rev) OVER (PARTITION BY n_name) AS share
  FROM per_sup)
SELECT n_name, COUNT(*) AS n_suppliers,
       ROUND(SUM(share * share), 6) AS hhi
FROM shared GROUP BY 1 ORDER BY 1
"""


def orders_priority_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority composition per quarter, with the share change
    vs the previous quarter — the mix-shift report that separates
    "demand grew" from "demand composition moved".

    Plan: one aggregation to (quarter, priority) counts, then shares
    via a window total and the shift via lag over the O(quarters ×
    priorities) frame.  Quarter gaps yield NULL shift (no fake
    movement), same guard as orders_mom_growth."""
    o = _t(spark, sf_dir, "orders")
    q = F.concat_ws(
        "-",
        F.year("o_orderdate"),
        F.quarter("o_orderdate"),
    ).alias("yq")
    qi = (F.year("o_orderdate") * 4 + F.quarter("o_orderdate") - 1).alias(
        "q_i"
    )
    cells = o.groupBy(q, qi, "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    wt = Window.partitionBy("q_i")
    wl = Window.partitionBy("o_orderpriority").orderBy("q_i")
    shared = cells.select(
        "yq",
        "q_i",
        "o_orderpriority",
        "n",
        (F.col("n") / F.sum("n").over(wt)).alias("share"),
    )
    out = shared.select(
        "yq",
        "o_orderpriority",
        "n",
        F.round("share", 6).alias("share"),
        F.round(
            F.when(
                F.lag("q_i").over(wl) == F.col("q_i") - 1,
                F.col("share") - F.lag("share").over(wl),
            ),
            6,
        ).alias("share_shift"),
    )
    return out.orderBy("yq", "o_orderpriority")


PRIORITY_MIX_SQL = """
WITH cells AS (
  SELECT CONCAT(YEAR(o_orderdate), '-', QUARTER(o_orderdate)) AS yq,
         YEAR(o_orderdate) * 4 + QUARTER(o_orderdate) - 1 AS q_i,
         o_orderpriority, COUNT(*) AS n
  FROM orders GROUP BY 1, 2, 3),
shared AS (
  SELECT yq, q_i, o_orderpriority, n,
         n * 1.0 / SUM(n) OVER (PARTITION BY q_i) AS share
  FROM cells)
SELECT yq, o_orderpriority, n,
       ROUND(share, 6) AS share,
       ROUND(CASE WHEN LAG(q_i) OVER w = q_i - 1
                  THEN share - LAG(share) OVER w END, 6) AS share_shift
FROM shared
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY q_i)
ORDER BY yq, o_orderpriority
"""


def nations_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation supply/demand balance: revenue SUPPLIED by the
    nation's suppliers vs revenue BOUGHT by its customers, and the
    net — the two-sided exposure readout for a marketplace/economy.

    Plan: TWO independent fact aggregations (supply side keyed via
    l_suppkey→supplier, demand side via orders→customer), each one
    shuffle with broadcast dimensions, then a full-outer merge of the
    two O(nations) frames.  No single plan carries both joins at fact
    grain."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    sup = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    supplied = (
        li.join(broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(_rev()).alias("supplied"))
    )
    bought = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(cust), o.o_custkey == cust.c_custkey)
        .join(broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(_rev()).alias("bought"))
    )
    return (
        supplied.join(bought, "n_name", "full_outer")
        .select(
            "n_name",
            F.round(F.coalesce("supplied", F.lit(0.0)), 2).alias("supplied"),
            F.round(F.coalesce("bought", F.lit(0.0)), 2).alias("bought"),
            F.round(
                F.coalesce("supplied", F.lit(0.0))
                - F.coalesce("bought", F.lit(0.0)),
                2,
            ).alias("net"),
        )
        .orderBy("n_name")
    )


_QSK_WIDTH = 20.0
_QSK_BUCKETS = 25  # fixed edges over [0, 500); >=500 clamps into the last


def sketch_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-quantile architecture: DAILY fixed-bucket histogram
    sketches of event value, merged into WEEKLY quantile estimates —
    the companion to sketch_rollup_weekly_users (HLL) for the quantile
    case.  percentile_approx partials can't be re-merged across
    pre-aggregated days; fixed-edge histograms merge by adding counts,
    so the weekly rollup never rescans raw events.

    Plan: agg 1 to (type, day, bucket) counts — O(days × types ×
    buckets) rows, this is the persisted daily sketch; agg 2 sums
    counts to week grain; the p50/p90 estimates are cumulative-window
    interpolation over the 25-bucket frames.  Estimation error is
    bounded by the bucket width (pinned in tests vs the exact
    quantile)."""
    from kmeans_mapreduce_spark.plans.relational import _events

    ev = _events(spark, sf_dir)
    bucket = F.least(
        F.floor(F.col("value") / _QSK_WIDTH).cast("long"),
        F.lit(_QSK_BUCKETS - 1),
    ).alias("bucket")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day"), bucket
    ).agg(F.count("*").alias("cnt"))
    weekly = daily.groupBy(
        "event_type",
        (F.datediff("day", F.lit("1970-01-01")) / 7)
        .cast("long")
        .alias("week_i"),
        "bucket",
    ).agg(F.sum("cnt").alias("cnt"))
    w = Window.partitionBy("event_type", "week_i").orderBy("bucket")
    cum = weekly.select(
        "event_type",
        "week_i",
        "bucket",
        "cnt",
        F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum"
        ),
        F.sum("cnt").over(
            Window.partitionBy("event_type", "week_i")
        ).alias("total"),
    )

    def est(q: float):
        target = F.col("total") * q
        hit = (F.col("cum") >= target) & (
            (F.col("cum") - F.col("cnt")) < target
        )
        frac = (target - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
        val = (F.col("bucket") + frac) * _QSK_WIDTH
        return F.min(F.when(hit, F.round(val, 4)))

    return (
        cum.groupBy("event_type", "week_i")
        .agg(
            F.max("total").alias("n_events"),
            est(0.5).alias("p50_est"),
            est(0.9).alias("p90_est"),
        )
        .orderBy("event_type", "week_i")
    )


QUANTILE_ROLLUP_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         LEAST(CAST(FLOOR(value / {_QSK_WIDTH}) AS BIGINT),
               {_QSK_BUCKETS - 1}) AS bucket,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2, 3),
weekly AS (
  SELECT event_type,
         CAST(FLOOR(DATEDIFF('day', DATE '1970-01-01', day) / 7) AS BIGINT)
           AS week_i,
         bucket, SUM(cnt) AS cnt
  FROM daily GROUP BY 1, 2, 3),
cum AS (
  SELECT event_type, week_i, bucket, cnt,
         SUM(cnt) OVER (PARTITION BY event_type, week_i ORDER BY bucket
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type, week_i) AS total
  FROM weekly)
SELECT event_type, week_i,
       CAST(MAX(total) AS BIGINT) AS n_events,
       MIN(CASE WHEN cum >= total * 0.5 AND cum - cnt < total * 0.5
                THEN ROUND((bucket + (total * 0.5 - (cum - cnt)) / cnt)
                           * {_QSK_WIDTH}, 4) END) AS p50_est,
       MIN(CASE WHEN cum >= total * 0.9 AND cum - cnt < total * 0.9
                THEN ROUND((bucket + (total * 0.9 - (cum - cnt)) / cnt)
                           * {_QSK_WIDTH}, 4) END) AS p90_est
FROM cum GROUP BY 1, 2 ORDER BY 1, 2
"""


TRADE_BALANCE_SQL = """
WITH supplied AS (
  SELECT n.n_name, SUM(l.l_extendedprice * (1 - l.l_discount)) AS supplied
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1),
bought AS (
  SELECT n.n_name, SUM(l.l_extendedprice * (1 - l.l_discount)) AS bought
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1)
SELECT COALESCE(s.n_name, b.n_name) AS n_name,
       ROUND(COALESCE(s.supplied, 0), 2) AS supplied,
       ROUND(COALESCE(b.bought, 0), 2) AS bought,
       ROUND(COALESCE(s.supplied, 0) - COALESCE(b.bought, 0), 2) AS net
FROM supplied s FULL OUTER JOIN bought b ON s.n_name = b.n_name
ORDER BY 1
"""
