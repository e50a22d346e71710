"""Analytics pack 4: product-growth accounting — user lifecycle
(new/retained/resurrected/churned), engagement concentration (Gini),
RFM segmentation, DAU/MAU stickiness, and session bounce rate.

These are the canonical growth-dashboard queries over an events
table; none exist in the reference (numeric K-Means only, SURVEY §1).
All are expressed Spark-first with exact DuckDB oracles.

Scale posture (shared):
  * every query aggregates the fact table FIRST — to (user, week),
    (user,) or (user, day) grain — in one shuffle; all window logic
    runs over the aggregated frame (O(users × weeks) at most);
  * lifecycle needs NO dense calendar spine: churn events are derived
    from each active week's lead() gap (emit churn at w+1 when the
    next active week is not w+1), so the shuffle never carries
    absent-week rows;
  * the Gini query's global sort is over per-user totals (O(users)),
    not events, and the coefficient itself is a closed-form window
    sum (no pairwise |x_i - x_j| join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.plans.relational import _events, _t

_SESSION_GAP_US = 1800 * 1_000_000


def _user_weeks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (user_id, week_i) activity grid: week_i = epoch days
    div 7.  Fixed 7-day buckets anchored at 1970-01-01 (a Thursday) —
    week BOUNDARIES are a reporting choice; what matters here is that
    both engines bucket identically, and plain integer division is
    trivially portable where ISO week-of-year is not."""
    ev = _events(spark, sf_dir)
    return (
        ev.select(
            "user_id",
            (F.datediff(F.to_date("ts"), F.lit("1970-01-01")) / 7)
            .cast("long")
            .alias("week_i"),
        )
        .distinct()
    )


def events_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per week, how many users are NEW (first-ever
    activity), RETAINED (active this week and last), RESURRECTED
    (active this week, inactive last, not new) and CHURNED (active
    last week, inactive this) — the four numbers every growth report
    opens with.

    Plan: distinct (user, week) grid (one shuffle), one lag/lead
    window per user, then a union of the three active classes with the
    churn stream derived from lead() gaps — churn at week w+1 exists
    iff the user was active in w and not w+1.  No calendar spine, no
    self-join; everything after the grid is O(users × active weeks)."""
    uw = _user_weeks(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("week_i")
    lagged = uw.select(
        "user_id",
        "week_i",
        F.lag("week_i").over(w).alias("prev_w"),
        F.lead("week_i").over(w).alias("next_w"),
        F.max("week_i").over(Window.partitionBy()).alias("last_week"),
    )
    status = lagged.select(
        "week_i",
        F.when(F.col("prev_w").isNull(), "new")
        .when(F.col("prev_w") == F.col("week_i") - 1, "retained")
        .otherwise("resurrected")
        .alias("status"),
        "next_w",
        "last_week",
    )
    active = status.select("week_i", "status")
    churned = status.where(
        (F.col("week_i") < F.col("last_week"))
        & (F.col("next_w").isNull() | (F.col("next_w") > F.col("week_i") + 1))
    ).select((F.col("week_i") + 1).alias("week_i"), F.lit("churned").alias("status"))
    return (
        active.unionByName(churned)
        .groupBy("week_i", "status")
        .agg(F.count("*").alias("n_users"))
        .orderBy("week_i", "status")
    )


LIFECYCLE_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) / 7)
              AS BIGINT) AS week_i
  FROM events),
lagged AS (
  SELECT user_id, week_i,
         LAG(week_i) OVER w AS prev_w,
         LEAD(week_i) OVER w AS next_w,
         MAX(week_i) OVER () AS last_week
  FROM uw WINDOW w AS (PARTITION BY user_id ORDER BY week_i)),
active AS (
  SELECT week_i,
         CASE WHEN prev_w IS NULL THEN 'new'
              WHEN prev_w = week_i - 1 THEN 'retained'
              ELSE 'resurrected' END AS status
  FROM lagged),
churned AS (
  SELECT week_i + 1 AS week_i, 'churned' AS status
  FROM lagged
  WHERE week_i < last_week
    AND (next_w IS NULL OR next_w > week_i + 1))
SELECT week_i, status, COUNT(*) AS n_users
FROM (SELECT * FROM active UNION ALL SELECT * FROM churned)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def events_engagement_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user event volume, per event type — the
    concentration screen ("do 1% of users generate 90% of the load?").

    Plan: aggregate to per-user counts (one shuffle), then the
    closed-form rank formulation over the O(users) frame:
    G = (2 * sum(rank_i * x_i) / (n * sum(x))) - (n + 1) / n
    with rank by (count, user_id) for a deterministic total order.
    No |x_i - x_j| pairwise join anywhere."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count("*").alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("x", "user_id")
    ranked = per_user.select(
        "event_type", "x", F.row_number().over(w).alias("rnk")
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count("*").alias("n_users"),
            F.round(
                (2 * F.sum(F.col("rnk") * F.col("x")))
                / (F.count("*") * F.sum("x"))
                - (F.count("*") + 1) / F.count("*"),
                6,
            ).alias("gini"),
        )
        .orderBy("event_type")
    )


GINI_SQL = """
WITH per_user AS (
  SELECT event_type, user_id, COUNT(*) AS x
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT event_type, x,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY x, user_id) AS rnk
  FROM per_user)
SELECT event_type, COUNT(*) AS n_users,
       ROUND(2.0 * SUM(rnk * x) / (COUNT(*) * SUM(x))
             - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
FROM ranked GROUP BY event_type ORDER BY event_type
"""


def customers_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quintile-score each customer on Recency (days
    since last order), Frequency (order count) and Monetary (total
    spend), concatenate into a 'R-F-M' segment, and report segment
    sizes — the classic CRM partitioning.

    Plan: one groupBy to per-customer (R, F, M), three ntile windows
    over that O(customers) frame (deterministic tiebreak on custkey),
    one final tiny agg.  Recency quintile 5 = most recent (ntile over
    recency DESC), matching the marketing convention."""
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_day"),
        F.count("*").alias("freq"),
        F.sum("o_totalprice").alias("monetary"),
    )
    anchor = per_cust.agg(F.max("last_day")).collect()[0][0]
    scored = per_cust.select(
        "o_custkey",
        F.datediff(F.lit(anchor), F.col("last_day")).alias("rec_days"),
        "freq",
        "monetary",
    )
    wr = Window.orderBy(F.desc("rec_days"), "o_custkey")
    wf = Window.orderBy("freq", "o_custkey")
    wm = Window.orderBy("monetary", "o_custkey")
    seg = scored.select(
        F.ntile(5).over(wr).alias("r"),
        F.ntile(5).over(wf).alias("f"),
        F.ntile(5).over(wm).alias("m"),
    )
    return (
        seg.select(
            F.concat_ws("-", "r", "f", "m").alias("segment"), "r", "f", "m"
        )
        .groupBy("segment", "r", "f", "m")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("segment")
    )


RFM_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         MAX(CAST(o_orderdate AS DATE)) AS last_day,
         COUNT(*) AS freq,
         SUM(o_totalprice) AS monetary
  FROM orders GROUP BY 1),
scored AS (
  SELECT o_custkey,
         DATEDIFF('day', last_day, (SELECT MAX(last_day) FROM per_cust))
           AS rec_days,
         freq, monetary
  FROM per_cust),
seg AS (
  SELECT NTILE(5) OVER (ORDER BY rec_days DESC, o_custkey) AS r,
         NTILE(5) OVER (ORDER BY freq, o_custkey) AS f,
         NTILE(5) OVER (ORDER BY monetary, o_custkey) AS m
  FROM scored)
SELECT CONCAT(r, '-', f, '-', m) AS segment, r, f, m,
       COUNT(*) AS n_customers
FROM seg GROUP BY 1, 2, 3, 4 ORDER BY segment
"""


def events_stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per calendar month: average daily active
    users divided by monthly active users — the engagement-quality
    ratio (1.0 = every monthly user shows up every day).

    Plan: distinct (user, day) in one shuffle, then two aggregations
    of that grid (per-day counts -> per-month average; per-month
    distinct users), joined on the O(months) frame.  The expensive
    distinct happens ONCE at day grain; MAU reuses it (a user active
    in a month is active on some day)."""
    ev = _events(spark, sf_dir)
    ud = ev.select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.date_format("ts", "yyyy-MM").alias("month"),
    ).distinct()
    dau = (
        ud.groupBy("month", "day")
        .agg(F.count("*").alias("dau"))
        .groupBy("month")
        .agg(F.avg("dau").alias("avg_dau"), F.count("*").alias("n_days"))
    )
    mau = ud.groupBy("month").agg(
        F.count_distinct("user_id").alias("mau")
    )
    return (
        dau.join(mau, "month")
        .select(
            "month",
            "n_days",
            F.round("avg_dau", 4).alias("avg_dau"),
            "mau",
            F.round(F.col("avg_dau") / F.col("mau"), 6).alias("stickiness"),
        )
        .orderBy("month")
    )


STICKINESS_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
         strftime(ts, '%Y-%m') AS month
  FROM events),
dau AS (
  SELECT month, AVG(dau) AS avg_dau, COUNT(*) AS n_days FROM (
    SELECT month, day, COUNT(*) AS dau FROM ud GROUP BY 1, 2)
  GROUP BY 1),
mau AS (
  SELECT month, COUNT(DISTINCT user_id) AS mau FROM ud GROUP BY 1)
SELECT d.month, d.n_days, ROUND(d.avg_dau, 4) AS avg_dau, m.mau,
       ROUND(d.avg_dau / m.mau, 6) AS stickiness
FROM dau d JOIN mau m ON d.month = m.month
ORDER BY d.month
"""


def sessions_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate per event type: share of sessions (30-min-gap rule,
    as events_sessionize) containing exactly one event.

    Plan: the sessionize window stack (one shuffle on user), session
    sizes via groupBy, then a conditional agg over O(sessions) rows."""
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
        .agg(F.count("*").alias("n_events"))
    )
    return (
        sess.groupBy("event_type")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).alias(
                "n_bounced"
            ),
        )
        .select(
            "event_type",
            "n_sessions",
            "n_bounced",
            F.round(F.col("n_bounced") / F.col("n_sessions"), 6).alias(
                "bounce_rate"
            ),
        )
        .orderBy("event_type")
    )


BOUNCE_SQL = """
WITH seq AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
         CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                      > 1800 * 1000000
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, event_type, sid, COUNT(*) AS n_events FROM (
    SELECT user_id, event_type, us,
           SUM(ns) OVER (PARTITION BY user_id, event_type
                         ORDER BY us, event_id
                         ROWS UNBOUNDED PRECEDING) AS sid
    FROM seq)
  GROUP BY 1, 2, 3)
SELECT event_type,
       COUNT(*) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounced,
       ROUND(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS bounce_rate
FROM sess GROUP BY 1 ORDER BY 1
"""
