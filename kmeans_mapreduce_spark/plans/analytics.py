"""Event-analytics pack: funnel conversion and retention cohorts.

The reference engine has no event surface at all (SURVEY §2.9/2.10:
windows and streaming absent); these are the two query shapes every
product-analytics workload runs on an events table, expressed
Spark-first and hash-checked against DuckDB oracles.

Scale posture (both queries):
  * every join is keyed on user_id — high cardinality, so the shuffles
    co-partition and no single reducer hot-spots;
  * per-step/per-cohort frames only ever SHRINK (funnel steps filter,
    cohorts aggregate to |users|), so AQE flips late joins to broadcast
    as the data narrows;
  * nothing is collected; final outputs are O(steps) / O(weeks²) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.plans.relational import _events


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel view → click → purchase: a user converts a
    step only with an event STRICTLY AFTER their previous step's first
    qualifying event (the ordering constraint is what separates a
    funnel from three independent counts).

    Plan shape: three min-aggregations chained by user_id equi-joins;
    each step's frame is a subset of the previous, so the join inputs
    monotonically shrink.  The final result is 3 rows."""
    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts")

    def first_after(event_type: str, prev: DataFrame | None, t_prev: str, t_out: str) -> DataFrame:
        step = ev.where(F.col("event_type") == event_type)
        if prev is not None:
            step = step.join(prev, "user_id").where(F.col("ts") > F.col(t_prev))
        return step.groupBy("user_id").agg(F.min("ts").alias(t_out))

    s1 = first_after("view", None, "", "t1")
    s2 = first_after("click", s1, "t1", "t2")
    s3 = first_after("purchase", s2, "t2", "t3")

    def count_step(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("step"), F.count("*").alias("users")
        )

    counts = (
        count_step(s1, "1_view")
        .unionAll(count_step(s2, "2_click"))
        .unionAll(count_step(s3, "3_purchase"))
    )
    base = counts.where(F.col("step") == "1_view").select(
        F.col("users").alias("_base")
    )
    return (
        counts.crossJoin(F.broadcast(base))
        .select(
            "step",
            "users",
            F.round(F.col("users") / F.col("_base"), 4).alias("conversion"),
        )
        .orderBy("step")
    )


FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
),
counts AS (
  SELECT '1_view' AS step, COUNT(*) AS users FROM s1
  UNION ALL SELECT '2_click', COUNT(*) FROM s2
  UNION ALL SELECT '3_purchase', COUNT(*) FROM s3
)
SELECT step, users,
       ROUND(CAST(users AS DOUBLE)
             / (SELECT users FROM counts WHERE step = '1_view'), 4) AS conversion
FROM counts ORDER BY step
"""


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-activity week,
    tracked by how many are active N weeks later, with retention as a
    fraction of the cohort's size.

    Plan shape: distinct (user, week) activity -> min-week cohort per
    user -> one join on user_id -> (cohort, offset) aggregation.  The
    cohort-size denominator joins back on cohort week — a tiny
    broadcast relation (O(weeks) rows)."""
    ev = _events(spark, sf_dir)
    activity = (
        ev.select("user_id", F.date_trunc("week", "ts").alias("wk")).distinct()
    )
    cohort = activity.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    joined = activity.join(cohort, "user_id").select(
        "user_id",
        "cohort_wk",
        (F.datediff(F.col("wk"), F.col("cohort_wk")) / 7).cast("int").alias(
            "week_offset"
        ),
    )
    grid = joined.groupBy("cohort_wk", "week_offset").agg(
        F.countDistinct("user_id").alias("active_users")
    )
    size = grid.where(F.col("week_offset") == 0).select(
        F.col("cohort_wk").alias("c"), F.col("active_users").alias("cohort_size")
    )
    return (
        grid.join(F.broadcast(size), grid.cohort_wk == size.c)
        .select(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "active_users",
            F.round(F.col("active_users") / F.col("cohort_size"), 4).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


RETENTION_SQL = """
WITH activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
),
cohort AS (
  SELECT user_id, MIN(wk) AS cohort_wk FROM activity GROUP BY 1
),
grid AS (
  SELECT c.cohort_wk,
         CAST(date_diff('day', c.cohort_wk, a.wk) / 7 AS INT) AS week_offset,
         COUNT(DISTINCT a.user_id) AS active_users
  FROM activity a JOIN cohort c USING (user_id)
  GROUP BY 1, 2
)
SELECT strftime(g.cohort_wk, '%Y-%m-%d') AS cohort_week,
       g.week_offset,
       g.active_users,
       ROUND(CAST(g.active_users AS DOUBLE) / s.active_users, 4) AS retention
FROM grid g
JOIN (SELECT cohort_wk, active_users FROM grid WHERE week_offset = 0) s
  ON g.cohort_wk = s.cohort_wk
ORDER BY cohort_week, week_offset
"""


def sketch_rollup_weekly_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: DAILY HLL sketches of distinct users,
    merged into WEEKLY distinct-user estimates via hll_union_agg —
    without ever rescanning the daily data.

    This is the 100 TB incremental-rollup architecture: day N's events
    are sketched once (fixed ~KB state per day, Datasketches-compatible
    binary), and any coarser rollup (week, month, arbitrary ad-hoc
    ranges) is a union of already-built sketches.  An exact
    COUNT(DISTINCT) over a year means reshuffling a year of raw ids;
    the sketch union reads 365 KB-sized blobs.

    Oracle shape: sketch binaries are engine-specific, so the checked
    output is the exact weekly distinct count plus the sketch estimate
    EXPRESSED AS an error-bound boolean (HLL++ lgk=12 → ~1.6% rsd;
    5% bound = ~3 sigma), same pattern as agg_approx_stats."""
    ev = _events(spark, sf_dir)
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"), F.date_trunc("week", "ts").alias("wk"))
        .agg(F.hll_sketch_agg("user_id").alias("sketch"))
    )
    weekly = daily.groupBy("wk").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"),
        F.count("*").alias("n_days"),
    )
    exact = ev.groupBy(F.date_trunc("week", "ts").alias("wk")).agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        weekly.join(exact, "wk")
        .select(
            F.date_format("wk", "yyyy-MM-dd").alias("week"),
            "n_days",
            "exact_users",
            (
                F.abs(F.col("est") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("estimate_within_5pct"),
        )
        .orderBy("week")
    )


SKETCH_ROLLUP_SQL = """
SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
       COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS estimate_within_5pct
FROM events
GROUP BY date_trunc('week', ts)
ORDER BY week
"""


def scd2_user_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: turn a change stream
    (each event sets its user's current value) into validity intervals
    [valid_from, valid_to) with an is_current flag — the historization
    step every warehouse dimension pipeline runs on CDC input.

    Plan shape: one window (lead over (user, event-time)) per user
    partition — high-cardinality key, single shuffle, no self-join (the
    naive interval build joins each row to its successor).  Restricted
    to user_id < 10 to keep the checked output small; the plan is
    row-count-independent."""
    ev = _events(spark, sf_dir).where(F.col("user_id") < 10)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select("user_id", "event_id", "value", "ts")
        .withColumn("valid_to_ts", F.lead("ts").over(w))
        .select(
            "user_id",
            "event_id",
            F.round("value", 4).alias("value"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
            F.date_format("valid_to_ts", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
            F.col("valid_to_ts").isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from", "event_id")
    )


SCD2_SQL = """
SELECT user_id, event_id, ROUND(value, 4) AS value,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '%Y-%m-%d %H:%M:%S') AS valid_to,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           AS is_current
FROM events
WHERE user_id < 10
ORDER BY user_id, valid_from, event_id
"""


# --- time-series gap filling (LOCF) -----------------------------------------

def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series per user with last-observation-carried-
    forward: generate each user's full hour spine between their first
    and last event, left-join the observed hourly averages, and fill
    gaps with the most recent prior observation (TimescaleDB
    time_bucket_gapfill + locf(), Spark-native).

    The time-series primitive dashboards and feature pipelines need the
    moment data is sparse (91% of user-hours here are gaps).

    Scale shape: the hourly pre-agg is partial+final on (user, hour);
    the spine is sequence()+explode off the per-user bounds — O(users)
    input rows generating O(users x span) output with NO shuffle of the
    raw events; the left join and the one LOCF window pass both key on
    user_id, so they co-partition with the pre-agg.  Raw events are
    touched exactly once."""
    ev = _events(spark, sf_dir).where(F.col("user_id") < 30)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.round(F.avg("value"), 4).alias("avg_value"))
    bounds = hourly.groupBy("user_id").agg(
        F.min("h").alias("mn"), F.max("h").alias("mx")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 hour"))).alias("h"),
    )
    j = spine.join(hourly, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "avg_value",
        F.last("avg_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("avg_value").isNull().alias("is_gap"),
    ).orderBy("user_id", "bucket")


GAPFILL_SQL = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h, ROUND(AVG(value), 4) AS avg_value
  FROM events WHERE user_id < 30 GROUP BY 1, 2),
b AS (SELECT user_id, MIN(h) AS mn, MAX(h) AS mx FROM hourly GROUP BY 1),
spine AS (SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
          FROM b),
j AS (SELECT s.user_id, s.h, hr.avg_value
      FROM spine s LEFT JOIN hourly hr USING (user_id, h))
SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket, avg_value,
       last_value(avg_value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       avg_value IS NULL AS is_gap
FROM j ORDER BY user_id, bucket
"""


# --- robust anomaly detection (median / MAD) ------------------------------

_MAD_K = 5.0


def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier report per event_type: events whose value sits
    more than 5 MADs from the type median (median absolute deviation —
    the robust spread measure that, unlike stddev, is not dragged by
    the outliers it is hunting).

    Two grouped exact-median passes (median(value), then
    median(|value - med|)) joined back to the events; output one audit
    row per type with the anomaly count and id checksum so the oracle
    verifies WHICH events are flagged.

    Scale shape: exact grouped median sorts within each event_type
    partition (spillable); two passes over the same shuffle key, then
    a broadcast of the 5-row (type, med, mad) frame back onto events —
    the flagging pass is map-only.  At 100 TB swap the exact medians
    for approx_percentile(0.5) (documented fast path; the exact form
    is the oracle-checkable one)."""
    ev = _events(spark, sf_dir).select("event_type", "event_id", "value")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    mad = (
        ev.join(med, "event_type")
        .groupBy("event_type")
        .agg(F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"))
    )
    flagged = (
        ev.join(med, "event_type")
        .join(mad, "event_type")
        .withColumn(
            "is_anomaly",
            F.abs(F.col("value") - F.col("med")) > _MAD_K * F.col("mad"),
        )
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.max("med"), 4).alias("median_value"),
            F.round(F.max("mad"), 4).alias("mad"),
            F.sum(F.col("is_anomaly").cast("long")).alias("n_anomalies"),
            F.sum(
                F.when(F.col("is_anomaly"), F.col("event_id")).otherwise(0)
            ).alias("anomaly_checksum"),
        )
        .orderBy("event_type")
    )


ANOMALY_MAD_SQL = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type),
mad AS (
  SELECT e.event_type, quantile_cont(abs(e.value - med.med), 0.5) AS mad
  FROM events e JOIN med ON e.event_type = med.event_type
  GROUP BY e.event_type),
flagged AS (
  SELECT e.event_type, e.event_id, med.med, mad.mad,
         abs(e.value - med.med) > {_MAD_K} * mad.mad AS is_anomaly
  FROM events e
  JOIN med ON e.event_type = med.event_type
  JOIN mad ON e.event_type = mad.event_type)
SELECT event_type,
       COUNT(*) AS n_events,
       ROUND(MAX(med), 4) AS median_value,
       ROUND(MAX(mad), 4) AS mad,
       CAST(SUM(CASE WHEN is_anomaly THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
       CAST(SUM(CASE WHEN is_anomaly THEN event_id ELSE 0 END) AS BIGINT) AS anomaly_checksum
FROM flagged GROUP BY event_type ORDER BY event_type
"""


# --- ANALYZE-style column statistics --------------------------------------

_STATS_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def table_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE-style per-column statistics for lineitem's measure
    columns: count / nulls / exact NDV / min / max / mean — the numbers
    a cost-based optimizer (or a data-quality monitor) keeps per column.

    ONE aggregation pass computes every column's stats side by side
    (partial-agg friendly: 6 scalar states per column), then a stack()
    unpivots the single result row into one row per column — the
    explode happens AFTER the agg, so the shuffle carries one partial
    state per partition, never N×columns rows (embedding_dim_stats'
    argument).  Exact NDV here because the oracle must hash-match;
    approx_count_distinct is the documented 100-TB swap."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    aggs = []
    for c in _STATS_COLS:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(F.col(c)).alias(f"{c}__ndv"),
            F.round(F.min(c), 4).alias(f"{c}__min"),
            F.round(F.max(c), 4).alias(f"{c}__max"),
            F.round(F.avg(c), 4).alias(f"{c}__mean"),
        ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__nulls, {c}__ndv, {c}__min, {c}__max, {c}__mean"
        for c in _STATS_COLS
    )
    return one.selectExpr(
        f"stack({len(_STATS_COLS)}, {stack_args}) AS "
        "(column, n, n_nulls, ndv, min, max, mean)"
    ).orderBy("column")


COLUMN_STATS_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", COUNT({c}) AS n,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv,
       ROUND(MIN({c}), 4) AS min, ROUND(MAX({c}), 4) AS max,
       ROUND(AVG({c}), 4) AS mean
FROM lineitem"""
    for c in _STATS_COLS
) + "\nORDER BY \"column\""
