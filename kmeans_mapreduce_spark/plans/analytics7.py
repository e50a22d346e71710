"""Analytics pack 7: sequence/path and cohort-value queries — top
event paths, cohort LTV accumulation, and time-series peak detection.

Scale posture (shared): the path and LTV queries shuffle the events
fact ONCE on user_id (the sequence windows), then aggregate to
O(paths) / O(cohorts × offsets) rows; peak detection runs entirely on
the daily aggregate (O(days × types)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.plans.relational import _events

_PATH_LEN = 3
_TOP_PATHS = 10
_PEAK_MIN_RATIO = 1.25  # a peak must exceed both neighbors by 25%


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most common 3-step event-type paths (per-user sliding
    trigrams over the event sequence) — the path-analysis query behind
    "how do users actually reach purchase?".

    Plan: ONE window shuffle on user_id (two leads with the (ts,
    event_id) tiebreak), then a count-down to O(|types|³) ≤ 125 rows
    and a driver-trivial top-k.  Ranking ties break on the path string
    so the top-10 cut is deterministic."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.select(
            "event_type",
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .select(
            F.concat_ws(
                ">", "event_type", "e2", "e3"
            ).alias("path")
        )
    )
    counts = tri.groupBy("path").agg(F.count("*").alias("n"))
    wr = Window.orderBy(F.desc("n"), F.asc("path"))
    return (
        counts.select("path", "n", F.row_number().over(wr).alias("rank"))
        .where(F.col("rank") <= _TOP_PATHS)
        .orderBy("rank")
    )


TOP_PATHS_SQL = f"""
WITH tri AS (
  SELECT CONCAT(event_type, '>',
                LEAD(event_type, 1) OVER w, '>',
                LEAD(event_type, 2) OVER w) AS path,
         LEAD(event_type, 1) OVER w AS e2,
         LEAD(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
counts AS (
  SELECT path, COUNT(*) AS n
  FROM tri WHERE e2 IS NOT NULL AND e3 IS NOT NULL
  GROUP BY 1)
SELECT path, n, rank FROM (
  SELECT path, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, path ASC) AS rank
  FROM counts)
WHERE rank <= {_TOP_PATHS}
ORDER BY rank
"""


def cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV: users cohorted by first-activity week; for each
    (cohort, week offset), the cumulative purchase revenue per cohort
    user — the curve whose asymptote is LTV and whose early slope
    pays for acquisition.

    Plan: first-week via one min-aggregate per user (reused for
    cohort sizes), revenue joined back at (user, week) grain, then a
    cumulative window over the O(cohorts × offsets) frame.  Offsets
    with no revenue still appear (dense via the activity grid) so the
    curve is monotone and complete."""
    ev = _events(spark, sf_dir)
    week = (F.datediff(F.to_date("ts"), F.lit("1970-01-01")) / 7).cast(
        "long"
    )
    base = ev.select(
        "user_id",
        week.alias("week_i"),
        F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
            0.0
        ).alias("rev"),
    )
    firsts = base.groupBy("user_id").agg(F.min("week_i").alias("cohort_w"))
    sizes = firsts.groupBy("cohort_w").agg(
        F.count("*").alias("cohort_users")
    )
    cell = (
        base.join(firsts, "user_id")
        .groupBy("cohort_w", (F.col("week_i") - F.col("cohort_w")).alias("offset"))
        .agg(F.sum("rev").alias("rev"))
    )
    wc = (
        Window.partitionBy("cohort_w")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cell.join(F.broadcast(sizes), "cohort_w")
        .select(
            "cohort_w",
            "offset",
            "cohort_users",
            F.round(
                F.sum("rev").over(wc) / F.col("cohort_users"), 4
            ).alias("cum_rev_per_user"),
        )
        .orderBy("cohort_w", "offset")
    )


COHORT_LTV_SQL = """
WITH base AS (
  SELECT user_id,
         CAST(FLOOR(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) / 7)
              AS BIGINT) AS week_i,
         CASE WHEN event_type = 'purchase' THEN value ELSE 0 END AS rev
  FROM events),
firsts AS (
  SELECT user_id, MIN(week_i) AS cohort_w FROM base GROUP BY 1),
sizes AS (
  SELECT cohort_w, COUNT(*) AS cohort_users FROM firsts GROUP BY 1),
cell AS (
  SELECT f.cohort_w, b.week_i - f.cohort_w AS "offset", SUM(b.rev) AS rev
  FROM base b JOIN firsts f ON b.user_id = f.user_id
  GROUP BY 1, 2)
SELECT c.cohort_w, c."offset", s.cohort_users,
       ROUND(SUM(c.rev) OVER (PARTITION BY c.cohort_w ORDER BY c."offset"
                              ROWS UNBOUNDED PRECEDING)
             / s.cohort_users, 4) AS cum_rev_per_user
FROM cell c JOIN sizes s ON c.cohort_w = s.cohort_w
ORDER BY c.cohort_w, c."offset"
"""


def events_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local peaks in each event type's daily-count series: days whose
    count exceeds BOTH neighbors by ≥25% — the spike detector that
    feeds incident/campaign retros.  Only interior days with both
    neighbors present qualify (no phantom peaks at series edges or
    across gaps).

    Plan: daily aggregate first, lag/lead over the O(days × types)
    frame, per-row predicate — nothing past the first shuffle scales
    with events."""
    ev = _events(spark, sf_dir)
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
        .withColumn("day_i", F.datediff("day", F.lit("1970-01-01")))
    )
    w = Window.partitionBy("event_type").orderBy("day_i")
    flagged = daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        F.lag("n").over(w).alias("prev_n"),
        F.lead("n").over(w).alias("next_n"),
        (F.lag("day_i").over(w) == F.col("day_i") - 1).alias("prev_adj"),
        (F.lead("day_i").over(w) == F.col("day_i") + 1).alias("next_adj"),
    )
    return (
        flagged.where(
            F.col("prev_adj")
            & F.col("next_adj")
            & (F.col("n") >= F.col("prev_n") * _PEAK_MIN_RATIO)
            & (F.col("n") >= F.col("next_n") * _PEAK_MIN_RATIO)
        )
        .select(
            "event_type",
            "day",
            "n",
            "prev_n",
            "next_n",
            F.round(
                F.col("n")
                / F.greatest("prev_n", "next_n"),
                4,
            ).alias("prominence"),
        )
        .orderBy("event_type", "day")
    )


PEAKS_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
         DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_i
  FROM events GROUP BY 1, 2, 4),
flagged AS (
  SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
         LAG(n) OVER w AS prev_n,
         LEAD(n) OVER w AS next_n,
         LAG(day_i) OVER w = day_i - 1 AS prev_adj,
         LEAD(day_i) OVER w = day_i + 1 AS next_adj
  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day_i))
SELECT event_type, day, n, prev_n, next_n,
       ROUND(n * 1.0 / GREATEST(prev_n, next_n), 4) AS prominence
FROM flagged
WHERE prev_adj AND next_adj
  AND n >= prev_n * {_PEAK_MIN_RATIO!r}
  AND n >= next_n * {_PEAK_MIN_RATIO!r}
ORDER BY event_type, day
"""
