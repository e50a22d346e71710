"""Analytics pack 3: dominance/skyline, sequence models over events,
time-series diagnostics, and distribution summaries.

The reference engine (SURVEY §1) has no relational surface at all;
these are the remaining analytics shapes a warehouse user of the
reference's data would expect, each expressed Spark-first with an
exact DuckDB oracle.

Scale posture (shared):
  * the skyline query is the textbook 2-phase distributed frontier —
    per-partition skyline first (skyline-of-skylines is the skyline for
    any monotone dominance relation), so the single-partition final
    pass sees only O(frontier × partitions) candidate rows, never the
    fact table;
  * the sequence/Markov and attribution-style windows shuffle ONCE on
    user_id; everything after the window is O(event-type²) rows;
  * autocorrelation / rolling correlation aggregate to DAILY grain
    (O(days) rows) before any window arithmetic, so the unpartitioned
    windows that follow are driver-trivial no matter the input size;
  * the two global-order queries (equi-depth histogram, vocab
    coverage) sort O(N) / O(vocab) rows respectively; the histogram
    documents the approx_percentile escape hatch for 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.plans.relational import _events, _t

_SKYLINE_BUCKETS = 64
_HIST_BUCKETS = 10
_ROLLCORR_DAYS = 30  # window length in days, current day inclusive
_COVERAGE_THRESHOLDS = (0.5, 0.9, 0.99)


def orders_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) of orders over (o_totalprice,
    o_orderdate): the distinct (price, date) points not dominated by
    any other point, where p2 dominates p1 iff p2 >= p1 on both axes
    and is strictly greater on at least one.  The classic "best
    tradeoff" query (price vs recency) that no single ORDER BY answers.

    Plan: dedupe to distinct points (counting orders per point), then
    TWO window passes.  Pass 1 partitions points into 64 hash buckets
    and keeps each bucket's local frontier — correct because the
    skyline of any union is contained in the union of skylines — so
    the pass-2 global window (unavoidably single-partition) only sees
    the ~frontier-sized candidate set, not N rows.  Frontier test per
    pass: sorted by (price DESC, date DESC), a point is dominated iff
    max(date) over all PRECEDING rows >= its date."""
    pts = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_totalprice").alias("price"),
            F.col("o_orderdate").cast("date").alias("odate"),
        )
        .agg(F.count("*").alias("n_orders"))
    )
    local = Window.partitionBy("bkt").orderBy(
        F.desc("price"), F.desc("odate")
    ).rowsBetween(Window.unboundedPreceding, -1)
    cands = (
        pts.withColumn("bkt", F.pmod(F.hash("price", "odate"), F.lit(_SKYLINE_BUCKETS)))
        .withColumn("dmax", F.max("odate").over(local))
        .where(F.col("dmax").isNull() | (F.col("odate") > F.col("dmax")))
        .drop("bkt", "dmax")
    )
    glob = Window.orderBy(F.desc("price"), F.desc("odate")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        cands.withColumn("dmax", F.max("odate").over(glob))
        .where(F.col("dmax").isNull() | (F.col("odate") > F.col("dmax")))
        .select(
            F.round("price", 2).alias("price"),
            F.date_format("odate", "yyyy-MM-dd").alias("odate"),
            "n_orders",
        )
        .orderBy(F.desc("price"))
    )


PARETO_SQL = """
WITH pts AS (
  SELECT o_totalprice AS price, CAST(o_orderdate AS DATE) AS odate,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1, 2),
scan AS (
  SELECT price, odate, n_orders,
         MAX(odate) OVER (ORDER BY price DESC, odate DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS dmax
  FROM pts)
SELECT ROUND(price, 2) AS price, strftime(odate, '%Y-%m-%d') AS odate,
       n_orders
FROM scan
WHERE dmax IS NULL OR odate > dmax
ORDER BY price DESC
"""


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current event type), the model
    behind next-action prediction and funnel-leak triage.

    Plan: ONE window shuffle on user_id (lead over (ts, event_id) —
    the deterministic tiebreak every sequence query here uses), then a
    groupBy that collapses to at most |types|² = 25 rows; the per-row
    probability divides by a window total over those 25 rows, so no
    second scan and no join."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("to_type", F.lead("event_type").over(w))
        .where(F.col("to_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), "to_type")
        .agg(F.count("*").alias("cnt"))
    )
    tot = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "cnt",
        F.round(F.col("cnt") / F.sum("cnt").over(tot), 6).alias("prob"),
    ).orderBy("from_type", "to_type")


MARKOV_SQL = """
WITH pairs AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_type
  FROM events),
cnts AS (
  SELECT from_type, to_type, COUNT(*) AS cnt
  FROM pairs WHERE to_type IS NOT NULL
  GROUP BY 1, 2)
SELECT from_type, to_type, cnt,
       ROUND(cnt / SUM(cnt) OVER (PARTITION BY from_type), 6) AS prob
FROM cnts
ORDER BY from_type, to_type
"""


def events_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-7 autocorrelation of each event type's daily-count
    series — the seasonality screen (lag-7 high => weekly cycle) run
    before fitting any forecast model.

    Plan: aggregate to daily grain FIRST (one shuffle, O(days×types)
    rows), then lag + corr entirely over that tiny frame.  The lag is
    taken over a dense day index so missing days break the pairing
    instead of silently pairing non-adjacent days."""
    ev = _events(spark, sf_dir)
    daily = (
        ev.groupBy(
            "event_type", F.to_date("ts").alias("day")
        ).agg(F.count("*").alias("n"))
        .withColumn("day_i", F.datediff("day", F.lit("1970-01-01")))
    )
    w = Window.partitionBy("event_type").orderBy("day_i")
    lagged = daily.select(
        "event_type",
        "day_i",
        "n",
        F.when(
            F.lag("day_i", 1).over(w) == F.col("day_i") - 1, F.lag("n", 1).over(w)
        ).alias("n_lag1"),
        F.when(
            F.lag("day_i", 7).over(w) == F.col("day_i") - 7, F.lag("n", 7).over(w)
        ).alias("n_lag7"),
    )
    return (
        lagged.groupBy("event_type")
        .agg(
            F.count("n").alias("n_days"),
            F.round(F.corr("n", "n_lag1"), 6).alias("acf_1"),
            F.round(F.corr("n", "n_lag7"), 6).alias("acf_7"),
        )
        .orderBy("event_type")
    )


AUTOCORR_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
         DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_i
  FROM events GROUP BY 1, 2, 4),
lagged AS (
  SELECT event_type, day_i, n,
         CASE WHEN LAG(day_i, 1) OVER w = day_i - 1
              THEN LAG(n, 1) OVER w END AS n_lag1,
         CASE WHEN LAG(day_i, 7) OVER w = day_i - 7
              THEN LAG(n, 7) OVER w END AS n_lag7
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day_i))
SELECT event_type, COUNT(n) AS n_days,
       ROUND(CORR(n, n_lag1), 6) AS acf_1,
       ROUND(CORR(n, n_lag7), 6) AS acf_7
FROM lagged GROUP BY event_type ORDER BY event_type
"""


def events_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-day rolling correlation between daily click volume and daily
    purchase volume — the co-movement monitor that flags when a
    engagement metric decouples from revenue.

    Plan: daily conditional aggregation first (O(days) rows), then a
    RANGE frame over a day-number key so calendar gaps shorten the
    window instead of stretching it; corr runs as a windowed aggregate
    JVM-side.  Emits only days with a full-rank window (corr defined)."""
    ev = _events(spark, sf_dir)
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
                "purchases"
            ),
        )
        .withColumn("day_i", F.datediff("day", F.lit("1970-01-01")))
    )
    w = (
        Window.orderBy("day_i")
        .rangeBetween(-(_ROLLCORR_DAYS - 1), 0)
    )
    return (
        daily.select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(F.corr("clicks", "purchases").over(w), 6).alias(
                "roll_corr"
            ),
            F.count("*").over(w).alias("n_days"),
        )
        .where(F.col("roll_corr").isNotNull())
        .orderBy("day")
    )


ROLLCORR_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         COUNT(*) FILTER (WHERE event_type = 'click') AS clicks,
         COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases,
         DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_i
  FROM events GROUP BY 1, 4),
rolled AS (
  SELECT strftime(day, '%Y-%m-%d') AS day,
         ROUND(CORR(clicks, purchases) OVER w, 6) AS roll_corr,
         COUNT(*) OVER w AS n_days
  FROM daily
  WINDOW w AS (ORDER BY day_i
               RANGE BETWEEN {_ROLLCORR_DAYS - 1} PRECEDING AND CURRENT ROW))
SELECT day, roll_corr, n_days FROM rolled
WHERE roll_corr IS NOT NULL ORDER BY day
"""


def hist_equidepth_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram of order totals: 10 buckets with (near-)
    equal row counts, each reporting its [lo, hi] span — the
    distribution summary that equal-width histograms (hist_order_values)
    get wrong for skewed money columns.

    Plan: ntile over a deterministic global order (price, orderkey
    tiebreak), then a 10-row aggregate.  The global sort is the honest
    cost (Spark range-partitions it); at 100 TB the same report comes
    from approx_percentile(price, array(0.1..0.9)) boundaries at a
    fraction of the cost — this exact variant is the oracle-checkable
    form."""
    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            F.ntile(_HIST_BUCKETS).over(w).alias("bucket"), "o_totalprice"
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


HIST_EQUIDEPTH_SQL = f"""
WITH tiled AS (
  SELECT NTILE({_HIST_BUCKETS}) OVER (ORDER BY o_totalprice, o_orderkey)
           AS bucket,
         o_totalprice
  FROM orders)
SELECT bucket, COUNT(*) AS n,
       ROUND(MIN(o_totalprice), 2) AS lo,
       ROUND(MAX(o_totalprice), 2) AS hi
FROM tiled GROUP BY bucket ORDER BY bucket
"""


def docs_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage curve: how many distinct tokens (taken most-
    frequent-first) cover 50% / 90% / 99% of all token occurrences —
    the sizing question every tokenizer/vocab budget starts from.

    Plan: token count (one shuffle on token), then a cumulative window
    over the vocab-sized frame ordered (cnt DESC, token ASC — the
    deterministic tiebreak), then THREE conditional MIN aggregates
    unpivoted via stack, so the thresholds need no join (and no
    nested-loop) at all."""
    docs = _t(spark, sf_dir, "documents")
    toks = (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
        )
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    ranked = toks.select(
        F.row_number().over(w).alias("rank"),
        F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum"
        ),
        F.sum("cnt").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    aggs = ranked.agg(
        *[
            F.min(
                F.when(F.col("cum") >= F.col("total") * F.lit(t), F.col("rank"))
            ).alias(f"v{int(t * 100)}")
            for t in _COVERAGE_THRESHOLDS
        ],
        F.max("total").alias("total_tokens"),
    )
    stack = ", ".join(
        f"CAST({t!r} AS DOUBLE), v{int(t * 100)}" for t in _COVERAGE_THRESHOLDS
    )
    return aggs.select(
        F.expr(
            f"stack({len(_COVERAGE_THRESHOLDS)}, {stack})"
        ).alias("threshold", "vocab_size"),
        "total_tokens",
    ).orderBy("threshold")


VOCAB_COVERAGE_SQL = """
WITH toks AS (
  SELECT t.tok, COUNT(*) AS cnt
  FROM documents d,
       UNNEST(string_split_regex(TRIM(d.text), '\\s+')) AS t(tok)
  WHERE t.tok != ''
  GROUP BY 1),
ranked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC) AS rank,
         SUM(cnt) OVER (ORDER BY cnt DESC, tok ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(cnt) OVER () AS total
  FROM toks),
aggs AS (
  SELECT MIN(CASE WHEN cum >= total * 0.5  THEN rank END) AS v50,
         MIN(CASE WHEN cum >= total * 0.9  THEN rank END) AS v90,
         MIN(CASE WHEN cum >= total * 0.99 THEN rank END) AS v99,
         CAST(MAX(total) AS BIGINT) AS total_tokens
  FROM ranked)
SELECT u.threshold, u.vocab_size, a.total_tokens
FROM aggs a, (
  SELECT CAST(0.5 AS DOUBLE) AS threshold, v50 AS vocab_size FROM aggs
  UNION ALL SELECT CAST(0.9 AS DOUBLE), v90 FROM aggs
  UNION ALL SELECT CAST(0.99 AS DOUBLE), v99 FROM aggs) u
ORDER BY u.threshold
"""


def events_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index per event type: average daily
    count on each ISO weekday divided by the type's overall average
    daily count (index 1.0 = flat week) — the load-shaping profile
    capacity planning reads.

    Plan: daily aggregate first, then a weekday aggregate over
    O(days×types) rows, then a window total over ≤ 7×types rows.  ISO
    weekday (1=Mon..7=Sun) via weekday()+1 matches DuckDB's isodow
    exactly — plain dayofweek() differs between engines."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"))
    per_dow = daily.groupBy(
        "event_type", (F.weekday("day") + 1).alias("isodow")
    ).agg(F.avg("n").alias("avg_n"), F.count("*").alias("n_days"))
    w = Window.partitionBy("event_type")
    return per_dow.select(
        "event_type",
        "isodow",
        "n_days",
        F.round(
            F.col("avg_n")
            / (
                F.sum(F.col("avg_n") * F.col("n_days")).over(w)
                / F.sum("n_days").over(w)
            ),
            6,
        ).alias("dow_index"),
    ).orderBy("event_type", "isodow")


DOW_SEASONALITY_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
per_dow AS (
  SELECT event_type, isodow(day) AS isodow,
         AVG(n) AS avg_n, COUNT(*) AS n_days
  FROM daily GROUP BY 1, 2)
SELECT event_type, isodow, n_days,
       ROUND(avg_n / (SUM(avg_n * n_days) OVER (PARTITION BY event_type)
                      / SUM(n_days) OVER (PARTITION BY event_type)), 6)
         AS dow_index
FROM per_dow ORDER BY event_type, isodow
"""


def orders_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue: monthly total, previous month, and %
    growth — the first chart on every revenue dashboard.

    Plan: aggregate to month FIRST (one shuffle, O(months) rows); the
    lag window and growth arithmetic run over that tiny frame.  Only
    consecutive calendar months pair (gap => NULL growth), so a silent
    missing month can't masquerade as growth."""
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.orderBy("month")
    lagged = monthly.select(
        "month",
        "revenue",
        F.when(
            F.lag("month").over(w) == F.add_months("month", -1),
            F.lag("revenue").over(w),
        ).alias("prev_revenue"),
    )
    return lagged.select(
        F.date_format("month", "yyyy-MM-dd").alias("month"),
        "revenue",
        "prev_revenue",
        F.round(
            (F.col("revenue") - F.col("prev_revenue"))
            / F.col("prev_revenue")
            * 100,
            4,
        ).alias("growth_pct"),
    ).orderBy("month")


MOM_GROWTH_SQL = """
WITH monthly AS (
  SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
         ROUND(SUM(o_totalprice), 2) AS revenue
  FROM orders GROUP BY 1),
lagged AS (
  SELECT month, revenue,
         CASE WHEN LAG(month) OVER (ORDER BY month)
                   = month - INTERVAL 1 MONTH
              THEN LAG(revenue) OVER (ORDER BY month) END AS prev_revenue
  FROM monthly)
SELECT strftime(month, '%Y-%m-%d') AS month, revenue, prev_revenue,
       ROUND((revenue - prev_revenue) / prev_revenue * 100, 4) AS growth_pct
FROM lagged ORDER BY month
"""

_SESSION_GAP_US = 1800 * 1_000_000  # the events_sessionize 30-min rule
_OVERLAP_BUCKET_S = 3600
_OVERLAP_PAD_S = 300  # ±5 min co-presence halo around each session


def sessions_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-session pairs: per event type, how many cross-user
    session pairs overlap in time — the interval-join workload behind
    co-presence / simultaneous-usage analysis.

    Plan: sessionize per (user, type) with the same 30-min-gap rule as
    events_sessionize (two windows, one shuffle), aggregate to session
    [start, end] intervals, then operators/interval.overlap_join —
    bucket-blocked equi-join, exact verify, first-shared-bucket dedup —
    instead of the O(N²) theta self-join the oracle states.  Candidate
    volume is O(sessions × buckets-per-session), never sessions²."""
    from kmeans_mapreduce_spark.operators.interval import overlap_join

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
    ivals = (
        seq.withColumn("sid", F.sum("ns").over(wc))
        .groupBy("user_id", "event_type", "sid")
        .agg(
            (F.floor(F.min("us") / 1_000_000) - _OVERLAP_PAD_S).alias("s"),
            (F.floor(F.max("us") / 1_000_000) + _OVERLAP_PAD_S).alias("e"),
        )
    )
    pairs = overlap_join(
        ivals,
        ivals,
        start="s",
        end="e",
        bucket_seconds=_OVERLAP_BUCKET_S,
        keys=["event_type"],
    )
    return (
        pairs.where(F.col("user_id_l") < F.col("user_id_r"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("event_type")
    )


SESSIONS_OVERLAP_SQL = """
WITH seq AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
         CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                      > 1800 * 1000000
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
ivals AS (
  SELECT user_id, event_type, sid,
         FLOOR(MIN(us) / 1000000) - 300 AS s,
         FLOOR(MAX(us) / 1000000) + 300 AS e
  FROM (
    SELECT user_id, event_type, us,
           SUM(ns) OVER (PARTITION BY user_id, event_type
                         ORDER BY us, event_id
                         ROWS UNBOUNDED PRECEDING) AS sid
    FROM seq)
  GROUP BY 1, 2, 3)
SELECT a.event_type, COUNT(*) AS n_pairs
FROM ivals a
JOIN ivals b
  ON a.event_type = b.event_type
 AND a.user_id < b.user_id
 AND a.s <= b.e AND b.s <= a.e
GROUP BY 1 ORDER BY 1
"""
