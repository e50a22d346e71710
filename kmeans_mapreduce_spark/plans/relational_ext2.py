"""Relational coverage, round 2 — TPC-H Q4/Q10 shapes, higher-order
array functions, lateral/generator table functions, FILTER-clause
aggregates, ROWS-frame windows, date interval arithmetic, histogram
bucketing, and null-safe equality joins.

The reference engine has none of this surface (SURVEY §2.4-2.9); every
query here is a Spark built-in composition with a hash-matched DuckDB
oracle.  Scale posture in each docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- TPC-H Q4 shape: EXISTS -> semi join + agg ------------------------------

def q4_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 adapted to this schema (no commitdate): orders with at least
    one line item shipped >60 days after the order date, counted per
    priority.

    The EXISTS decorrelates to a left-semi hash join on l_orderkey; the
    probe side carries only (orderkey, shipdate-filter survivors), so
    the shuffle is keys, not lineitem rows.  At 100 TB both sides
    partition on orderkey and the semi join is shuffle-local."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # correlated condition via join: semi join keeps order rows only
    late_keys = (
        li.join(
            o.select("o_orderkey", "o_orderdate"), li.l_orderkey == o.o_orderkey
        )
        .where(F.col("l_shipdate") > F.date_add("o_orderdate", 60))
        .select("o_orderkey")
    )
    return (
        o.join(late_keys, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_late_orders"))
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_late_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


# --- TPC-H Q10 shape: 4-way join + agg + top-k ------------------------------

def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: revenue lost to returned items per customer, top 20.

    Join graph: lineitem(R-flagged) ⨝ orders ⨝ customer ⨝ nation.
    nation broadcasts (25 rows); customer joins shuffle on custkey;
    the fact-side filter (l_returnflag = 'R') pushes to the parquet
    scan so only ~25% of lineitem leaves the scan.  Top-20 is
    TakeOrderedAndProject — no global sort."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return rev.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# --- higher-order array functions -------------------------------------------

def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter / transform / exists / aggregate over token arrays —
    Spark's lambda-expression family, all JVM-side codegen (no UDF).

    Per document: token count, long-token count, distinct count, a
    membership probe, and a fold (total characters).  Pure map stage:
    at 100 TB this pipelines inside whole-stage codegen with zero
    shuffles before the (optional) final agg."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda w: F.length(w) > 4)).alias("n_long"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.exists(toks, lambda w: w == F.lit("spark")).cast("int").alias("has_spark"),
        F.aggregate(toks, F.lit(0), lambda s, w: s + F.length(w)).alias("total_chars"),
    )


ARRAY_HO_SQL = """
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_filter(toks, w -> len(w) > 4)) AS n_long,
       len(list_distinct(toks)) AS n_distinct,
       CAST(list_contains(toks, 'spark') AS INT) AS has_spark,
       CAST(list_sum(list_transform(toks, w -> len(w))) AS INT) AS total_chars
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 100)
"""


# --- lateral position explode (UDTF surface) --------------------------------

def lateral_pos_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode = the lateral-view / table-function surface: one row
    per (document, position, token).  Generate executes inside the scan
    stage — the fan-out never shuffles; downstream aggs see partial
    aggregation as usual."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 5)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )


LATERAL_POS_SQL = """
SELECT doc_id,
       generate_subscripts(toks, 1) - 1 AS pos,
       unnest(toks) AS token
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 5)
"""


# --- generator table function (sequence/explode) ----------------------------

def generator_order_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row generator: for each early order, emit one row per year from
    its order year through 1998 (explode(sequence(...))) — the
    scaffolding pattern for forward-filling time series.  Generate is
    scan-local; no shuffle.

    The start year is clamped to 1998: the synthetic dates run past
    1998, and Spark's sequence(5, 3) counts DOWN while DuckDB's
    generate_series(5, 3) is empty — clamping keeps both ascending."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 100)
    return o.select(
        "o_orderkey",
        F.explode(
            F.sequence(F.least(F.year("o_orderdate"), F.lit(1998)), F.lit(1998))
        ).alias("yr"),
    )


GENERATOR_SQL = """
SELECT o_orderkey, CAST(y AS INT) AS yr
FROM orders, LATERAL (SELECT unnest(generate_series(LEAST(year(o_orderdate), 1998), 1998)) AS y) g
WHERE o_orderkey < 100
"""


# --- FILTER-clause / conditional aggregation --------------------------------

def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority aggregation with FILTER-ed sub-populations
    (count_if / sum FILTER) — one pass, one shuffle, conditional
    accumulators instead of self-joins per predicate."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        F.round(
            F.sum(F.when(F.col("o_totalprice") > 200000, F.col("o_totalprice"))), 2
        ).alias("big_total"),
        F.round(
            F.avg(F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))), 2
        ).alias("avg_open_price"),
    )


FILTER_CLAUSE_SQL = """
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
       ROUND(SUM(o_totalprice) FILTER (WHERE o_totalprice > 200000), 2) AS big_total,
       ROUND(AVG(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS avg_open_price
FROM orders GROUP BY o_orderpriority
"""


# --- ROWS-frame moving average ----------------------------------------------

def window_rows_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row (≈ weekly) moving average over the daily order-total
    series: pre-aggregate to one row per day (shuffle #1), then a
    single ordered window (shuffle #2, single partition over ~2.4k
    days — fine at any SF because days, not orders, bound the rows).
    For per-key series the window partitions and scales linearly."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderdate").agg(
        F.round(F.sum("o_totalprice"), 2).alias("day_total")
    )
    w = Window.orderBy("o_orderdate").rowsBetween(-6, 0)
    return daily.select(
        "o_orderdate",
        "day_total",
        F.round(F.avg("day_total").over(w), 2).alias("ma7"),
    )


ROWS_MA_SQL = """
SELECT o_orderdate, day_total,
       ROUND(AVG(day_total) OVER (ORDER BY o_orderdate
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS ma7
FROM (SELECT o_orderdate, ROUND(SUM(o_totalprice), 2) AS day_total
      FROM orders GROUP BY o_orderdate)
"""


# --- date interval arithmetic -----------------------------------------------

def date_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic family: day offset, month addition with
    end-of-month clamping (add_months), month-end (last_day) — all
    engine-intrinsic date math, verified against DuckDB's INTERVAL
    semantics.  Map-only."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 50)
    od = F.col("o_orderdate").cast("date")
    iso = "yyyy-MM-dd"
    # Dates ship as ISO strings: engines (and their pandas bridges)
    # disagree on date-vs-timestamp rendering, strings are unambiguous.
    return o.select(
        "o_orderkey",
        F.date_format(od, iso).alias("odate"),
        F.date_format(F.date_add(od, 7), iso).alias("ship_by"),
        F.date_format(F.add_months(od, 3), iso).alias("quarter_out"),
        F.date_format(F.last_day(od), iso).alias("month_end"),
        F.datediff(F.lit("1998-12-31").cast("date"), od).alias("age_days"),
    )


DATE_ARITH_SQL = """
SELECT o_orderkey, strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS odate,
       strftime(CAST(o_orderdate AS DATE) + 7, '%Y-%m-%d') AS ship_by,
       strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d') AS quarter_out,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS age_days
FROM orders WHERE o_orderkey < 50
"""


# --- histogram bucketing ----------------------------------------------------

def hist_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order values (20 x 30k buckets):
    bucket = floor(x / width), one groupBy — the one-pass distributed
    histogram.  Bucket count is fixed, so the shuffle carries ≤21
    partial rows per partition regardless of N."""
    o = _t(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 30000).cast("int"), F.lit(20))
    return (
        o.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


HIST_SQL = """
SELECT CAST(LEAST(FLOOR(o_totalprice / 30000), 20) AS INT) AS bucket, COUNT(*) AS n
FROM orders GROUP BY 1
"""


# --- TPC-H Q14 shape: conditional share over a join -------------------------

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share: % of revenue from PROMO-type parts over one
    month.  lineitem ⨝ part on partkey (part broadcasts at bench SF;
    shuffles on partkey beyond the threshold), conditional numerator
    via CASE inside the same single aggregation — no second scan."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_pct"),
            F.count("*").alias("n_lines"),
        )
    )


Q14_SQL = """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1995-09-01' AND l_shipdate < DATE '1995-10-01'
"""


# --- TPC-H Q19 shape: disjunctive join predicates ---------------------------

def q19_branded_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs predicate join (Q19's shape): revenue from three
    disjoint (brand, quantity-band) configurations.

    The equi-join key (partkey) stays conjunctive, so Catalyst still
    plans a hash join; the disjunction lands in the post-join filter
    with each side's single-table conjuncts (brand IN, quantity range)
    pushed below the join — predicate pushdown through OR via CNF
    conversion."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    cfg = (
        ((F.col("p_brand") == "Brand#11") & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#22") & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#13") & F.col("l_quantity").between(20, 30))
    )
    return j.where(cfg).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_lines"),
    )


Q19_SQL = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#22' AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#13' AND l_quantity BETWEEN 20 AND 30)
"""


# --- string function family, part 2 -----------------------------------------

def string_customer_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string sweep: regexp_replace, translate, lpad, split_part
    (element_at of split), initcap — per market segment.  All JVM
    built-ins, one codegen stage, one low-cardinality agg shuffle."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") < 500)
    num = F.element_at(F.split("c_name", "#"), -1)
    return c.select(
        F.col("c_mktsegment"),
        F.initcap(F.lower("c_mktsegment")).alias("seg_title"),
        F.regexp_replace("c_name", "[0-9]", "").alias("name_alpha"),
        F.translate("c_name", "#0", "_O").alias("name_translated"),
        F.lpad(num, 12, "0").alias("num_padded"),
    ).orderBy("c_mktsegment", "num_padded").limit(25)


STRING2_SQL = """
SELECT c_mktsegment,
       -- initcap: first letter upper, rest lower (single-word segments)
       UPPER(SUBSTR(LOWER(c_mktsegment), 1, 1)) || SUBSTR(LOWER(c_mktsegment), 2) AS seg_title,
       regexp_replace(c_name, '[0-9]', '', 'g') AS name_alpha,
       translate(c_name, '#0', '_O') AS name_translated,
       lpad(split_part(c_name, '#', -1), 12, '0') AS num_padded
FROM customer WHERE c_custkey < 500
ORDER BY c_mktsegment, num_padded
LIMIT 25
"""


# --- global sort (range partitioning) ---------------------------------------

def sort_global_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full global ORDER BY (no limit): daily totals sorted by value.

    The one sort the reference never had (§2.7).  Spark samples the sort
    key to build range boundaries, Exchange(rangepartitioning) sends
    each range to one task, tasks sort locally — total order across
    output files without any single-node sort.  Output is bounded by
    distinct days, so the query is safe at any SF; the hash comparator
    is order-insensitive, so the plan property (rangepartitioning, no
    global single-partition sort) is pinned in tests/test_plans.py."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("day_total"),
        F.count("*").alias("n_orders"),
    )
    return daily.orderBy(F.desc("day_total"), F.asc("day")).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "day_total", "n_orders"
    )


SORT_GLOBAL_SQL = """
SELECT strftime(day, '%Y-%m-%d') AS day, day_total, n_orders FROM (
  SELECT CAST(o_orderdate AS DATE) AS day,
         ROUND(SUM(o_totalprice), 2) AS day_total,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1)
ORDER BY day_total DESC, day ASC
"""


# --- collect_list / collect_set aggregation ---------------------------------

def agg_collect_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-building aggregation: per region, the sorted set of nation
    names and the sorted list of nation keys.

    collect_set/collect_list are holistic (state = the whole group) —
    exactly the aggregates partial aggregation can't shrink, so they
    belong on BOUNDED groups (25 nations here).  sort_array pins a
    deterministic output order, and array_join flattens to a string so
    every downstream comparator (the driver canonicalizes with a pandas
    sort that cannot hash raw list cells) can hash the result."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias(
                "nations"
            ),
            F.array_join(
                F.sort_array(F.collect_list(F.col("n_nationkey").cast("string"))),
                ",",
            ).alias("nation_keys"),
            F.count("*").alias("n"),
        )
    )


COLLECT_SQL = """
SELECT r_name,
       array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations,
       array_to_string(list_sort(list(CAST(n_nationkey AS VARCHAR))), ',')
         AS nation_keys,
       COUNT(*) AS n
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --- window dedup: keep the latest row per key ------------------------------

def dedup_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest dedup: one row per user — their most recent event
    (row_number over ts DESC with event_id tiebreak).

    The standard CDC/SCD compaction shape: one hash shuffle on the key,
    per-partition sort, rank filter.  Unlike groupBy(max(ts)) + join,
    the window form carries the whole row through in one pass."""
    from kmeans_mapreduce_spark.plans.relational import _events

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            F.round("value", 4).alias("value"),
        )
    )


DEDUP_LATEST_SQL = """
SELECT user_id, event_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       ROUND(value, 4) AS value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
WHERE rn = 1
"""


# --- map type: build, look up, measure --------------------------------------

def map_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType round-trip: per user, build event_type -> count as a MAP
    (map_from_entries over collected structs), then read it back via
    map lookups and size().

    The map is created and consumed inside the query; the output is
    plain integers so the oracle is the equivalent relational
    conditional-count form.  Maps are the right shape for sparse
    per-entity feature bags at scale — bounded entries per key (5 event
    types), built in one grouped pass."""
    from kmeans_mapreduce_spark.plans.relational import _events

    ev = _events(spark, sf_dir).where(F.col("user_id") < 30)
    per_type = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("m")
    )
    return mapped.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.coalesce(F.col("m")["click"], F.lit(0)).alias("n_clicks"),
        F.coalesce(F.col("m")["purchase"], F.lit(0)).alias("n_purchases"),
        F.coalesce(F.col("m")["error"], F.lit(0)).alias("n_errors"),
    )


MAP_COUNTS_SQL = """
SELECT user_id,
       CAST(COUNT(DISTINCT event_type) AS INT) AS n_types,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_clicks,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchases,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_errors
FROM events WHERE user_id < 30
GROUP BY user_id
"""


# --- null-safe equality join ------------------------------------------------

def join_null_safe_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (<=> / IS NOT DISTINCT FROM): join orders to
    a status-dimension through a NULLable derived key (P -> NULL on
    both sides) and count matches per bucket.  NULL keys pair up under
    <=>, unlike '=' which drops them — the standard trap in SCD joins.
    Planned as a regular hash join with null-aware key equality."""
    o = _t(spark, sf_dir, "orders")
    probe = o.select(F.nullif("o_orderstatus", F.lit("P")).alias("k"))
    dim = (
        o.select(F.nullif("o_orderstatus", F.lit("P")).alias("k"))
        .distinct()
        .withColumn("status_label", F.coalesce("k", F.lit("PENDING")))
    )
    return (
        probe.join(dim, probe.k.eqNullSafe(dim.k))
        .groupBy("status_label")
        .agg(F.count("*").alias("n"))
    )


NULL_SAFE_SQL = """
WITH probe AS (SELECT NULLIF(o_orderstatus, 'P') AS k FROM orders),
dim AS (SELECT k, COALESCE(k, 'PENDING') AS status_label
        FROM (SELECT DISTINCT NULLIF(o_orderstatus, 'P') AS k FROM orders))
SELECT status_label, COUNT(*) AS n
FROM probe JOIN dim ON probe.k IS NOT DISTINCT FROM dim.k
GROUP BY status_label
"""
