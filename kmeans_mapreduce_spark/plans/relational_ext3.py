"""Relational coverage, round 3 — the remaining TPC-H query shapes the
driver's star schema can express: Q7 (two-sided dimension filter over a
4-way join), Q8 (market-share ratio agg), Q13 (outer-join grouped
distribution), Q15 (CTE + scalar-subquery max), Q18 (HAVING-subquery
semi join), Q21 (multi-correlated EXISTS/NOT EXISTS), Q22 (scalar
subquery + anti join).  Q2/Q9/Q11/Q16/Q20 need a partsupp table the
testdata does not ship, so they are out of reach by construction.

The reference engine has no relational surface at all (SURVEY §2.6
"joins: none implemented"); every query here is Spark built-ins with a
hash-matched DuckDB oracle.  Scale posture in each docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- TPC-H Q7: volume shipping between two nations --------------------------

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: yearly shipped volume between NATION_1 and NATION_2 in both
    directions (supplier nation -> customer nation).

    Join graph: lineitem ⨝ supplier ⨝ orders ⨝ customer, with nation
    joined twice (supplier side and customer side).  Both nation copies
    broadcast (25 rows), and crucially the nation-pair filter is applied
    to supplier/customer BEFORE the fact joins: only ~1/25 of suppliers
    and ~2/25 of customers survive, so the orderkey shuffle carries a
    fraction of lineitem.  At 100 TB the fact-fact join (lineitem ⨝
    orders) shuffles on orderkey; everything else is broadcast."""
    n = _t(spark, sf_dir, "nation")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name").isin("NATION_1", "NATION_2"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name").isin("NATION_1", "NATION_2"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE n1.n_name IN ('NATION_1', 'NATION_2')
  AND n2.n_name IN ('NATION_1', 'NATION_2')
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


# --- TPC-H Q8: national market share ----------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: NATION_3's share of PROMO-part revenue among EUROPE customers,
    by order year.  A ratio-of-conditional-sums aggregation over a 6-way
    join (lineitem ⨝ part ⨝ supplier ⨝ orders ⨝ customer ⨝ nation ⨝
    region).

    All dimensions broadcast; the p_type filter prunes part before the
    join so the partkey probe side is small; the share is a single agg
    pass (sum(CASE)/sum), not two scans.  At 100 TB the only shuffles
    are lineitem⨝orders on orderkey and the final 7-row agg."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    europe_cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nation = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    promo = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(promo.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(europe_cust), o.o_custkey == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share"),
            F.round(F.sum(vol), 2).alias("total_volume"),
        )
    )


Q8_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       ROUND(SUM(CASE WHEN n1.n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 6) AS mkt_share,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_volume
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
JOIN region ON r_regionkey = n2.n_regionkey
WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
GROUP BY 1
"""


# --- TPC-H Q13: customer order-count distribution ---------------------------

def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: how many customers placed 0, 1, 2, ... non-urgent orders.
    Two-level aggregation over a LEFT OUTER join: customers with no
    orders must survive with count 0 (the whole point of the shape).

    The outer join shuffles on custkey; the second agg groups on the
    derived count — tiny domain, no skew.  At 100 TB the custkey join is
    the only real shuffle and co-partitions with any bucketing on
    custkey."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c.c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer c
    LEFT OUTER JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
) t
GROUP BY c_count
"""


# --- TPC-H Q15: top supplier by windowed revenue ----------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: the supplier(s) whose Q1-1996 shipped revenue equals the
    maximum over all suppliers.  CTE (revenue per supplier) consumed
    twice: once for the scalar MAX, once for the equality filter.

    Spark evaluates the revenue agg once per consumer; the date filter
    pushes to the lineitem scan (PushedFilters on l_shipdate), so both
    passes read ~4% of the fact table.  The scalar max is a one-row
    broadcast, not a join.  At 100 TB: two pruned scans + 100-row agg —
    or cache the CTE, which fit_kmeans does for its loop; here the agg
    output is 100 rows so recompute is cheaper than a cache round-trip."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = (
        li.groupBy("l_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    s = _t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            F.round("total_revenue", 2).alias("total_revenue"),
        )
    )


Q15_SQL = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, ROUND(total_revenue, 2) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


# --- TPC-H Q18: large-volume customers --------------------------------------

def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: orders whose total quantity exceeds 250, with customer and
    order detail — the HAVING-subquery-feeding-a-semi-join shape.

    The qualifying-keys agg runs first (groupBy orderkey, map-side
    partial sums), producing ~0.3% of orders; that key set then
    semi-joins orders and joins lineitem again for the total.  Both
    fact joins share the orderkey partitioning, so AQE reuses one
    exchange.  Top-100 with a unique tiebreaker (orderkey) keeps the
    result deterministic across engines."""
    li = _t(spark, sf_dir, "lineitem")
    big_keys = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(big_keys, o.o_orderkey == big_keys.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            F.col("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, total_qty
FROM orders
JOIN (SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250) big ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


# --- TPC-H Q21: suppliers who alone shipped late ----------------------------

def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 adapted (no receipt/commit dates): suppliers who were the
    ONLY late shipper (>60 days after order date) on a multi-supplier
    order, counted per supplier, top 20.

    TPC-H states this as EXISTS (another supplier) AND NOT EXISTS
    (another LATE supplier) — two correlated self-joins of lineitem.
    Per-order aggregation is the scale-correct plan: a (orderkey,
    suppkey) pre-aggregation stands in for DISTINCT, then a per-order
    rollup computes `n_supp > 1 AND n_late = 1`, replacing both EXISTS
    probes.  Everything is max/sum — whole-stage codegen HashAggregates
    with map-side partials, no ObjectHashAggregate (collect_set would
    force one).  The oracle states the textbook double-EXISTS form —
    the hash match proves the rewrite.  At 100 TB this is one scan of
    lineitem and orderkey-local shuffles instead of three self-join
    shuffles."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("late", F.col("l_shipdate") > F.date_add("o_orderdate", 60))
    )
    per_pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("late")
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum(F.when(F.col("late"), 1).otherwise(0)).alias("n_late"),
        F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias("late_supp"),
    )
    sole = (
        per_order.where((F.col("n_late") == 1) & (F.col("n_supp") > 1))
        .select(F.col("late_supp").alias("s_suppkey_q"))
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        sole.join(F.broadcast(s), F.col("s_suppkey_q") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


Q21_SQL = """
WITH late AS (
    SELECT l_orderkey, l_suppkey
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY 1, 2
)
SELECT s_name, COUNT(*) AS numwait
FROM supplier s
JOIN late l1 ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


# --- TPC-H Q22: dormant high-balance customers ------------------------------

def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 adapted (no phone country codes — segments group instead):
    customers with above-average positive account balance and no urgent
    order on file, per market segment.  (Plain "no orders at all" is
    empty in this synthetic data — every customer has orders — so the
    correlated predicate keeps a filter, like Q22's phone-code IN list.)

    Through the SQL front-end so Catalyst handles both subqueries: the
    scalar AVG folds into the filter as a literal (one tiny extra job),
    the NOT EXISTS decorrelates to a left-anti hash join on custkey.
    DataFrames bind as SQL parameters — no temp-view catalog state.
    At 100 TB the anti join shuffles only custkeys from the orders
    side."""
    return spark.sql(
        """
        SELECT c_mktsegment,
               COUNT(*) AS n_cust,
               ROUND(SUM(c_acctbal), 2) AS total_bal
        FROM {customer} c
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM {customer}
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM {orders} o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
        """,
        customer=_t(spark, sf_dir, "customer"),
        orders=_t(spark, sf_dir, "orders"),
    )


Q22_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_cust, ROUND(SUM(c_acctbal), 2) AS total_bal
FROM customer c
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


# --- TPC-H Q11 (partsupp-free): important parts by supplied value -----------

def _q11_frames(spark: SparkSession, sf_dir: str):
    """Q11's shape without the partsupp table the testdata lacks
    (reference has no relational surface at all): per-part supplied
    value from lineitem restricted to NATION_1's suppliers, keeping
    parts whose value exceeds 0.1% of the filtered total (Q11's
    group-by + global-scalar HAVING structure, value = sum of
    discounted extended price instead of supplycost*availqty).

    Scale shape: the supplier-side filter broadcasts (nation 25 rows ->
    filtered suppliers still tiny), so lineitem never shuffles for the
    dimension join; one partial+final agg on l_partkey; the HAVING
    scalar is a second full agg over the SAME grouped result, which
    Spark computes off the grouped frame (reused, not a rescan of the
    fact), then folds into a literal filter.

    Returns (per_part_cached, filtered_lazy); the CALLER must unpersist
    per_part after consuming filtered."""
    n = _t(spark, sf_dir, "nation")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name") == "NATION_1")
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    # cache the |parts|-sized aggregate: the scalar total AND the final
    # filter both read it, so lineitem is scanned exactly once.  The
    # cached frame is key+double per part — small at any fact scale.
    per_part = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "_value"
            )
        )
        .cache()
    )
    total = per_part.agg(F.sum("_value")).collect()[0][0]
    filtered = (
        per_part.where(F.col("_value") > 0.001 * F.lit(total))
        .select("l_partkey", F.round("_value", 2).alias("value"))
        .orderBy(F.desc("value"), "l_partkey")
    )
    return per_part, filtered


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entry for the Q11 shape: materializes the filtered result
    off the cache, then releases it — repeated catalog runs in one
    long-lived session must not accumulate executor storage.  The plan
    property (single fact scan + InMemoryTableScan reuse) is pinned in
    tests/test_scale_smoke.py against _q11_frames' lazy output."""
    per_part, filtered = _q11_frames(spark, sf_dir)
    try:
        out = spark.createDataFrame(filtered.collect(), filtered.schema)
    finally:
        per_part.unpersist()
    return out


Q11_SQL = """
WITH per_part AS (
    SELECT l_partkey, SUM(l_extendedprice * (1 - l_discount)) AS v
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
    GROUP BY l_partkey
)
SELECT l_partkey, ROUND(v, 2) AS value
FROM per_part
WHERE v > 0.001 * (SELECT SUM(v) FROM per_part)
ORDER BY value DESC, l_partkey
"""


# --- TPC-H Q16 (partsupp-free): supplier counts per part profile ------------

def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16's shape without partsupp: distinct-supplier counts per
    (p_brand, p_size) over the part-supplier pairs lineitem witnesses,
    excluding Brand_3 parts and suppliers in deficit (s_acctbal < 0 —
    the stand-in for Q16's complaints NOT IN subquery, same anti-join
    plan shape).

    Scale shape: the excluded-supplier set is tiny -> broadcast
    left-anti join on the fact side; part broadcasts too; the only
    shuffle is the final (brand, size) count-distinct, whose
    cardinality is bounded by |parts| regardless of fact size."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_brand") != "Brand_3")
        .select("p_partkey", "p_brand", "p_size")
    )
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand_3'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


# --- data-quality validation report -----------------------------------------

def dq_validation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-quality gate a training pipeline runs before anything
    else: declarative rules (domain ranges, referential integrity,
    derived-column consistency, blank payloads) evaluated in bulk, one
    report row per rule.

    Plan shape: in-scan conditional aggregation — each table is read
    ONCE and every per-row rule on it is a count_if in the same agg
    (not one job per rule, the classic DQ-framework mistake); the one
    relational rule (lineitem -> orders FK) is a broadcast-key anti
    join counted in the same pass style.  At 100 TB the whole report
    costs approximately one scan per table."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    d = _t(spark, sf_dir, "documents")

    def report(df: DataFrame, rules: dict[str, F.Column]) -> DataFrame:
        aggs = [F.count("*").alias("_total")] + [
            F.count_if(cond).alias(name) for name, cond in rules.items()
        ]
        wide = df.agg(*aggs)
        frames = [
            wide.select(
                F.lit(name).alias("rule"),
                F.col(name).alias("violations"),
                F.col("_total").alias("total"),
            )
            for name in rules
        ]
        out = frames[0]
        for fr in frames[1:]:
            out = out.unionAll(fr)
        return out

    orders_r = report(o, {"orders_nonpositive_total": F.col("o_totalprice") <= 0})
    li_r = report(
        li,
        {
            "lineitem_discount_out_of_range": (F.col("l_discount") < 0)
            | (F.col("l_discount") > 0.5),
            "lineitem_nonpositive_qty": F.col("l_quantity") <= 0,
        },
    )
    cust_r = report(c, {"customer_negative_balance": F.col("c_acctbal") < 0})
    docs_r = report(
        d,
        {
            "documents_blank_text": F.length(F.trim("text")) == 0,
            "documents_nchars_mismatch": F.col("n_chars") != F.length("text"),
        },
    )
    orphans = (
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count("*").alias("violations"))
        .crossJoin(li.agg(F.count("*").alias("total")))
        .select(F.lit("lineitem_orphan_orderkey").alias("rule"), "violations", "total")
    )
    return (
        orders_r.unionAll(li_r)
        .unionAll(cust_r)
        .unionAll(docs_r)
        .unionAll(orphans)
        .select("rule", "violations", "total", (F.col("violations") == 0).alias("passed"))
        .orderBy("rule")
    )


DQ_SQL = """
WITH r AS (
  SELECT 'orders_nonpositive_total' AS rule,
         COUNT(*) FILTER (WHERE o_totalprice <= 0) AS violations,
         COUNT(*) AS total FROM orders
  UNION ALL
  SELECT 'lineitem_discount_out_of_range',
         COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.5), COUNT(*)
  FROM lineitem
  UNION ALL
  SELECT 'lineitem_nonpositive_qty',
         COUNT(*) FILTER (WHERE l_quantity <= 0), COUNT(*) FROM lineitem
  UNION ALL
  SELECT 'customer_negative_balance',
         COUNT(*) FILTER (WHERE c_acctbal < 0), COUNT(*) FROM customer
  UNION ALL
  SELECT 'documents_blank_text',
         COUNT(*) FILTER (WHERE length(trim(text)) = 0), COUNT(*) FROM documents
  UNION ALL
  SELECT 'documents_nchars_mismatch',
         COUNT(*) FILTER (WHERE n_chars <> length(text)), COUNT(*) FROM documents
  UNION ALL
  SELECT 'lineitem_orphan_orderkey',
         (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
         (SELECT COUNT(*) FROM lineitem)
)
SELECT rule, violations, total, violations = 0 AS passed FROM r ORDER BY rule
"""


# --- window distribution functions (percent_rank / cume_dist) ---------------

def window_percentile_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions over customers: percent_rank and
    cume_dist of account balance within each market segment, keeping
    each segment's top-3 percentile customers (SURVEY §2.9 coverage:
    rank/ntile/lag were pinned earlier; these are the remaining two
    ANSI window distribution functions).

    Scale shape: one hash shuffle on mktsegment + per-partition sort —
    the same single-exchange layout as every other window query here;
    the rank filter prunes to 3 rows per segment before the final sort.
    Ties: (c_acctbal desc, c_custkey asc) is a total order, so both
    engines compute identical distribution values."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
        .drop("rn")
        .orderBy("c_mktsegment", F.desc("acctbal"), "c_custkey")
    )


WINDOW_PERCENTILE_SQL = """
SELECT c_mktsegment, c_custkey, acctbal, pct_rank, cume FROM (
  SELECT c_mktsegment, c_custkey,
         ROUND(c_acctbal, 2) AS acctbal,
         ROUND(percent_rank() OVER w, 6) AS pct_rank,
         ROUND(cume_dist() OVER w, 6) AS cume,
         ROW_NUMBER() OVER w AS rn
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
)
WHERE rn <= 3
ORDER BY c_mktsegment, acctbal DESC, c_custkey
"""


# --- TPC-H Q17: small-quantity-order revenue --------------------------------

def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 adapted (this schema has no p_container, so the filter is
    brand-only): average yearly revenue lost if small-quantity orders
    for Brand#4 parts were not filled — lineitems whose quantity is
    below 0.2x THAT part's average quantity, summed and divided by 7.

    TPC-H states the threshold as a correlated scalar subquery per
    part; the scale-correct plan is one lineitem scan computing every
    per-part average at once (map-side-combined HashAggregate on the
    pre-filtered brand parts), then the ~|brand parts|-row threshold
    table BROADCASTS back onto lineitem — no correlated re-scan, no
    shuffle of the fact side beyond the one partial agg.  Revenue sums
    as decimal (exact, commutative) before the final divide so the
    6-dp round is shuffle-order-proof; the 0.2 factor is written as an
    explicit DOUBLE cast on both engines (a bare 0.2 is DECIMAL in
    DuckDB)."""
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#4")
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    branded = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thr = branded.groupBy("l_partkey").agg(
        (F.lit(0.2).cast("double") * F.avg("l_quantity")).alias("lim")
    )
    small = branded.join(
        F.broadcast(thr.withColumnRenamed("l_partkey", "t_partkey")),
        F.col("l_partkey") == F.col("t_partkey"),
    ).where(F.col("l_quantity") < F.col("lim"))
    return small.agg(
        F.count("*").alias("n_small"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(38,18)"))
            .cast("double")
            / 7.0,
            6,
        ).alias("avg_yearly"),
    )


Q17_SQL = """
WITH p AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#4'),
branded AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN p ON p_partkey = l_partkey),
thr AS (
  SELECT l_partkey, CAST(0.2 AS DOUBLE) * AVG(l_quantity) AS lim
  FROM branded GROUP BY l_partkey)
SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,18))) AS DOUBLE)
             / 7.0, 6) AS avg_yearly
FROM branded b JOIN thr ON thr.l_partkey = b.l_partkey
WHERE b.l_quantity < thr.lim
"""
