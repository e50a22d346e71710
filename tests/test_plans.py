"""Physical-plan shape regression tests.

PLANS.md documents the plans we audited by hand; these tests pin the
load-bearing properties so a refactor can't silently regress them:
filters reaching the parquet scan, column pruning, dimension-side
broadcasts, TakeOrderedAndProject for global top-k, and the shuffle
count of the decorrelated-subquery window form.

All assertions run on explain("formatted") TEXT — no execution, so the
whole module is seconds, not minutes.
"""

import io
from contextlib import redirect_stdout

import pytest

from kmeans_mapreduce_spark.plans.catalog import QUERIES


def plan_of(spark, sf_dir, name: str) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        QUERIES[name](spark, sf_dir).explain("formatted")
    return buf.getvalue()


def test_q1_pushdown_and_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the 16-column lineitem scan must read only the 7
    # referenced columns — l_orderkey in ReadSchema would mean pruning broke
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read_schema
    assert "l_returnflag" in read_schema


def test_q6_all_filters_pushed(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q6_forecast_revenue")
    for pushed in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
    ):
        assert pushed in plan, f"filter not pushed to scan: {pushed}"


@pytest.mark.parametrize("name", ["q3_shipping_priority", "q5_local_supplier"])
def test_dim_tables_broadcast(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "BroadcastHashJoin" in plan
    # no dimension table may fall back to a shuffle (sort-merge) join
    assert "SortMergeJoin" not in plan


def test_semi_anti_join_strategies(spark, sf_dir):
    semi = plan_of(spark, sf_dir, "join_semi_urgent_customers")
    anti = plan_of(spark, sf_dir, "join_anti_no_urgent")
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_topk_is_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "topk_orders_global")
    assert "TakeOrderedAndProject" in plan
    # a global Sort node would mean the full-sort plan regressed in
    assert "Exchange rangepartitioning" not in plan


def test_subquery_decorrelates_to_one_data_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "subq_small_quantity_revenue")
    assert "Window" in plan
    # exactly 2 exchanges: hash(l_partkey) for the window + the
    # single-row final-agg gather; a join-based form would add a third
    assert plan.count("(Exchange") <= 2 or plan.count("Exchange (") <= 2
    n_exchanges = sum(
        1 for ln in plan.splitlines() if ln.strip().startswith("(") and "Exchange" in ln
    )
    assert n_exchanges <= 2, f"expected <=2 exchanges, plan has {n_exchanges}"


def test_asof_single_window_no_pair_blowup(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "asof_events_orders")
    # the union+window as-of must never plan a nested-loop pair join
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_exists_decorrelates_to_semi_anti(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "subq_exists_parts")
    # EXISTS / NOT EXISTS must become hash joins, never per-row subqueries
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_scalar_subquery_stays_subquery(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "subq_scalar_threshold")
    # the AVG threshold is a one-shot scalar subquery folded into the
    # filter, not a join against the aggregate
    assert "Subquery" in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_range_frame_window_is_partitioned(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "window_range_frame")
    assert "Window" in plan
    # partitioned by customer — a single-partition global window would
    # show Exchange SinglePartition before the Window node
    assert "hashpartitioning(o_custkey" in plan


def test_multiset_ops_use_generate_not_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "set_multiset_priorities")
    # Spark plans EXCEPT/INTERSECT ALL as count-aggregate + Generate
    # (replicate_rows), linear in input — never a pairwise join of any
    # strategy (hash, sort-merge, or cartesian)
    assert "Generate" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_top_tokens_is_take_ordered_after_explode(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "array_top_tokens")
    assert "Generate" in plan  # explode fans out inside the scan stage
    assert "TakeOrderedAndProject" in plan


def test_q10_star_join_broadcasts_and_takes_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q10_returned_revenue")
    # returnflag filter must reach the fact scan
    assert "EqualTo(l_returnflag,R)" in plan
    # nation (25 rows) must broadcast; top-20 must not global-sort
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_q4_exists_is_semi_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q4_late_shipments")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_higher_order_arrays_stay_codegen_map_stage(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "array_higher_order")
    # pure map over the scan: lambda functions must not force a shuffle
    # or leave whole-stage codegen for a Python evaluator
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_global_sort_uses_range_partitioning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "sort_global_daily")
    # distributed total order: range exchange + local sorts, never a
    # single-partition gather-then-sort
    assert "rangepartitioning" in plan
    assert "Exchange SinglePartition" not in plan


def test_histogram_single_aggregation(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "hist_order_values")
    # one partial/final agg pair over the scan: exactly one exchange
    n_exchanges = sum(
        1 for ln in plan.splitlines() if ln.strip().startswith("(") and "Exchange" in ln
    )
    assert n_exchanges == 1, f"expected 1 exchange, got {n_exchanges}"


def test_q7_nation_pair_filter_prunes_before_fact_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q7_volume_shipping")
    # the nation-pair filter must reach the supplier/customer side as a
    # broadcast build, never a cartesian of facts × nations
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # n_name IN (...) applies to the 25-row nation scan, pre-join
    assert "In(n_name" in plan


def test_q8_promo_filter_pushes_to_part_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q8_market_share")
    assert "EqualTo(p_type,PROMO)" in plan
    assert "EqualTo(r_name,EUROPE)" in plan
    assert "BroadcastHashJoin" in plan


def test_q18_semi_filter_via_aggregate_before_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q18_large_volume")
    # the HAVING subquery becomes an aggregate feeding the join — the
    # quantity sum must partial-aggregate map-side before its exchange
    assert "HashAggregate" in plan
    assert "TakeOrderedAndProject" in plan


def test_q21_one_lineitem_scan_no_self_joins(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q21_sole_late_supplier")
    # the double-EXISTS rewrite must not reintroduce self-joins:
    # lineitem is scanned exactly once (textbook Q21 scans it 3×)
    assert plan.count("lineitem.parquet") == 1
    # all aggregates stay codegen'd — collect_set/countDistinct would
    # show up as ObjectHashAggregate
    assert "ObjectHashAggregate" not in plan
    assert "CartesianProduct" not in plan


def test_q22_not_exists_is_anti_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q22_dormant_customers")
    assert "LeftAnti" in plan
    # the scalar AVG subquery stays a subquery, not a join
    assert "Subquery" in plan


def test_q2_correlated_min_is_window_not_self_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q2_min_cost_supplier")
    # the correlated per-part MIN must be the window form over the
    # aggregated frame — one lineitem scan, no fact self-join
    assert plan.count("lineitem.parquet") == 1
    assert "Window" in plan
    # region→nation→supplier prune broadcasts; final top-100 is a
    # TakeOrderedAndProject, never a global sort of the full frame
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_q9_part_filter_prunes_fact_before_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q9_nation_profit")
    # the 'red' name filter must reach the part parquet scan
    assert "StringContains(p_name,red)" in plan
    # all dimension sides broadcast: part, supplier, nation
    assert plan.count("BroadcastExchange") >= 3
    # (nation, year) agg partial-aggregates map-side
    assert "partial_sum" in plan


def test_q12_shipdate_range_pushes_to_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q12_priority_shipping")
    # the year filter is stated as a range so it reaches the scan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan
    assert "partial_sum" in plan


def test_q20_semi_join_and_pushed_range(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q20_dominant_suppliers")
    assert "LeftSemi" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    # one lineitem scan: per-part total comes from a window over the
    # aggregated frame, not a second scan
    assert plan.count("lineitem.parquet") == 1
