"""Invariant tests for analytics pack 11 (plans/analytics11.py)."""

from __future__ import annotations

import pytest

from kmeans_mapreduce_spark.plans import analytics11 as AN11


def test_abc_partition_and_pareto_shape(spark, sf_dir):
    rows = {r["abc"]: r for r in AN11.customers_abc_classes(spark, sf_dir).collect()}
    assert set(rows) == {"A", "B", "C"}
    n_cust = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_customers"] for r in rows.values()) == n_cust
    assert sum(r["rev_share"] for r in rows.values()) == pytest.approx(
        1.0, abs=1e-4
    )
    # Pareto shape: A's revenue share ~0.80 boundary, per-class
    # average revenue strictly decreases A > B > C
    assert rows["A"]["rev_share"] <= AN11._ABC_A + 0.01
    avg = {k: r["revenue"] / r["n_customers"] for k, r in rows.items()}
    assert avg["A"] > avg["B"] > avg["C"]


def test_price_positioning_partitions_parts(spark, sf_dir):
    rows = AN11.parts_price_positioning(spark, sf_dir).collect()
    n_parts = spark.read.parquet(f"{sf_dir}/part.parquet").count()
    assert sum(r["n_parts"] for r in rows) == n_parts
    assert {r["tier"] for r in rows} <= {"premium", "core", "value"}
    # every brand has a core tier (the median itself is within ±10%)
    brands_with_core = {r["p_brand"] for r in rows if r["tier"] == "core"}
    all_brands = {r["p_brand"] for r in rows}
    assert brands_with_core == all_brands
