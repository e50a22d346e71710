"""Runtime bloom-filter join pruning: evidence for the session.py claim.

Spark's InjectRuntimeFilter rewrites `fact JOIN selective-dim` into
`fact WHERE might_contain(bloom(dim.keys)) JOIN dim`, shrinking the
fact-side shuffle before it happens.  The defaults only arm it for
big inputs (applicationSideScanSizeThreshold = 10 GiB), so at test
scale we lower the thresholds to prove the rewrite + its correctness;
at the claimed 100 TB posture the defaults arm themselves.
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def bloom_conf(spark):
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
    }
    saved = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _join(spark, sf_dir):
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        "o_orderpriority = '1-URGENT'"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
    )


def test_bloom_filter_injected_and_correct(spark, sf_dir, bloom_conf):
    df = _join(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" in plan, plan[:2000]
    assert "might_contain" in plan, plan[:2000]
    with_bloom = df.collect()

    # same query with the rewrite disarmed must agree bit-for-bit
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
    )
    try:
        control_df = _join(spark, sf_dir)
        control_plan = control_df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" not in control_plan
        assert with_bloom == control_df.collect()
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
