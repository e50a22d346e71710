"""Skew mitigation: salted join equivalence + AQE skew-join splitting."""

import pytest
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed_pair(spark):
    # fact: one hot key (0) with 50k rows, 99 cold keys with 50 each
    hot = spark.range(50_000).select(
        F.lit(0).alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    cold = spark.range(99 * 50).select(
        (F.col("id") % 99 + 1).alias("k"), F.col("id").cast("double").alias("v")
    )
    fact = hot.unionAll(cold)
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )
    return fact, dim


def test_salted_join_equals_plain_inner(spark, skewed_pair):
    fact, dim = skewed_pair
    got = salted_join(fact, dim, "k", salt_buckets=8)
    want = fact.join(dim, "k")
    assert got.count() == want.count()
    g = got.groupBy("k", "label").agg(
        F.count("*").alias("n"), F.round(F.sum("v"), 6).alias("s")
    )
    w = want.groupBy("k", "label").agg(
        F.count("*").alias("n"), F.round(F.sum("v"), 6).alias("s")
    )
    assert sorted(map(tuple, g.collect())) == sorted(map(tuple, w.collect()))


def test_salted_join_left_keeps_unmatched(spark, skewed_pair):
    fact, dim = skewed_pair
    sparse_dim = dim.where(F.col("k") < 50)
    got = salted_join(fact, sparse_dim, "k", salt_buckets=8, how="left")
    want = fact.join(sparse_dim, "k", "left")
    assert got.count() == want.count()
    assert (
        got.where(F.col("label").isNull()).count()
        == want.where(F.col("label").isNull()).count()
    )


def test_aqe_splits_skewed_smj(spark):
    """AQE's skew-join handling must kick in on a hot-key sort-merge
    join once partition-size thresholds are tuned to the data scale.

    Notes that generalize to real clusters: the inspected plan must be
    the ACTION'S QueryExecution (collect on the joined frame itself —
    count()/write() build fresh executions whose AQE state isn't
    visible on the frame), and forceOptimizeSkewedJoin lets the split
    proceed even when it adds a shuffle elsewhere."""
    hot = spark.range(200_000).select(
        F.lit(0).alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    cold = spark.range(99 * 50).select(
        (F.col("id") % 99 + 1).alias("k"), F.col("id").cast("double").alias("v")
    )
    fact = hot.unionAll(cold)
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # dim doubled so neither side broadcasts.  The incompressible v
        # column must stay in the output: pruning it lets shuffle
        # compression collapse the constant-key hot partition below the
        # skew threshold (a constant column compresses ~to nothing)
        joined = fact.join(dim.unionAll(dim), "k")
        joined.collect()
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
