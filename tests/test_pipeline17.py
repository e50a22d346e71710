"""Round-11 batch 33: the oracle-replayable perceptron trainer.

The catalog queries are hash-checked against DuckDB by the driver and
compare.py; these tests pin the TRAINING SEMANTICS on hand-built
fixtures — the update rule, the bias-row count trick, and that the
trainer actually separates a separable corpus — plus the plan-shape
contract (broadcast weights, no data-sized collect)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.plans.pipeline_queries17 import (
    _PC_D,
    _eval_misses,
    _features,
    _fit_perceptron,
)


def _fx(spark, rows):
    """rows: (doc_id, y, {j: cnt}) — bias row added automatically."""
    out = []
    for doc_id, y, feats in rows:
        for j, cnt in feats.items():
            out.append((doc_id, y, j, cnt))
        out.append((doc_id, y, _PC_D, 1))
    return spark.createDataFrame(
        out, "doc_id long, y int, j int, cnt long"
    )


def test_perceptron_update_rule_by_hand(spark):
    """One epoch from zero weights on a two-doc fixture: every margin
    is 0 -> both docs misclassify -> w = sum(y * x), checked against
    the hand-computed vector; epoch 2's misses follow from those
    weights."""
    fx = _fx(
        spark,
        [
            (1, 1, {0: 2, 1: 1}),    # +: x = [2,1,...,bias 1]
            (2, -1, {0: 1, 3: 4}),   # -: x = [1,0,0,4,...,bias 1]
        ],
    )
    w, hist = _fit_perceptron(spark, fx)
    # epoch 1: both misclassified (margins 0); delta = y1*x1 + y2*x2
    assert hist[0][:2] == (1, 2)
    assert w[0] == 2 - 1 and w[1] == 1 and w[3] == -4 and w[_PC_D] == 0
    # under those weights doc1: 2*1+1*1=3>0 ok; doc2: -1*(1*1-4*4)=15>0 ok
    assert hist[1][:2] == (2, 0)
    assert _eval_misses(spark, fx, w) == 0
    # zero misclassified -> no further updates; checksums freeze
    assert hist[1][2] == hist[2][2] == hist[0][2]


def test_perceptron_learns_separable_fixture(spark):
    """A linearly separable 40-doc fixture (positives load bucket 0,
    negatives bucket 1) reaches zero training misses within the three
    fixed epochs."""
    rows = []
    for i in range(40):
        if i % 2:
            rows.append((i, 1, {0: 3 + i % 4, 1: 1}))
        else:
            rows.append((i, -1, {0: 1, 1: 3 + i % 5}))
    fx = _fx(spark, rows)
    w, hist = _fit_perceptron(spark, fx)
    assert _eval_misses(spark, fx, w) == 0
    assert hist[0][1] == 40  # epoch 1 sees every zero margin
    assert hist[-1][1] <= 2


def test_features_bias_and_label(spark, sf_dir):
    """Every non-blank doc carries exactly one bias row; labels are the
    integer stopword rule; bucket ids stay inside [0, D]."""
    fx = _features(spark, sf_dir).cache()
    try:
        bias = fx.where(F.col("j") == _PC_D)
        n_docs = fx.select("doc_id").distinct().count()
        assert bias.count() == n_docs
        assert bias.select("cnt").distinct().collect() == [
            bias.select("cnt").distinct().collect()[0]
        ]
        rng = fx.agg(
            F.min("j").alias("lo"), F.max("j").alias("hi")
        ).collect()[0]
        assert 0 <= rng["lo"] and rng["hi"] == _PC_D
        ys = {r["y"] for r in fx.select("y").distinct().collect()}
        assert ys <= {1, -1} and len(ys) == 2  # both classes present
    finally:
        fx.unpersist()


def test_perceptron_plan_shape(spark, sf_dir):
    """The margin pass broadcasts the 33-row weight relation — the
    corpus side never shuffles to meet the weights."""
    fx = _features(spark, sf_dir)
    wdf = spark.createDataFrame(
        [(j, 0) for j in range(_PC_D + 1)], "j int, w long"
    )
    marg = (
        fx.join(F.broadcast(wdf), "j")
        .groupBy("doc_id", "y")
        .agg(F.sum(F.col("cnt") * F.col("w")).alias("s"))
    )
    plan = marg._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
