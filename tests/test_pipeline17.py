"""Round-11 batch 33: the oracle-replayable stump trainer.

The catalog queries are hash-checked against DuckDB by the driver and
compare.py; these tests pin the SEARCH SEMANTICS on hand-built
fixtures — exact error counts for both orientations, the
(n_err, j, theta) tie-break, zero-count handling — plus the
feature-frame contracts and that the search genuinely recovers a
planted rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from kmeans_mapreduce_spark.plans.pipeline_queries17 import (
    _ST_D,
    _ST_RATIO_J,
    _stump_features,
    _stump_search,
)


def _fx(spark, rows):
    """rows: (doc_id, y, j, v) — a tiny dense frame for one feature."""
    return spark.createDataFrame(rows, "doc_id long, y int, j int, v long")


def test_stump_errors_by_hand(spark):
    """One feature, values 1/2/3 with labels -,-,+ :
    theta=3 with ge_is_pos separates perfectly; the search must score
    every (theta, orientation) pair exactly as hand-counted."""
    fx = _fx(
        spark,
        [(1, -1, 0, 1), (2, -1, 0, 2), (3, 1, 0, 3)],
    )
    got = {
        (r["theta"], r["ge_is_pos"]): (r["n_err"], r["rank"])
        for r in _stump_search(fx).collect()
    }
    # candidates: theta=1 (ge: all + -> 2 err; lt: none below -> 1 err)
    #             theta=2 (ge: [2,3]+ -> 1 err; lt: 2 err)
    #             theta=3 (ge: [3]+ -> 0 err)  <- winner
    assert got[(3, True)] == (0, 1)
    assert got[(2, True)][0] == 1
    assert got[(1, False)][0] == 1


def test_stump_tiebreak_is_deterministic(spark):
    """Two features with identical best error counts: the ranking must
    break ties by (n_err, j, theta) — lowest feature id, then lowest
    threshold."""
    rows = []
    for j in (0, 1):
        rows += [(10 + i, 1 if i >= 2 else -1, j, i) for i in range(4)]
    out = _stump_search(_fx(spark, rows)).where(F.col("rank") == 1).collect()
    assert len(out) == 1
    assert out[0]["j"] == 0 and out[0]["theta"] == 2
    assert out[0]["n_err"] == 0


def test_stump_search_recovers_planted_rule(spark):
    """A planted rule on feature 3 (v >= 50) among noise features must
    be recovered exactly by the search."""
    import random

    rng = random.Random(7)
    rows = []
    for d in range(120):
        # pin one sample at exactly 50 so the boundary value is an
        # observed candidate and the recovered theta is exact
        v3 = 50 if d == 0 else rng.randrange(0, 100)
        y = 1 if v3 >= 50 else -1
        for j in range(5):
            rows.append(
                (d, y, j, v3 if j == 3 else rng.randrange(0, 100))
            )
    best = (
        _stump_search(_fx(spark, rows)).where(F.col("rank") == 1).collect()[0]
    )
    assert best["j"] == 3 and best["n_err"] == 0 and best["ge_is_pos"]
    assert best["theta"] == 50


def test_stump_features_contract(spark, sf_dir):
    """Dense frame: every doc contributes exactly _ST_D rows (zeros
    materialized), the ratio feature is bounded [0, 1024], labels are
    +-1 with both classes present."""
    fx = _stump_features(spark, sf_dir).cache()
    try:
        n_docs = fx.select("doc_id").distinct().count()
        assert fx.count() == n_docs * _ST_D
        r = fx.where(F.col("j") == _ST_RATIO_J).agg(
            F.min("v").alias("lo"), F.max("v").alias("hi")
        ).collect()[0]
        assert 0 <= r["lo"] and r["hi"] <= 1024
        ys = {x["y"] for x in fx.select("y").distinct().collect()}
        assert ys == {1, -1}
    finally:
        fx.unpersist()


def test_stump_search_plan_shape(spark, sf_dir):
    """The prefix-sum windows are feature-partitioned (bounded
    per-feature partitions); only the final candidate ranking — a
    |features| x |distinct values| frame, corpus-size independent —
    is a global window (audited in test_plan_hygiene's allowlist)."""
    plan = (
        _stump_search(_stump_features(spark, sf_dir))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "windowspecdefinition(j" in plan  # prefix sums partition by j
    assert plan.count("Window") >= 2  # prefix windows + candidate rank
