"""Invariant tests for pipeline batch 19 (plans/pipeline_queries9.py):
corpus-statistics operators for training-data planning."""

from __future__ import annotations

from pyspark.sql import functions as F

from kmeans_mapreduce_spark.plans import pipeline_queries9 as PQ9


def test_ngram_novelty_accounting(spark, sf_dir):
    rows = PQ9.docs_ngram_novelty(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["novel_occurrences"] or r["gram_occurrences"] >= 0
        assert r["novel_occurrences"] <= r["gram_occurrences"], r
        assert 0.0 <= r["novelty_ratio"] <= 1.0
    # every distinct gram has exactly ONE first sight: summing novel
    # occurrences across sources equals the global distinct gram count
    total_novel = sum(r["novel_occurrences"] for r in rows)
    from kmeans_mapreduce_spark.functions import text as TXT

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = TXT.tokens("text")
    n_grams = (
        d.select(
            F.explode(
                F.when(
                    F.size(toks) >= PQ9._NOV_N,
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - (PQ9._NOV_N - 1)),
                        lambda i: F.concat_ws(" ", F.slice(toks, i, PQ9._NOV_N)),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("g")
        )
        .select("g")
        .distinct()
        .count()
    )
    assert total_novel == n_grams


def test_token_budget_epochs_conservation(spark, sf_dir):
    rows = PQ9.pipeline_token_budget_epochs(spark, sf_dir).collect()
    total_avail = sum(r["available"] for r in rows)
    total_target = sum(r["target"] for r in rows)
    # targets sum to the budget up to per-source floor rounding
    budget = PQ9._BUDGET_X * total_avail
    assert budget - len(rows) * 1 <= total_target <= budget
    for r in rows:
        assert r["weight"] in (1, 2, 3)
        assert r["repeats"] == (r["target"] > r["available"])
        # epochs_milli is the ceiling of target/available in milli-units
        lo = r["target"] * 1000
        assert (r["epochs_milli"] - 1) * r["available"] < lo <= r[
            "epochs_milli"
        ] * r["available"]
    # weight-3 sources get 3x the allocation of weight-1 sources
    by_w = {}
    for r in rows:
        by_w.setdefault(r["weight"], []).append(r["target"])
    if 1 in by_w and 3 in by_w:
        assert abs(by_w[3][0] - 3 * by_w[1][0]) <= 3


def test_zipf_fit_is_decreasing_fit(spark, sf_dir):
    rows = PQ9.text_zipf_fit(spark, sf_dir).collect()
    langs = {r["lang"] for r in rows}
    assert langs == {"de", "en", "es", "fr", "zh"}
    for r in rows:
        assert r["n"] >= 2
        # frequencies are non-increasing in rank -> OLS slope <= 0
        assert r["zipf_slope"] <= 0.0, r
        # intercept is ln(freq) at rank 1 scale: must be positive
        assert r["zipf_intercept"] > 0.0, r
