"""Batch-17 invariants: canonicalization idempotence, n-gram window
counts, contamination bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from kmeans_mapreduce_spark.plans import pipeline_queries7 as PQ7


def test_canonicalization_idempotent(spark, sf_dir):
    """canon(canon(x)) == canon(x) — a normalizer that isn't idempotent
    dedups differently depending on how many times a pipeline ran it."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    once = PQ7._canon(F.col("text"))
    twice = PQ7._canon(once)
    assert d.where(once != twice).count() == 0


def test_canonical_distincts_bounded(spark, sf_dir):
    """Canonical fingerprints can only collapse docs: distinct_canon <=
    distinct_raw <= n_docs, and dup counters are consistent."""
    rows = PQ7.dedup_canonical_exact(spark, sf_dir).collect()
    assert rows, "per-source report must be non-empty"
    for r in rows:
        assert r["distinct_canon"] <= r["distinct_raw"] <= r["n_docs"]
        assert r["raw_dups"] == r["n_docs"] - r["distinct_raw"]
        assert r["canon_dups"] == r["n_docs"] - r["distinct_canon"]


def test_ngram_contamination_bounds(spark, sf_dir):
    """hit_grams <= eval_grams; contaminated docs <= eval docs; and a
    doc counted contaminated iff it contributed >= 1 hit gram."""
    rows = PQ7.pipeline_ngram_contamination(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["hit_grams"] <= r["eval_grams"]
        assert 0 <= r["n_contaminated_docs"] <= r["n_eval_docs"]
        if r["n_contaminated_docs"] == 0:
            assert r["hit_grams"] == 0 and r["contaminated_id_sum"] == 0
        else:
            assert r["hit_grams"] > 0 and r["contaminated_id_sum"] > 0


def test_ngram_window_count(spark, sf_dir):
    """A doc with t >= 5 tokens has t-4 windows before the per-doc
    distinct — pin the fan-out arithmetic on a constructed example."""
    df = spark.createDataFrame(
        [("a b c d e f g",), ("a b",)], "text string"
    )
    from kmeans_mapreduce_spark.functions.text import tokens

    toks = tokens("text")
    grams = df.select(
        F.size(
            F.when(
                F.size(toks) >= 5,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 4),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, 5)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("n")
    ).collect()
    assert sorted(r["n"] for r in grams) == [0, 3]  # 7 tokens -> 3; 2 -> 0
