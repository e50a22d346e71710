"""Invariant tests for pipeline batch 20 (plans/pipeline_queries10.py):
watermark audit, DP release counts, LSH recall evaluation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kmeans_mapreduce_spark.plans import pipeline_queries10 as PQ10


def test_watermark_audit_accounting(spark, sf_dir):
    rows = PQ10.events_watermark_audit(spark, sf_dir).collect()
    assert rows
    from kmeans_mapreduce_spark.plans.relational import _events

    total = _events(spark, sf_dir).count()
    assert sum(r["n_events"] for r in rows) == total
    for r in rows:
        assert r["delivered"] + r["dropped"] == r["n_events"], r
        assert (r["dropped"] == 0) == (r["dropped_id_sum"] == 0), r
        assert 0.0 <= r["drop_rate"] <= 1.0
    # the max transport delay is 900s vs a 600s watermark: only events
    # in an hour's last 300s can miss -> corpus drop rate < 300/3600
    drop = sum(r["dropped"] for r in rows) / total
    assert drop <= 300 / 3600 + 0.01


def test_dp_noise_matches_inverse_cdf(spark, sf_dir):
    """Recompute the deterministic Laplace draw in Python and pin the
    released values to the mechanism's closed form."""
    import hashlib

    rows = PQ10.dp_noisy_counts(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    true = {r["event_type"]: r["n"] for r in ev.groupBy("event_type").count().withColumnRenamed("count", "n").collect()}
    assert {r["event_type"] for r in rows} == set(true)
    for r in rows:
        h = int(hashlib.md5(r["event_type"].encode()).hexdigest()[:4], 16)
        u = (2 * h + 1 - 65536) / 131072
        noise = -PQ10._DP_EPS_INV * math.copysign(1.0, u) * math.log(1 - 2 * abs(u))
        assert r["n"] == true[r["event_type"]]
        assert abs(r["noisy_count"] - round(true[r["event_type"]] + noise, 4)) < 1e-9
        assert r["epsilon"] == 0.5


def test_lsh_recall_bounded_and_exactly_k(spark, sf_dir):
    rows = PQ10.ann_lsh_recall(spark, sf_dir).collect()
    n_q = min(
        PQ10._RECALL_Q,
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .where(F.col("vec_id") < PQ10._RECALL_Q)
        .count(),
    )
    assert len(rows) == n_q
    for r in rows:
        assert r["k"] == PQ10._RECALL_K
        assert 0 <= r["hits"] <= r["k"]
        assert abs(r["recall"] - round(r["hits"] / r["k"], 6)) < 1e-9


def test_preference_pairs_are_valid_comparisons(spark, sf_dir):
    from kmeans_mapreduce_spark.plans.pipeline_queries10 import (
        pipeline_preference_pairs,
    )

    rows = pipeline_preference_pairs(spark, sf_dir).collect()
    assert rows, "no preference pairs mined"
    seen = set()
    for r in rows:
        key = (r["lang"], r["grp"])
        assert key not in seen, f"duplicate group {key}"
        seen.add(key)
        assert r["chosen_id"] != r["rejected_id"]
        assert r["margin"] == r["chosen_score"] - r["rejected_score"]
        assert r["margin"] >= 1
        assert r["n_docs"] >= 2


def test_tokenizer_fertility_bounds(spark, sf_dir):
    from kmeans_mapreduce_spark.plans.pipeline_queries10 import (
        text_tokenizer_fertility,
    )

    rows = text_tokenizer_fertility(spark, sf_dir).collect()
    assert {r["lang"] for r in rows} == {"de", "en", "es", "fr", "zh"}
    for r in rows:
        # a BPE-ish piece never spans whitespace: pieces >= words
        assert r["bpe_pieces"] >= r["ws_tokens"] > 0, r
        assert r["fertility"] >= 1.0
        # corpus mean can't exceed the max per-doc fertility
        assert r["fertility"] * 1000 <= r["max_doc_fert_milli"] + 1000, r


def test_span_corruption_mask_accounting(spark, sf_dir):
    from kmeans_mapreduce_spark.plans.pipeline_queries10 import (
        _SPAN_LEN,
        pipeline_span_corruption,
    )

    rows = pipeline_span_corruption(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # union of clipped spans: can't exceed starts * span_len, nor
        # the token budget
        assert r["masked_tokens"] <= r["span_starts"] * _SPAN_LEN, r
        assert r["masked_tokens"] <= r["tokens"], r
        # ~5% start rate * 3-token spans targets ~15%; generous band
        assert 0.05 <= r["mask_rate"] <= 0.30, r
