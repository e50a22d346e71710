"""Invariant tests for pipeline batch 18 (plans/pipeline_queries8.py):
data-selection / governance operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from kmeans_mapreduce_spark.plans import pipeline_queries8 as PQ8


def test_dsir_select_scores_only_raw_docs(spark, sf_dir):
    rows = PQ8.pipeline_dsir_select(spark, sf_dir).collect()
    assert 0 < len(rows) <= PQ8._DSIR_TOPK
    # descending by weight, doc_id tiebreak
    weights = [r["dsir_weight"] for r in rows]
    assert weights == sorted(weights, reverse=True)
    # target-domain docs are the reference sample, never candidates
    target_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("source").isin(*PQ8._DSIR_TARGET))
        .select("doc_id")
        .collect()
    }
    assert not ({r["doc_id"] for r in rows} & target_ids)
    assert all(r["n_feats"] > 0 for r in rows)


def test_bloom_probe_soundness(spark, sf_dir):
    """A Bloom filter never false-negatives: every exact duplicate
    must be bloom-positive, so bloom_pos == true_dup + false_pos
    exactly, per source."""
    rows = PQ8.dedup_bloom_probe(spark, sf_dir).collect()
    assert rows, "probe split empty"
    for r in rows:
        assert r["n_bloom_pos"] == r["n_true_dup"] + r["n_false_pos"], r
        assert 0 <= r["n_bloom_pos"] <= r["n_probed"], r
        assert (r["n_false_pos"] == 0) == (r["fp_id_sum"] == 0), r


def test_curriculum_stages_partition_and_order(spark, sf_dir):
    rows = PQ8.pipeline_curriculum_stages(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    # NTILE balance: stage sizes differ by at most 1
    sizes = {}
    for r in rows:
        sizes[r["stage"]] = sizes.get(r["stage"], 0) + r["n_docs"]
    assert set(sizes) == set(range(1, PQ8._N_STAGES + 1))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # difficulty bands are monotone across stages (ties may straddle)
    lo = {s: min(r["min_difficulty"] for r in rows if r["stage"] == s) for s in sizes}
    hi = {s: max(r["max_difficulty"] for r in rows if r["stage"] == s) for s in sizes}
    for s in range(1, PQ8._N_STAGES):
        assert hi[s] <= lo[s + 1] + 1, (s, hi[s], lo[s + 1])


def test_int8_quant_error_bound(spark, sf_dir):
    """Reconstruction error is bounded by one quantization step:
    (max-min)/255 per dimension; the corpus-wide bound uses the widest
    dimension."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    elems = emb.select(F.posexplode("embedding").alias("dim", "v")).select(
        "dim", F.col("v").cast("double").alias("v")
    )
    widest = (
        elems.groupBy("dim")
        .agg((F.max("v") - F.min("v")).alias("rng"))
        .agg(F.max("rng"))
        .first()[0]
    )
    step = widest / 255
    rows = PQ8.embedding_int8_quant(spark, sf_dir).collect()
    n_vecs = emb.count()
    assert sum(r["n_elems"] for r in rows) == n_vecs * 64
    for r in rows:
        assert 0 <= r["mean_abs_err"] <= r["max_abs_err"]
        assert r["max_abs_err"] <= step + 1e-9, (r, step)
        assert r["q_mass"] >= 0 and r["q_pos_checksum"] >= 0


def test_k_anonymity_accounting(spark, sf_dir):
    rows = PQ8.privacy_k_anonymity(spark, sf_dir).collect()
    total = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert sum(r["suppressed_rows"] + r["released_rows"] for r in rows) == total
    for r in rows:
        # suppressed groups are strictly under k; released at or over
        assert r["suppressed_rows"] <= r["suppressed_groups"] * (PQ8._K_ANON - 1)
        kept_groups = r["n_groups"] - r["suppressed_groups"]
        assert r["released_rows"] >= kept_groups * PQ8._K_ANON


def test_quality_classifier_splits_corpus(spark, sf_dir):
    rows = PQ8.pipeline_quality_classifier(spark, sf_dir).collect()
    total = sum(r["n_docs"] for r in rows)
    kept = sum(r["n_kept"] for r in rows)
    assert 0 < kept < total, f"degenerate split {kept}/{total}"
    for r in rows:
        assert (r["n_kept"] == 0) == (r["kept_id_sum"] == 0), r


def test_bloom_broadcasts_bit_relation(spark, sf_dir):
    """The filter's set-bit side (<= m rows by construction) must ride
    a broadcast join — the property that keeps probing map-side at any
    corpus size."""
    plan = (
        PQ8.dedup_bloom_probe(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
