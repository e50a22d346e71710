"""Round-4 pipeline operators, third batch: shard export, stratified
sampling, dataset cards, BPE pair induction, cluster representatives,
char entropy, sweep-line concurrency."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _no_nested_loop(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def _n_docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").count()


def test_shuffle_shards_partition(spark, sf_dir):
    """Shards partition the corpus: disjoint by construction (hash mod),
    counts sum to the corpus, every shard id in range."""
    from kmeans_mapreduce_spark.plans.pipeline_queries4 import (
        _N_SHARDS,
        pipeline_shuffle_shards,
    )

    df = pipeline_shuffle_shards(spark, sf_dir)
    _no_nested_loop(df)
    rows = df.collect()
    assert sum(r["n_docs"] for r in rows) == _n_docs(spark, sf_dir)
    for r in rows:
        assert 0 <= r["shard"] < _N_SHARDS
        assert r["total_chars"] > 0
        assert r["order_checksum"] > 0


def test_shuffle_shards_deterministic(spark, sf_dir):
    from kmeans_mapreduce_spark.plans.pipeline_queries4 import (
        pipeline_shuffle_shards,
    )

    a = pipeline_shuffle_shards(spark, sf_dir).collect()
    b = (
        pipeline_shuffle_shards(spark, sf_dir)
        .repartition(7)  # order must not depend on partitioning
        .orderBy("shard")
        .collect()
    )
    assert a == sorted(b, key=lambda r: r["shard"])


def test_stratified_sample_exact_quota(spark, sf_dir):
    from kmeans_mapreduce_spark.plans.pipeline_queries4 import (
        _STRAT_FRAC,
        pipeline_stratified_sample,
    )

    rows = pipeline_stratified_sample(spark, sf_dir).collect()
    by_lang = {
        r["lang"]: r["cnt"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("lang")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert {r["lang"] for r in rows} == set(by_lang)
    for r in rows:
        assert r["n_total"] == by_lang[r["lang"]]
        assert r["n_sampled"] == math.ceil(_STRAT_FRAC * r["n_total"])
        assert r["id_checksum"] > 0


def test_dataset_card_totals(spark, sf_dir):
    from kmeans_mapreduce_spark.plans.pipeline_queries4 import (
        pipeline_dataset_card,
    )

    df = pipeline_dataset_card(spark, sf_dir)
    rows = df.collect()
    assert sum(r["n_docs"] for r in rows) == _n_docs(spark, sf_dir)
    for r in rows:
        assert r["total_tokens"] > 0
        assert 0 <= r["n_dup_docs"] < r["n_docs"]
        assert 0.0 <= r["mean_quality"] <= 1.0
        assert 1 <= r["n_langs"] <= 5


def test_bpe_pair_counts_ranked(spark, sf_dir):
    from kmeans_mapreduce_spark.plans.pipeline_queries4 import (
        _TOP_PAIRS,
        pipeline_bpe_pair_counts,
    )

    rows = pipeline_bpe_pair_counts(spark, sf_dir).collect()
    assert 0 < len(rows) <= _TOP_PAIRS
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        # whitespace tokens cannot contain whitespace -> exactly 2 halves
        assert len(r["pair"].split(" ")) == 2


def test_bpe_pair_counts_hand_check(spark):
    """Pair frequencies on a 2-doc corpus, checked by hand."""
    from kmeans_mapreduce_spark.functions import text as TXT

    d = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, ""), (4, "solo")],
        "doc_id long, text string",
    )
    toks = TXT.tokens("text")
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    got = {
        r["pair"]: r["n"]
        for r in d.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == {"a b": 3, "b a": 1}


def test_cluster_representatives_vs_components(spark, sf_dir):
    """Audit rows must agree with the components + quality stages they
    compose: member counts, checksums, and the max-quality winner."""
    from kmeans_mapreduce_spark.functions import text as TXT
    from kmeans_mapreduce_spark.operators import dedup as DD
    from kmeans_mapreduce_spark.operators.components import (
        connected_components,
    )
    from kmeans_mapreduce_spark.plans.pipeline_queries4 import (
        dedup_cluster_representatives,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = DD.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.8)
    comp = {
        r["id"]: r["component"] for r in connected_components(pairs).collect()
    }
    quality = {
        r["doc_id"]: r["q"]
        for r in docs.select(
            "doc_id", F.round(TXT.quality_score("text"), 6).alias("q")
        ).collect()
    }
    members: dict[int, list[int]] = {}
    for doc, c in comp.items():
        members.setdefault(c, []).append(doc)

    audit = dedup_cluster_representatives(spark, sf_dir)
    _no_nested_loop(audit)
    rows = audit.collect()
    assert {r["component"] for r in rows} == set(members)
    for r in rows:
        ms = members[r["component"]]
        assert r["n_members"] == len(ms)
        assert r["member_checksum"] == sum(ms)
        best_q = max(quality[m] for m in ms)
        winners = [m for m in ms if quality[m] == best_q]
        assert r["representative"] == min(winners)
        assert r["rep_quality"] == best_q


def test_char_entropy_hand_check(spark):
    """floor-bucketed entropy on a corpus with known distributions:
    'aaaa' -> 0 bits, 'abab' -> 1 bit, 'abcd' -> 2 bits, '' -> 0."""
    from pyspark.sql import Window

    d = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")],
        "doc_id long, text string",
    )
    chars = d.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
    ).where(F.length("ch") > 0)
    cnt = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    per_doc = (
        cnt.withColumn("tot", F.sum("c").over(Window.partitionBy("doc_id")))
        .groupBy("doc_id")
        .agg(
            F.round(
                -F.sum(
                    (F.col("c") / F.col("tot")) * F.log2(F.col("c") / F.col("tot"))
                ),
                4,
            ).alias("entropy")
        )
    )
    got = {r["doc_id"]: r["entropy"] for r in per_doc.collect()}
    assert got == {1: 0.0, 2: 1.0, 3: 2.0}  # doc 4 has no chars -> absent


def test_char_entropy_buckets(spark, sf_dir):
    from kmeans_mapreduce_spark.plans.pipeline_queries4 import (
        text_char_entropy,
    )

    rows = text_char_entropy(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in rows) == _n_docs(spark, sf_dir)
    for r in rows:
        assert 0 <= r["entropy_bits"] <= 7  # <= 128 distinct byte symbols
        assert r["mean_chars"] >= 0


def test_concurrency_sweep_vs_bruteforce(spark, sf_dir):
    """Sweep-line peak equals the brute-force 'count overlapping
    intervals at every start instant' answer (half-open [ts, ts+300))."""
    from kmeans_mapreduce_spark.plans.pipeline_queries4 import (
        _SESSION_S,
        events_concurrency_sweep,
    )
    from kmeans_mapreduce_spark.plans.relational import _events

    ev = _events(spark, sf_dir).select("event_type", "ts").collect()
    by_type: dict[str, list] = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(r["ts"].timestamp())
    expected = {}
    for et, starts in by_type.items():
        peak = 0
        for t in starts:
            peak = max(peak, sum(1 for s in starts if s <= t < s + _SESSION_S))
        expected[et] = peak

    got = {
        r["event_type"]: r["peak_concurrency"]
        for r in events_concurrency_sweep(spark, sf_dir).collect()
    }
    assert got == expected


def test_substring_pairs_misaligned_copy(spark):
    """Content-defined selection catches a verbatim span pasted at a
    DIFFERENT offset (a strided grid would only catch aligned copies),
    and unrelated docs stay unflagged."""
    from kmeans_mapreduce_spark.operators.dedup import substring_shingle_pairs

    span = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from a sunny windowsill and the birds sing loudly in "
        "the old oak tree beside the quiet river bank all afternoon"
    )
    d = spark.createDataFrame(
        [
            (1, "AAA " + span + " tail one"),
            (2, "completely different prefix here: " + span),
            (3, "x" * 200),  # unrelated, long enough to have windows
            (4, "short"),    # below window size -> never flagged
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in substring_shingle_pairs(d, "doc_id", "text").collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert all(p == (1, 2) for p in pairs)


def test_substring_pairs_no_short_doc_windows(spark):
    from kmeans_mapreduce_spark.operators.dedup import substring_shingle_pairs

    d = spark.createDataFrame(
        [(1, "tiny"), (2, "tiny")], "doc_id long, text string"
    )
    assert substring_shingle_pairs(d, "doc_id", "text").count() == 0


def test_write_jsonl_shards_roundtrip(spark, sf_dir, tmp_path):
    import glob
    import hashlib
    import json

    from kmeans_mapreduce_spark.sources.sinks import write_jsonl_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "shards")
    manifest = write_jsonl_shards(docs, out, n_shards=4).collect()

    total = docs.count()
    assert sum(r["n_docs"] for r in manifest) == total
    back = spark.read.json(out)
    assert back.count() == total
    assert set(r["shard"] for r in manifest) == set(range(4))

    # within every shard file, rows ride in md5(doc_id) order
    for f in glob.glob(f"{out}/shard=*/part-*.json"):
        ids = [json.loads(line)["doc_id"] for line in open(f)]
        keys = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        assert keys == sorted(keys), f


def test_anomaly_mad_vs_python(spark, sf_dir):
    """Per-type MAD flags recomputed in plain Python (statistics.median
    uses the same even-count interpolation)."""
    import statistics

    from kmeans_mapreduce_spark.plans.analytics import (
        _MAD_K,
        events_anomaly_mad,
    )
    from kmeans_mapreduce_spark.plans.relational import _events

    ev = _events(spark, sf_dir).select("event_type", "event_id", "value").collect()
    by_type: dict[str, list] = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(r)
    expected = {}
    for et, rows in by_type.items():
        med = statistics.median(r["value"] for r in rows)
        mad = statistics.median(abs(r["value"] - med) for r in rows)
        anom = [r for r in rows if abs(r["value"] - med) > _MAD_K * mad]
        expected[et] = (len(rows), len(anom), sum(r["event_id"] for r in anom))

    got = {
        r["event_type"]: (r["n_events"], r["n_anomalies"], r["anomaly_checksum"])
        for r in events_anomaly_mad(spark, sf_dir).collect()
    }
    assert got == expected


def test_column_stats_vs_direct(spark, sf_dir):
    from pyspark.sql import functions as F

    from kmeans_mapreduce_spark.plans.analytics import (
        _STATS_COLS,
        table_column_stats,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = {r["column"]: r for r in table_column_stats(spark, sf_dir).collect()}
    assert set(got) == set(_STATS_COLS)
    for c in _STATS_COLS:
        direct = li.agg(
            F.count(c).alias("n"),
            F.countDistinct(c).alias("ndv"),
            F.round(F.min(c), 4).alias("mn"),
            F.round(F.max(c), 4).alias("mx"),
        ).collect()[0]
        r = got[c]
        assert (r["n"], r["ndv"], r["min"], r["max"]) == (
            direct["n"], direct["ndv"], direct["mn"], direct["mx"],
        )
        assert r["n_nulls"] == 0
        assert r["min"] <= r["mean"] <= r["max"]


def test_hybrid_rrf_consistency(spark, sf_dir):
    """Fused score must equal the RRF formula applied to the reported
    ranks, every doc carries at least one leg, and ordering is by rrf."""
    from kmeans_mapreduce_spark.plans.pipeline_queries4 import (
        _RRF_DEPTH,
        _RRF_K,
        _RRF_TOP,
        hybrid_search_rrf,
    )

    rows = hybrid_search_rrf(spark, sf_dir).collect()
    assert len(rows) == _RRF_TOP
    scores = [r["rrf"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 0 <= r["rank_lex"] <= _RRF_DEPTH
        assert 0 <= r["rank_vec"] <= _RRF_DEPTH
        assert r["rank_lex"] > 0 or r["rank_vec"] > 0
        want = 0.0
        if r["rank_lex"] > 0:
            want += 1.0 / (_RRF_K + r["rank_lex"])
        if r["rank_vec"] > 0:
            want += 1.0 / (_RRF_K + r["rank_vec"])
        assert abs(r["rrf"] - round(want, 6)) < 1e-9


def test_corpus_psi_nonnegative_and_labeled(spark, sf_dir):
    """PSI is a nonnegative divergence; labels follow the thresholds;
    the reference source never reports against itself."""
    from kmeans_mapreduce_spark.plans.pipeline_queries4 import (
        _PSI_REF,
        corpus_drift_psi,
    )

    rows = corpus_drift_psi(spark, sf_dir).collect()
    assert rows and all(r["source"] != _PSI_REF for r in rows)
    for r in rows:
        assert r["psi"] >= 0.0
        want = (
            "stable" if r["psi"] < 0.1
            else "moderate" if r["psi"] < 0.25
            else "shifted"
        )
        assert r["drift"] == want
