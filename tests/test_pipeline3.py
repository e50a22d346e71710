"""Round-4 pipeline operators: semantic dedup, k-NN graph, language
rebalancing, PII scrub, embedding stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


from conftest import assert_no_nested_loop as _no_nested_loop


def test_semantic_dedup_invariants(spark, sf_dir):
    from kmeans_mapreduce_spark.plans.pipeline_queries3 import (
        dedup_semantic_clusters,
    )

    df = dedup_semantic_clusters(spark, sf_dir)
    _no_nested_loop(df)
    rows = {r["cluster_id"]: r for r in df.collect()}
    assert sum(r["n_vectors"] for r in rows.values()) == 500
    for r in rows.values():
        assert 0 <= r["n_dropped"] < r["n_vectors"]  # a representative stays
        if r["n_dropped"] == 0:
            assert r["dropped_id_sum"] == 0


@pytest.mark.slow
def test_semantic_dedup_min_id_winner(spark, sf_dir):
    """Every cluster keeps its lowest-id member (the canonical winner
    can never be dropped: drops require a LOWER-id near-dup)."""
    from kmeans_mapreduce_spark.operators.kmeans import _dist2_to_centroids
    from kmeans_mapreduce_spark.plans.kmeans_queries import _fixed_centroids
    from kmeans_mapreduce_spark.plans.pipeline_queries import _embs
    from kmeans_mapreduce_spark.plans.pipeline_queries3 import (
        _SEM_K,
        dedup_semantic_clusters,
    )

    cents = _fixed_centroids(spark, sf_dir, k=_SEM_K)
    e = _embs(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    dists = _dist2_to_centroids("v", cents)
    min_ids = {
        r["cluster_id"]: r["m"]
        for r in e.withColumn(
            "cluster_id",
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int"),
        )
        .groupBy("cluster_id")
        .agg(F.min("vec_id").alias("m"))
        .collect()
    }
    audit = {
        r["cluster_id"]: r
        for r in dedup_semantic_clusters(spark, sf_dir).collect()
    }
    for cid, r in audit.items():
        if r["n_dropped"] > 0:
            # dropped ids sum over ids > min_id => each dropped id >= min_id+1
            assert r["dropped_id_sum"] >= r["n_dropped"] * (min_ids[cid] + 1)


def test_knn_graph_shape(spark, sf_dir):
    from kmeans_mapreduce_spark.plans.pipeline_queries3 import knn_graph_cells

    # fixture cells: the shape assertions assume every node has cellmates
    df = knn_graph_cells(spark, sf_dir, k_cells=4)
    _no_nested_loop(df, allow_centroid_cross=True)
    rows = df.collect()
    per_node: dict[int, list] = {}
    for r in rows:
        assert r["node_id"] != r["neighbor_id"]
        per_node.setdefault(r["node_id"], []).append(r)
    assert len(per_node) == 500
    for edges in per_node.values():
        edges.sort(key=lambda r: r["rank"])
        assert [e["rank"] for e in edges] == list(range(1, len(edges) + 1))
        assert len(edges) <= 3
        scores = [e["score"] for e in edges]
        assert scores == sorted(scores, reverse=True)


def test_lang_rebalance_deterministic_and_sane(spark, sf_dir):
    from kmeans_mapreduce_spark.plans.pipeline_queries3 import (
        _LANG_RATES,
        pipeline_lang_rebalance,
    )

    a = pipeline_lang_rebalance(spark, sf_dir).collect()
    b = pipeline_lang_rebalance(spark, sf_dir).collect()
    assert a == b  # reproducible: md5 buckets, not rand()
    for r in a:
        assert 0 <= r["n_kept"] <= r["n_docs"]
        target = _LANG_RATES.get(r["lang"], 0.5)
        # binomial slack: 500-doc corpus, per-lang n >= ~90
        assert abs(r["kept_frac"] - target) < 0.2, (r, target)


def test_pii_scrub_exact(spark):
    from kmeans_mapreduce_spark.functions.text import pii_counts, pii_scrub

    df = spark.createDataFrame(
        [
            (
                "mail a.b+c@x-corp.io or root@10.1.2.3, ip 192.168.0.1 "
                "call 555-0199 x 42",
            ),
            ("no pii here 12-34",),
        ],
        ["t"],
    )
    out = df.select(
        pii_counts("t").alias("c"), pii_scrub("t").alias("s")
    ).collect()
    r0 = out[0]
    # root@10.1.2.3 is NOT email-shaped (digit TLD fails the
    # letters-only TLD tail), so its address part matches IPv4 instead.
    assert (r0["c"]["n_email"], r0["c"]["n_ip"], r0["c"]["n_phone"]) == (1, 2, 1)
    assert r0["s"] == "mail <EMAIL> or root@<IP>, ip <IP> call <PHONE> x 42"
    r1 = out[1]
    assert (r1["c"]["n_email"], r1["c"]["n_ip"], r1["c"]["n_phone"]) == (0, 0, 0)
    assert r1["s"] == "no pii here 12-34"


def test_pii_scrub_catalog_rows(spark, sf_dir):
    from kmeans_mapreduce_spark.plans.pipeline_queries3 import text_pii_scrub

    rows = text_pii_scrub(spark, sf_dir).collect()
    assert len(rows) == 500
    # every augmented doc carries exactly one planted email/ip/phone
    assert all(
        (r["n_email"], r["n_ip"], r["n_phone"]) == (1, 1, 1) for r in rows
    )


def test_embedding_dim_stats(spark, sf_dir):
    from kmeans_mapreduce_spark.plans.pipeline_queries3 import (
        embedding_dim_stats,
    )

    df = embedding_dim_stats(spark, sf_dir)
    # single map-side agg: no row-explosion shuffle of N x d rows
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan.split("HashAggregate")[-1], (
        "posexplode must run AFTER the aggregate, not before"
    )
    rows = df.collect()
    assert [r["dim"] for r in rows] == list(range(1, 65))
    for r in rows:
        assert r["n"] == 500
        assert r["vmin"] <= r["mean"] <= r["vmax"]
        assert r["stddev"] > 0


def test_quality_zscore_grouped_map(spark, sf_dir):
    """The z-score op must actually run through the grouped-map Arrow
    path, and per-language z-scores must be centered/scaled."""
    from kmeans_mapreduce_spark.plans.pipeline_queries3 import (
        text_quality_zscore,
    )

    df = text_quality_zscore(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    rows = df.collect()
    assert len(rows) == 500
    by_lang: dict[str, list[float]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["z"])
    for lang, zs in by_lang.items():
        assert abs(sum(zs)) / len(zs) < 1e-3, lang  # centered
        assert max(zs) > 0 > min(zs), lang
