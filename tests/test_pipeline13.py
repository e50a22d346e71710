"""Batch-27 operators: IVF-PQ composition, MinHash calibration,
mixed-mime histogram."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_ivf_pq_prunes_to_probed_cells(spark, sf_dir):
    """Every returned neighbor must live in one of its query's 2 probed
    cells — the pruning is structural, not a scoring preference."""
    from kmeans_mapreduce_spark.plans.pipeline_queries13 import (
        ann_ivf_pq_topk,
    )
    from kmeans_mapreduce_spark.plans.pipeline_queries import _embs

    e = _embs(spark, sf_dir).select(
        F.col("vec_id").alias("id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * 1000).cast("double"),
        ).alias("v"),
    )
    vecs = {r["id"]: list(r["v"]) for r in e.collect()}
    cents = [vecs[i] for i in range(4)]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def cell(v):
        ds = [d2(v, c) for c in cents]
        return min(range(4), key=lambda i: (ds[i], i))

    def probes(v):
        ds = [d2(v, c) for c in cents]
        return set(sorted(range(4), key=lambda i: (ds[i], i))[:2])

    rows = ann_ivf_pq_topk(spark, sf_dir).collect()
    assert rows, "no results"
    per_query: dict[int, list] = {}
    for r in rows:
        per_query.setdefault(r["query_id"], []).append(r)
        assert r["query_id"] != r["neighbor_id"]
        assert cell(vecs[r["neighbor_id"]]) in probes(vecs[r["query_id"]])
    assert set(per_query) == set(range(5))
    for q, rs in per_query.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        d2s = [r["approx_d2"] for r in rs]
        assert d2s == sorted(d2s)


def test_minhash_calibration_shape(spark, sf_dir):
    from kmeans_mapreduce_spark.plans.pipeline_queries13 import (
        dedup_minhash_calibration,
    )

    rows = dedup_minhash_calibration(spark, sf_dir).collect()
    assert rows, "banding produced no candidate pairs"
    for r in rows:
        assert 0 <= r["n_match"] <= 16
        assert r["n_pairs"] > 0
        assert 0.0 <= r["mean_jaccard"] <= 1.0
        # estimator error is a mean of |est - true| over [0,1] values
        assert 0.0 <= r["mean_abs_err"] <= 1.0
    # LSH candidates require >= 1 full band match (2 of 16 components
    # at the audit's shallow 8x2 banding), so no candidate can sit
    # below 2 matching components; assert the structural floor
    assert min(r["n_match"] for r in rows) >= 2
    # the shallow banding exists to trace the curve: expect more than
    # the near-dup tail
    assert len(rows) >= 5


def test_mixed_histogram_counts_all_pixels(spark, sf_dir):
    """Bucket counts must sum to the total raster bytes of BOTH arms:
    sum over docs of ch(parity) * w * h."""
    from kmeans_mapreduce_spark.plans.pipeline_queries13 import (
        mm_pnm_mixed_histogram,
    )
    from kmeans_mapreduce_spark.plans.pipeline_queries import _docs

    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.octet_length(F.col("text").cast("binary")).alias("n"),
    )
    expected = docs.select(
        (
            F.when(F.col("media_id") % 2 == 1, F.lit(1)).otherwise(F.lit(3))
            * (4 + F.col("n") % 13)
            * (4 + (F.col("n") / 13).cast("int") % 11)
        ).alias("px")
    ).agg(F.sum("px")).collect()[0][0]
    got = (
        mm_pnm_mixed_histogram(spark, sf_dir)
        .agg(F.sum("n_px"))
        .collect()[0][0]
    )
    assert got == expected
