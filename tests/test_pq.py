"""Product quantization: determinism, compression shape, and recall
against exact euclidean top-k."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def pq_setup(spark, sf_dir):
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    ).cache()
    books = SIM.pq_train(embs, dim=64, m=8, k_codes=16, seed=3, max_iter=4)
    codes = SIM.pq_encode(embs, books).cache()
    return embs, books, codes


@pytest.mark.slow
def test_pq_shapes_and_determinism(spark, pq_setup):
    embs, books, codes = pq_setup
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8
    rows = codes.collect()
    assert len(rows) == embs.count()
    for r in rows[:20]:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])
    # re-encode is bit-identical (codebooks deterministic by seed)
    books2 = SIM.pq_train(embs, dim=64, m=8, k_codes=16, seed=3, max_iter=4)
    assert books == books2


def test_pq_recall_vs_exact(spark, pq_setup):
    embs, books, codes = pq_setup
    qs = [(r["id"], list(r["v"])) for r in embs.where(F.col("id") < 10).collect()]
    got = SIM.pq_topk(codes, books, qs, k=5)
    approx = {}
    for r in got.collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    # exact euclidean top-5 via brute force (euclidean = same ranking
    # as PQ's d2 target, unlike the cosine used elsewhere)
    e = embs.select(F.col("id").alias("neighbor_id"), F.col("v").alias("cv"))
    q = embs.where(F.col("id") < 10).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("neighbor_id"))
    exact = (
        F.broadcast(q)
        .crossJoin(e)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", d2.alias("d2"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
    )
    truth = {}
    for r in exact.collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    recalls = [
        len(approx[qid] & truth[qid]) / 5 for qid in truth if qid in approx
    ]
    assert len(recalls) == 10
    mean_recall = sum(recalls) / len(recalls)
    # 8x16 PQ on 64-dim: coarse, but must be far above random (5/500)
    assert mean_recall >= 0.15, f"ADC mean recall@5 {mean_recall}"

    # exact re-ranking over the ADC shortlist: recall now bounded by
    # shortlist coverage, not quantization error
    reranked = SIM.pq_topk_rerank(codes, books, embs, qs, k=5, shortlist=50)
    rr = {}
    for r in reranked.collect():
        rr.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    rr_recalls = [len(rr[qid] & truth[qid]) / 5 for qid in truth if qid in rr]
    rr_mean = sum(rr_recalls) / len(rr_recalls)
    assert rr_mean >= 0.6, f"reranked mean recall@5 {rr_mean}"
    assert rr_mean > mean_recall


def test_pq_index_roundtrip_matches_in_memory(spark, pq_setup, tmp_path):
    """A written PQ index must answer ADC searches identically to the
    in-memory codes/codebooks it was built from."""
    embs, books, codes = pq_setup
    idx = str(tmp_path / "pq_index")
    SIM.write_pq_index(embs, books, idx)
    qs = [(r["id"], list(r["v"])) for r in embs.where(F.col("id") < 6).collect()]
    from_disk = sorted(
        map(tuple, SIM.pq_topk_from_index(spark, idx, qs, k=5).collect())
    )
    in_mem = sorted(map(tuple, SIM.pq_topk(codes, books, qs, k=5).collect()))
    assert from_disk == in_mem
    assert len(from_disk) == 6 * 5
    # the scan payload really is codes-only
    cols = set(spark.read.parquet(f"{idx}/codes").columns)
    assert cols == {"id", "codes"}
