"""Dedup + similarity operator tests: LSH recall vs exact ground truth,
signature invariants, ANN quality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.operators import dedup as DD
from kmeans_mapreduce_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def exact_pairs(docs):
    return {
        (r["id_a"], r["id_b"])
        for r in DD.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.8).collect()
    }


def test_exact_dedup_partitions_corpus(docs):
    out = DD.exact_dedup(docs, "doc_id", "text")
    total = out.agg(F.sum("dup_count")).collect()[0][0]
    assert total == docs.count()
    # every keeper is a real doc id
    keepers = {r["keep_id"] for r in out.collect()}
    ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert keepers <= ids


def test_minhash_recall_and_precision(docs, exact_pairs):
    """At J>=0.8 with 8 bands x 4 rows, recall must be ~1 on this corpus;
    precision is exactly 1 because candidates are verified."""
    got = {
        (r["id_a"], r["id_b"])
        for r in DD.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.8).collect()
    }
    assert got == exact_pairs


def test_simhash_finds_near_dups(docs, exact_pairs):
    """SimHash at hamming<=6 should recover most J>=0.8 pairs and not
    explode: sanity-band the candidate count."""
    got = {
        (r["id_a"], r["id_b"])
        for r in DD.simhash_dedup_pairs(docs, "doc_id", "text", max_hamming=6).collect()
    }
    if exact_pairs:
        recall = len(got & exact_pairs) / len(exact_pairs)
        assert recall >= 0.6, f"simhash recall {recall}"
    assert len(got) <= 20 * max(len(exact_pairs), 1)


def test_embedding_cosine_pairs_symmetric_threshold(embs):
    out = DD.embedding_cosine_pairs(embs, "vec_id", "embedding", threshold=0.45)
    rows = out.collect()
    assert all(r["id_a"] < r["id_b"] for r in rows)
    assert all(r["cosine"] >= 0.45 for r in rows)


def test_embedding_lsh_equals_all_pairs(embs):
    """The LSH-bucketed path (the catalog entry) must EQUAL the all-pairs
    ground truth at the benchmark threshold — recall 1.0, not approx —
    for the pinned seed/table parameters (the dedup_minhash convention)."""
    gt = {
        tuple(r)
        for r in DD.embedding_cosine_pairs(
            embs, "vec_id", "embedding", threshold=0.45
        ).collect()
    }
    lsh = DD.embedding_cosine_pairs_lsh(embs, "vec_id", "embedding", threshold=0.45)
    got = {tuple(r) for r in lsh.collect()}
    assert got == gt, f"missed={len(gt - got)} extra={len(got - gt)}"


def test_embedding_lsh_plan_has_no_nested_loop(embs):
    """Scale contract: candidate generation + verify are equi-joins only.
    A BroadcastNestedLoopJoin/Cartesian anywhere means the operator
    degenerated to all-pairs."""
    plan = (
        DD.embedding_cosine_pairs_lsh(embs, "vec_id", "embedding", threshold=0.45)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoop" not in plan
    assert "Cartesian" not in plan


def test_ann_lsh_recall_vs_brute(embs):
    """Multi-table hyperplane LSH: >=40% of true top-5 recovered on
    average (4 tables x 4 planes on 64-dim data — approximate by design,
    deterministic by seed)."""
    q = embs.where(F.col("vec_id") < 20)
    brute = SIM.brute_force_topk(embs, q, k=5, id_col="vec_id", vec_col="embedding")
    lsh = SIM.lsh_topk(embs, q, k=5, id_col="vec_id", vec_col="embedding", dim=64)
    b = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    l = {(r["query_id"], r["neighbor_id"]) for r in lsh.collect()}
    assert len(b) == 100
    recall = len(b & l) / len(b)
    assert recall >= 0.4, f"ANN recall {recall}"


def test_ann_brute_rank_deterministic(embs):
    q = embs.where(F.col("vec_id") < 3)
    out1 = SIM.brute_force_topk(embs, q, k=5, id_col="vec_id", vec_col="embedding").collect()
    out2 = SIM.brute_force_topk(embs, q, k=5, id_col="vec_id", vec_col="embedding").collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    ranks = [(r["query_id"], r["rank"]) for r in out1]
    assert len(set(ranks)) == len(ranks)


def test_ivf_topk_matches_brute_mostly(embs):
    """IVF with k-means cells: probing 3 of 8 cells should recover most
    true neighbors (cosine top-k vs euclidean cells is approximate)."""
    from kmeans_mapreduce_spark.operators.kmeans import fit_kmeans_native
    from kmeans_mapreduce_spark.sources.ingest import points_from_embeddings

    pts = points_from_embeddings(spark=embs.sparkSession, sf_dir=None, dim=None) if False else None
    base = embs.select(
        F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("features")
    )
    res = fit_kmeans_native(base, k=8, dim=64, seed=42, max_iter=10)
    q = embs.where(F.col("vec_id") < 10)
    ivf = SIM.ivf_topk(embs, q, res.centroids, k=5, n_probe=3, id_col="vec_id", vec_col="embedding")
    brute = SIM.brute_force_topk(embs, q, k=5, id_col="vec_id", vec_col="embedding")
    b = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    i = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    recall = len(b & i) / len(b)
    assert recall >= 0.5, f"IVF recall {recall}"


@pytest.mark.parametrize("scale_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.1"])
@pytest.mark.slow
@pytest.mark.parametrize("num_perm,bands", [(32, 8), (64, 16)])
def test_minhash_recall_pinned_at_two_scales(spark, scale_dir, num_perm, bands):
    """Retuning contract (minhash_dedup_pairs docstring guidance): at
    t=0.8 both the default (32/8) and the documented 100x scale-up
    (64/16) must hold recall 1.0 vs the exact PPJoin ground truth, at
    BOTH corpus scale points (500 docs at sf0.001, 5000 at sf0.1).
    Precision is 1.0 by construction (exact verify), so set equality
    is the assertion."""
    d = spark.read.parquet(f"{scale_dir}/documents.parquet")
    gt = {
        (r["id_a"], r["id_b"])
        for r in DD.ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.8).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in DD.minhash_dedup_pairs(
            d, "doc_id", "text", threshold=0.8, num_perm=num_perm, bands=bands
        ).collect()
    }
    assert got == gt, f"missed={len(gt - got)} extra={len(got - gt)}"


def test_ann_lsh_recall_pinned_at_two_scales(spark):
    """Retuning contract (lsh_topk docstring guidance), pinned with
    measured numbers at two corpus scales (500 and 2000 vectors):

      - the default 4x4 holds recall ~0.45 at BOTH scales (16 buckets
        per table stay well-occupied);
      - the deep 8x8 setting (meant for 10M+ vectors) degrades on
        small corpora — measured 0.09 at N=500, 0.22 at N=2000 — and
        must IMPROVE as N grows, because recall for deep plane counts
        is an occupancy effect: more vectors per 256-entry bucket.

    This is the degradation curve the docstring's guidance table
    derives from; the floors pin it rather than hide it."""

    def recall(sf, n_planes, n_tables):
        e = spark.read.parquet(f"/root/testdata/{sf}/embeddings.parquet")
        q = e.where(F.col("vec_id") < 20)
        b = {
            (r["query_id"], r["neighbor_id"])
            for r in SIM.brute_force_topk(
                e, q, k=5, id_col="vec_id", vec_col="embedding"
            ).collect()
        }
        l = {
            (r["query_id"], r["neighbor_id"])
            for r in SIM.lsh_topk(
                e, q, k=5, id_col="vec_id", vec_col="embedding", dim=64,
                n_planes=n_planes, n_tables=n_tables,
            ).collect()
        }
        return len(b & l) / len(b)

    assert recall("sf0.001", 4, 4) >= 0.4
    assert recall("sf0.1", 4, 4) >= 0.4
    deep_small = recall("sf0.001", 8, 8)
    deep_large = recall("sf0.1", 8, 8)
    assert deep_small >= 0.05, deep_small
    assert deep_large >= 0.15, deep_large
    # the documented occupancy effect: deep settings recover recall
    # as the corpus grows toward their intended scale
    assert deep_large > deep_small, (deep_small, deep_large)
