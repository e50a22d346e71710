"""Incremental streaming corpus dedup: exact + near-dup suppression
across micro-batches with first-accepted-wins semantics."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kmeans_mapreduce_spark.streaming.dedup_corpus import stream_dedup_corpus

BASE = (
    "the quick brown fox jumps over the lazy dog while twelve zebras "
    "quietly graze beside the winding river under a pale autumn sky today"
)  # 24 tokens; changing one word keeps bigram Jaccard ~0.88 (>= 0.8)
NEAR = BASE.replace("autumn", "winter")
OTHER = (
    "completely different subject matter entirely about compilers "
    "registers allocation spilling and the joys of static single assignment"
)
UNIQUE2 = "a short unrelated note on tea brewing temperatures and timing"


@pytest.mark.slow
def test_incremental_dedup_across_batches(spark, tmp_path):
    src = tmp_path / "docs_stream"
    src.mkdir()
    # batch 1: doc1, doc2(unique), doc3 = exact dup of doc1 (in-batch)
    spark.createDataFrame(
        [(1, BASE, "en"), (2, OTHER, "en"), (3, BASE, "en")],
        "doc_id long, text string, lang string",
    ).coalesce(1).write.parquet(str(src / "b1"))
    # batch 2: 11 = exact dup of 1 (cross-batch), 12 = near-dup of 1
    # (cross-batch, signature-estimated), 13 = new unique
    spark.createDataFrame(
        [(11, BASE, "en"), (12, NEAR, "en"), (13, UNIQUE2, "en")],
        "doc_id long, text string, lang string",
    ).coalesce(1).write.parquet(str(src / "b2"))

    # FileStreamSource lists files lexicographically; stage as flat files
    import glob
    import os

    flat = tmp_path / "flat"
    flat.mkdir()
    for i, d in enumerate(["b1", "b2"]):
        f = glob.glob(str(src / d / "part-*.parquet"))[0]
        os.link(f, flat / f"{i:03d}.parquet")

    accepted = str(tmp_path / "accepted")
    index = str(tmp_path / "index")
    stream_dedup_corpus(
        spark,
        str(flat),
        accepted,
        index,
        checkpoint=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )

    got = sorted(r["doc_id"] for r in spark.read.parquet(accepted).collect())
    # 3 dies in-batch (exact), 11 dies cross-batch (exact),
    # 12 dies cross-batch (near-dup); first-accepted 1, 2 and new 13 live
    assert got == [1, 2, 13]
    idx = spark.read.parquet(index)
    assert sorted(r["id"] for r in idx.collect()) == [1, 2, 13]
    # signatures persisted for every accepted doc
    assert idx.where(F.col("sig").isNull()).count() == 0
