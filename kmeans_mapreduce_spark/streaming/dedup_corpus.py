"""Incremental corpus dedup over a document stream.

Batch dedup (operators/dedup.py) answers "which of these N docs are
dups of each other"; a continuously-ingesting pipeline needs the online
form: "is this NEW doc a dup of anything ever accepted" — without
rescanning accepted text.  This module keeps a persisted signature
index (doc_id, content fingerprint, MinHash signature — ~300 bytes per
accepted doc regardless of document size) and folds each micro-batch:

  1. in-batch dedup: exact (md5, keep lowest id) then MinHash+LSH
     verified by exact Jaccard (texts are still at hand in-batch);
  2. vs-index exact: anti join on fingerprint;
  3. vs-index near-dup: banded signature join (same 8x4 LSH layout as
     the batch path) with similarity ESTIMATED from signature
     agreement — the index stores no text, so the estimator
     mean(sig_a[i]==sig_b[i]) stands in for exact Jaccard (unbiased,
     sigma = sqrt(J(1-J)/32) ~ 0.07 at J=0.8);
  4. append survivors' full rows to the accepted table and their
     signatures to the index.

First-accepted-wins across batches (arrival order is the tiebreak an
online system actually has); within a batch the lowest id wins, same
as batch dedup.  At 100 TB the index is the only growing join input —
KB-per-thousand-docs, bucketed by band key in production so the
candidate join stays co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions.text import fingerprint
from kmeans_mapreduce_spark.operators.dedup import (
    banded_signatures as _banded,
)
from kmeans_mapreduce_spark.operators.dedup import (
    minhash_dedup_pairs,
    minhash_signature,
    sig_agreement,
)


def stream_dedup_corpus(
    spark: SparkSession,
    docs_dir: str,
    accepted_dir: str,
    index_dir: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    max_files_per_trigger: int = 1,
) -> None:
    """Drain `docs_dir` (availableNow) through the incremental dedup;
    accepted rows land in `accepted_dir`, signatures in `index_dir`."""
    schema = spark.read.parquet(docs_dir).schema

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        staged = (
            batch_df.select(
                F.col(id_col).alias("id"), F.col(text_col).alias("text")
            )
            .withColumn("fp", fingerprint("text"))
            .withColumn("sig", minhash_signature("text"))
            .cache()
        )
        # 1a. in-batch exact: lowest id per fingerprint survives
        w = Window.partitionBy("fp").orderBy("id")
        uniq = (
            staged.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
        )
        # 1b. in-batch near-dup (exact-Jaccard-verified): higher id drops
        pairs = minhash_dedup_pairs(uniq, "id", "text", threshold=threshold)
        drop = pairs.select(F.greatest("id_a", "id_b").alias("id")).distinct()
        uniq = uniq.join(drop, "id", "left_anti").cache()

        try:
            idx = spark.read.parquet(index_dir).cache()
            idx_n = idx.count()
        except Exception:
            idx, idx_n = None, 0
        survivors = uniq
        if idx_n > 0:
            # 2. exact vs index
            survivors = survivors.join(
                idx.select("fp").distinct(), "fp", "left_anti"
            )
            # 3. near-dup vs index: banded join + signature agreement
            inc_b = _banded(survivors.where(F.col("sig").isNotNull()))
            idx_b = _banded(
                idx.where(F.col("sig").isNotNull()).select(
                    F.col("id"), F.col("sig")
                )
            )
            agree = sig_agreement("a.sig", "b.sig")
            near_ids = (
                inc_b.alias("a")
                .join(
                    idx_b.alias("b"),
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.key") == F.col("b.key")),
                )
                .where(agree >= threshold)
                .select(F.col("a.id").alias("id"))
                .distinct()
            )
            survivors = survivors.join(near_ids, "id", "left_anti")
        survivors = survivors.cache()
        try:
            # 4. append accepted rows (original schema) + index entries
            batch_df.join(
                survivors.select(F.col("id").alias(id_col)), id_col
            ).write.mode("append").parquet(accepted_dir)
            survivors.select("id", "fp", "sig").write.mode("append").parquet(
                index_dir
            )
        finally:
            # every per-batch cache released — a long-lived stream must
            # not accumulate executor storage across batches
            survivors.unpersist()
            uniq.unpersist()
            staged.unpersist()
            if idx is not None:
                idx.unpersist()

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
