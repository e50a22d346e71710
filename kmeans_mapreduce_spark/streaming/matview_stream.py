"""Streaming materialized-view maintenance: fold a stream into the
same additive MV that `sources/matview.refresh_matview` maintains for
batch facts.

Structured Streaming's file/parquet sinks can't express "merge by
key"; the standard pattern is foreachBatch + an idempotent merge.
Idempotency matters because foreachBatch is AT-LEAST-ONCE: after a
crash between the merge and the checkpoint commit, the engine replays
the last micro-batch.  Folding it twice would double-count every
additive measure — so the MV's manifest records the last folded
`batch_id`, and the fold SKIPS any batch at or below it.  Manifest
and data publish in one directory rename (see sources/matview), so
the recorded batch_id can never disagree with the data it describes.

At scale this is the streaming ingest architecture for continuous
aggregates: per-batch work is O(delta + |view|) — and the |view| term
is the group-key cardinality, not the fact history.  (For views too
large to rewrite per batch, partition the MV on a stable group-key
prefix and rewrite only affected partitions — the upsert_parquet
scoping applied here; out of scope for this module.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql.streaming import StreamingQuery

from kmeans_mapreduce_spark.sources.matview import (
    _read_manifest,
    merge_delta,
)


def fold_batch(
    batch_df: DataFrame,
    batch_id: int,
    mv_dir: str,
    group_cols: list[str],
    sum_measures: dict[str, Column],
) -> bool:
    """Fold one micro-batch into the MV; returns False (no-op) when
    `batch_id` was already folded — the at-least-once replay guard."""
    spark = batch_df.sparkSession
    manifest = _read_manifest(spark, mv_dir)
    if manifest.get("batch_id", -1) >= batch_id:
        return False
    manifest["batch_id"] = batch_id
    merge_delta(spark, mv_dir, batch_df, group_cols, sum_measures, manifest)
    return True


def stream_refresh_matview(
    stream_df: DataFrame,
    mv_dir: str,
    group_cols: list[str],
    sum_measures: dict[str, Column],
    checkpoint_dir: str,
) -> StreamingQuery:
    """Start an availableNow stream that folds every micro-batch into
    the MV at `mv_dir` exactly once (replays are detected via the
    manifest's batch_id and skipped)."""
    return (
        stream_df.writeStream.foreachBatch(
            lambda b, i: fold_batch(b, i, mv_dir, group_cols, sum_measures)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
