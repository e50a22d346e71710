"""Streaming quality-filter accounting: fold per-source keep/drop
counts from a document stream into an additive MV.

The batch counterpart is pipeline_quality_classifier (the fixed-weight
integer logit over cheap text features); at ingest time a production
pipeline wants the SAME decision boundary applied to arriving
documents with a continuously-maintained accounting view (how much is
each crawl's keep rate drifting?).  Scoring is pure per-row Catalyst
(streaming-safe projections, no state), so the only stateful piece is
the additive fold — which reuses the matview_stream machinery and
therefore its at-least-once replay guard (batch_id in the manifest)
and torn-publish healing for free.

Scale shape: per micro-batch work is one map over the delta plus a
|sources|-row merge; the corpus never re-scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kmeans_mapreduce_spark.plans.pipeline_queries8 import quality_scored
from kmeans_mapreduce_spark.streaming.matview_stream import (
    stream_refresh_matview,
)

def quality_measures() -> dict:
    """The additive per-source measures, built lazily: constructing a
    Column needs an active SparkSession, so a module-level dict would
    make this module unimportable before the session exists (the
    import-then-get_spark pattern every other module supports)."""
    return {
        "n_docs": F.count("*").cast("bigint"),
        "n_kept": F.sum((F.col("z") > 0).cast("bigint")).cast("bigint"),
        "n_tokens": F.sum("n_tokens").cast("bigint"),
        "kept_id_sum": F.coalesce(
            F.sum(F.when(F.col("z") > 0, F.col("doc_id"))), F.lit(0)
        ).cast("bigint"),
    }


def stream_quality_counts(
    stream_docs: DataFrame, mv_dir: str, checkpoint_dir: str
) -> StreamingQuery:
    """Start an availableNow stream folding per-source quality-filter
    counts (docs, kept, tokens, kept-id checksum) into the MV at
    `mv_dir`.  Incremental drains converge to the batch classifier's
    aggregate; replayed micro-batches are no-ops."""
    scored = quality_scored(stream_docs)
    return stream_refresh_matview(
        scored,
        mv_dir,
        ["source"],
        quality_measures(),
        checkpoint_dir,
    )
