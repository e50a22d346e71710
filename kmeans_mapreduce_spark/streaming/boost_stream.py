"""Streaming apply of the trained boosted quality filter: the serving
face of the round-12 trainer.

The trainer family (plans/pipeline_queries17-18) certifies DISTRIBUTED
TRAINING end to end — but a production corpus pipeline trains offline
and then filters the INGEST STREAM with the frozen model.  This module
closes that loop, the same way stream_append_ivf_index closes it for
the ANN index: the learned ensemble (a list of (feature, theta,
orientation) stump triples — the exact dicts `_boost_rounds` returns)
becomes a stateless boolean column over the SAME feature derivation
the trainer used (`with_doc_features`, trigger-agnostic per-row
expressions), and each micro-batch's keepers append to the kept table
exactly-once via the parquet sink's checkpoint + _spark_metadata log.

Because features and vote semantics are SHARED CODE with the trainer
(not re-implemented), train-time and serve-time behavior cannot drift:
tests pin stream == batch keep decisions doc-for-doc, and the
round-12 stress phase drains the 50k-doc corpus through it.

Scale shape: stateless per-row expressions (no aggregation, no state
store, no shuffle) — the filter runs at scan speed and parallelizes
with input files; model size is |rounds| triples riding the plan as
literals.  No reference analog (the reference has no streaming at
all); beyond-reference mandated surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.plans.pipeline_queries17 import with_doc_features
from kmeans_mapreduce_spark.plans.pipeline_queries18 import _stump_pred


def ensemble_vote_expr(rounds: list[dict], x_col: str = "x") -> Column:
    """The majority-vote sum of a trained stump ensemble over the
    feature-vector column: each (j, theta, ge_is_pos) triple votes
    +-1 through `_stump_pred` itself (the trainer's one threshold-
    orientation implementation, applied to x[j]) — serving cannot
    drift from training because there is nothing to drift.  Odd
    |rounds| (asserted: the trainer's contract) means the sum is
    never 0, so `> 0` IS the majority decision."""
    if not rounds or len(rounds) % 2 == 0:
        raise ValueError(
            f"ensemble must be a non-empty ODD number of stumps for "
            f"the vote sum to decide a majority, got {len(rounds)}"
        )
    votes = [
        _stump_pred(
            int(r["theta"]),
            bool(r["ge_is_pos"]),
            v=F.col(x_col)[int(r["j"])],
        )
        for r in rounds
    ]
    s = votes[0]
    for v in votes[1:]:
        s = s + v
    return s


def apply_boost_filter(
    docs: DataFrame,
    rounds: list[dict],
    text_col: str = "text",
) -> DataFrame:
    """Filter a document frame (batch or streaming) to the rows the
    trained ensemble votes +1 on — original columns preserved, no
    join and no state (the features are appended in place, so the
    plan stays a stateless per-row pipeline a stream can run without
    watermarks).  Blank docs (no tokens) have no feature vector and
    are dropped, matching the trainer's frame."""
    orig = docs.columns
    return (
        with_doc_features(docs, text_col=text_col)
        .where(ensemble_vote_expr(rounds) > 0)
        .select(*orig)
    )


def stream_boost_filter(
    spark: SparkSession,
    docs_dir: str,
    kept_dir: str,
    checkpoint: str,
    rounds: list[dict],
    text_col: str = "text",
    max_files_per_trigger: int = 1,
    schema=None,
) -> None:
    """Drain `docs_dir` (availableNow) through the trained ensemble;
    keepers append to `kept_dir` exactly-once (parquet sink checkpoint
    + _spark_metadata commit log — a crashed batch replays, a
    committed batch never duplicates).  Re-running after new files
    land folds ONLY the delta: the checkpoint remembers which inputs
    were processed.

    ``schema``: file-source streams need one pinned up front; by
    default it is inferred from a batch read of ``docs_dir``, which
    requires the directory to already hold at least one data file —
    pass an explicit StructType to start the filter against a
    not-yet-populated ingest directory.  Either way ``text_col`` must
    exist as a string column, checked here so a miswired pipeline
    fails with the precondition named instead of Spark's opaque
    schema-inference error mid-stream."""
    if schema is None:
        try:
            schema = spark.read.parquet(docs_dir).schema
        except Exception as exc:
            raise ValueError(
                f"stream_boost_filter: cannot infer a schema from "
                f"{docs_dir!r} (empty or not yet populated?) — pass "
                f"schema= explicitly to stream against a directory "
                f"that has no data files yet"
            ) from exc
    if text_col not in schema.fieldNames():
        raise ValueError(
            f"stream_boost_filter: text column {text_col!r} not in the "
            f"stream schema {schema.fieldNames()}"
        )
    from pyspark.sql.types import StringType

    if not isinstance(schema[text_col].dataType, StringType):
        raise ValueError(
            f"stream_boost_filter: text column {text_col!r} must be "
            f"string, got {schema[text_col].dataType.simpleString()}"
        )
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    kept = apply_boost_filter(src, rounds, text_col)
    q = (
        kept.writeStream.format("parquet")
        .option("path", kept_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
