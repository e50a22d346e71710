"""Streaming training-shard export: the incremental counterpart of
sources/sinks.write_jsonl_shards.

A curation pipeline that accepts documents continuously should land
them in the SAME deterministic shard layout the batch exporter writes —
shard membership must depend only on content (md5(doc_id)), never on
arrival batching.  The file sink's checkpoint gives exactly-once file
commits, so a crashed export resumes without duplicating shards.

No reference analog (the reference's only sink is the driver-side CSV
dump, client.go:236-256); this extends the mandated streaming surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def documents_stream_source(
    spark: SparkSession, docs_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Bounded replay of a documents parquet directory as a stream
    (schema pinned from the batch read — file sources need one)."""
    schema = spark.read.parquet(docs_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(docs_dir)


def stream_export_jsonl(
    docs_stream: DataFrame,
    path: str,
    checkpoint: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    await_termination: bool = True,
):
    """Drain the stream into ``shard=<i>/*.json`` JSONL, availableNow.

    Shard assignment is the identical md5-mod expression the batch
    exporter uses, so every document lands in the same shard no matter
    which micro-batch carried it.  Rows within a shard ride in arrival
    order — streams cannot totally order (Spark rejects Sort on
    unaggregated streams); the batch exporter
    (sources/sinks.write_jsonl_shards) is the order-canonical path, and
    shard MEMBERSHIP equality between the two is what the test pins.

    Scale shape: per micro-batch one narrow projection + the file
    commit; no state store, no shuffle at all.
    Exactly-once: the json file sink tracks committed files in the
    checkpoint's _spark_metadata log — reprocessed batches overwrite
    rather than double-append.

    Always returns the StreamingQuery (already terminated when
    ``await_termination=True``, live otherwise) — one return type, so a
    caller can read ``q.lastProgress``/``recentProgress`` either way.
    The crash/resume harness (tools/stress_run.py stream_shard_export)
    passes ``await_termination=False`` to kill an export mid-run and
    prove the checkpoint resume commits no duplicate shards.
    """
    h = F.md5(F.col(id_col).cast("string"))
    shard = (F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % n_shards)
    staged = docs_stream.withColumn("shard", shard)
    q = (
        staged.writeStream.format("json")
        .partitionBy("shard")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
