"""Streaming JSONL shard export: shard membership must equal the batch
exporter's, regardless of micro-batch pacing."""

from __future__ import annotations

import glob
import json
import os


def _stage_docs_dir(sf_dir, tmp_path):
    """FileStreamSource requires a directory; hardlink the single file."""
    d = tmp_path / "docs_stream"
    d.mkdir()
    os.link(f"{sf_dir}/documents.parquet", d / "part-000.parquet")
    return str(d)


def test_stream_export_matches_batch_membership(spark, sf_dir, tmp_path):
    from kmeans_mapreduce_spark.sources.sinks import write_jsonl_shards
    from kmeans_mapreduce_spark.streaming.export import (
        documents_stream_source,
        stream_export_jsonl,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    stream_out = str(tmp_path / "stream_shards")
    stream_export_jsonl(
        documents_stream_source(spark, _stage_docs_dir(sf_dir, tmp_path)),
        stream_out,
        str(tmp_path / "ckpt"),
        n_shards=4,
    )

    batch_out = str(tmp_path / "batch_shards")
    write_jsonl_shards(docs, batch_out, n_shards=4)

    def membership(path):
        out = {}
        for f in glob.glob(f"{path}/shard=*/part-*.json"):
            shard = int(f.split("shard=")[1].split("/")[0])
            for line in open(f):
                out[json.loads(line)["doc_id"]] = shard
        return out

    got, want = membership(stream_out), membership(batch_out)
    assert got == want
    assert len(got) == docs.count()


def test_stream_export_exactly_once_on_rerun(spark, sf_dir, tmp_path):
    """Draining the same checkpointed source twice must not duplicate
    rows (file-sink metadata log dedups committed batches)."""
    from kmeans_mapreduce_spark.streaming.export import (
        documents_stream_source,
        stream_export_jsonl,
    )

    src_dir = _stage_docs_dir(sf_dir, tmp_path)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    for _ in range(2):
        stream_export_jsonl(
            documents_stream_source(spark, src_dir), out, ck, n_shards=4
        )
    n = spark.read.json(out).count()
    assert n == spark.read.parquet(f"{sf_dir}/documents.parquet").count()
