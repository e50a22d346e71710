"""UDTF chunking + multimodal resize stage."""

from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions.udtfs import chunk_documents
from kmeans_mapreduce_spark.operators.multimodal import (
    attach_payload,
    decode_media,
    resize_media,
)


def _py_chunks(text: str, size: int, overlap: int):
    toks = [t for t in text.split(" ") if t]
    stride = size - overlap
    out, cid = [], 0
    for start in range(0, max(len(toks) - overlap, 1), stride):
        window = toks[start : start + size]
        if not window:
            break
        out.append((cid, len(window), " ".join(window)))
        cid += 1
        if start + size >= len(toks):
            break
    return out


def test_udtf_chunks_match_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") < 20
    )
    got = {}
    for r in chunk_documents(docs, size=10, overlap=3).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["n_tokens"], r["chunk"])
        )
    for r in docs.select("doc_id", "text").collect():
        want = _py_chunks(r["text"], 10, 3)
        assert sorted(got[r["doc_id"]]) == sorted(want), r["doc_id"]
    # overlap property: consecutive chunks share exactly `overlap` tokens
    for chunks in got.values():
        chunks.sort()
        for (_, n_a, a), (_, _, b) in zip(chunks, chunks[1:]):
            if n_a == 10:  # full window
                assert a.split(" ")[-3:] == b.split(" ")[:3]


def test_resize_media_derives_thumbnail(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") < 50
    )
    media = attach_payload(docs, "doc_id", "text")
    decoded = {r["media_id"]: r for r in decode_media(media).collect()}
    resized = resize_media(media, max_side=32).collect()
    assert len(resized) == len(decoded)
    for r in resized:
        d = decoded[r["media_id"]]
        assert (r["width"], r["height"]) == (d["width"], d["height"])
        assert max(r["thumb_width"], r["thumb_height"]) <= 32
        # aspect preserved within integer truncation
        assert r["thumb_width"] <= r["width"] and r["thumb_height"] <= r["height"]
        # pooled feature = pairwise means of the decode feature
        for i in range(4):
            assert r["thumb_feature"][i] == (
                d["feature"][2 * i] + d["feature"][2 * i + 1]
            ) / 2.0


def test_ngrams_udtf_dynamic_schema(spark):
    """analyze() derives the output schema from the constant n: the
    column list changes with the argument, values are correct, and a
    bad n fails at ANALYSIS time (not mid-job)."""
    import pytest
    from pyspark.sql.functions import col, lit

    from kmeans_mapreduce_spark.functions.udtfs import NGrams

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    out2 = df.lateralJoin(NGrams(col("text").outer(), lit(2)))
    assert out2.columns == ["doc_id", "text", "pos", "gram_1", "gram_2", "ngram"]
    rows = sorted((r["pos"], r["ngram"]) for r in out2.collect())
    assert rows == [(0, "a b"), (1, "b c"), (2, "c d")]

    out3 = df.lateralJoin(NGrams(col("text").outer(), lit(3)))
    assert "gram_3" in out3.columns
    assert [r["ngram"] for r in out3.collect()] == ["a b c", "b c d"]

    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        df.lateralJoin(NGrams(col("text").outer(), lit(0))).columns
