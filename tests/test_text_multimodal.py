"""Text-function and multimodal-plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.functions import text as TXT
from kmeans_mapreduce_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def tdf(spark):
    rows = [
        (1, "The quick brown fox and the lazy dog."),
        (2, ""),
        (3, "   "),
        (4, "el gato y la casa de la abuela es un lugar"),
        (5, "one-token"),
        (6, "der hund und die katze ist ein tier mit von"),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def _col(df, expr, name="v"):
    return {r["id"]: r[name] for r in df.select("id", expr.alias(name)).collect()}


def test_token_count(tdf):
    out = _col(tdf, TXT.token_count("text"))
    assert out[1] == 8
    assert out[2] == 0 and out[3] == 0
    assert out[5] == 1


def test_punct_ratio_bounds(tdf):
    out = _col(tdf, TXT.punct_ratio("text"))
    assert out[2] == 0.0
    assert 0.0 < out[1] < 0.1


def test_lang_id(tdf):
    out = _col(tdf, TXT.lang_id("text"))
    assert out[1] == "en"
    assert out[4] == "es"
    assert out[6] == "de"
    assert out[2] == "und"


def test_quality_in_unit_interval(tdf):
    out = _col(tdf, TXT.quality_score("text"))
    assert all(0.0 <= v <= 1.0 for v in out.values())
    assert out[1] > out[2]  # prose beats empty


def test_fingerprint_matches_hashlib(tdf):
    import hashlib

    out = _col(tdf, TXT.fingerprint("text"))
    assert out[1] == hashlib.md5(b"The quick brown fox and the lazy dog.").hexdigest()


def test_word_shingles(tdf):
    out = _col(tdf, TXT.word_shingles("text", 2))
    assert "the quick" in out[1]
    assert out[5] == []  # fewer tokens than n
    assert out[2] == []


def test_minhash_signature_shape(tdf):
    out = _col(tdf, __import__("kmeans_mapreduce_spark.operators.dedup", fromlist=["x"]).minhash_signature("text"))
    assert len(out[1]) == 32
    assert out[2] is None  # empty text -> null signature


def test_media_pipeline(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    media = MM.attach_payload(docs, "doc_id", "text")
    meta = MM.media_metadata(media)
    assert meta.count() == 50
    dec = MM.decode_media(media)
    rows = dec.collect()
    assert len(rows) == 50
    r = rows[0]
    assert r["width"] >= 64 and r["height"] >= 64
    assert len(r["feature"]) == 8
    # deterministic: re-decode gives identical features
    rows2 = MM.decode_media(media).collect()
    assert sorted((x["media_id"], tuple(x["feature"])) for x in rows) == sorted(
        (x["media_id"], tuple(x["feature"])) for x in rows2
    )


def test_decode_real_codec_is_stubbed(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(1)
    media = MM.attach_payload(docs, "doc_id", "text")
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        MM.decode_media(media, use_real_codec=True).collect()


def test_frame_sample_offsets(spark):
    df = spark.createDataFrame([(1, b"x" * 3000, "video/fake")], MM.MEDIA_SCHEMA)
    out = MM.frame_sample(df, every_n_bytes=1024).collect()
    assert [r["offset"] for r in out] == [0, 1024, 2048]


def test_audio_pcm_windows_framing(spark):
    """Window arithmetic: last window fits inside the payload, hop
    spacing is exact, sub-window payloads emit nothing."""
    rows = [
        (1, b"x" * 200),  # 100 samples -> floor((100-32)/25)+1 = 3 windows
        (2, b"x" * 64),   # 32 samples  -> exactly 1 window
        (3, b"x" * 63),   # 31 samples  -> 0 windows (sub-window)
        (4, b""),         # empty       -> 0 windows
    ]
    media = spark.createDataFrame(
        rows, "media_id long, payload binary"
    ).withColumn("mime", F.lit("audio/pcm16"))
    got = MM.audio_pcm_windows(
        media, sample_rate=16000, bytes_per_sample=2,
        window_samples=32, hop_samples=25,
    ).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == {1, 2}
    assert [r["start_sample"] for r in sorted(by_id[1], key=lambda r: r["window_idx"])] == [0, 25, 50]
    # every window's last sample stays inside the payload
    for r in by_id[1]:
        assert r["start_sample"] + 32 <= 100
        assert r["start_byte"] == r["start_sample"] * 2
        assert r["t_start_ms"] == pytest.approx(r["start_sample"] * 1000 / 16000, abs=1e-4)
    assert [r["start_sample"] for r in by_id[2]] == [0]

def test_image_tiles_degenerate_dims_emit_no_tiles(spark):
    """width/height <= 0 must yield ZERO tiles — without the guard,
    sequence(0, -1) DESCENDS (spurious negative indices) and _cols=0
    nulls tile_row/tile_col via division by zero."""
    from kmeans_mapreduce_spark.operators.multimodal import image_tiles

    df = spark.createDataFrame(
        [("ok", 20, 20), ("zw", 0, 64), ("zh", 64, 0), ("neg", -20, -20)],
        "media_id string, width int, height int",
    )
    rows = image_tiles(df, patch=16).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == {"ok"}, "degenerate dims must emit no tiles"
    assert len(by_id["ok"]) == 4  # ceil(20/16)^2
    assert all(
        r["tile_row"] >= 0 and r["tile_col"] >= 0 for r in by_id["ok"]
    )
