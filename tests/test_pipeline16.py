"""Round-11 batch 32: the PNG (compressed) and AVI (video container)
real-codec arms, and the codebook axis of the ANN tuning-curve family.

The PNG tests pin the decoder to the SPEC, not to our encoder: a
hand-computed filtered-scanline fixture (all five filter types, every
expected byte written out by hand from RFC 2083 §6) must reconstruct
exactly, so a matched encoder/decoder bug pair cannot cancel.  The AVI
tests force the nested-walk traps: odd-sized frames (pad bytes between
movi chunks) and header/index cross-checks."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kmeans_mapreduce_spark.operators.multimodal import (
    AVI_MIME,
    PNG_MIME,
    _decode_avi,
    _decode_png,
    _png_chunk,
    encode_avi,
    encode_png,
)


# --- PNG: pure-Python codec, no Spark needed ---------------------------------


@settings(max_examples=40, deadline=None)
@given(
    width=st.integers(min_value=1, max_value=12),
    height=st.integers(min_value=1, max_value=12),
    channels=st.sampled_from([1, 3]),
    seed=st.integers(min_value=0, max_value=2**31),
    n_idat=st.integers(min_value=1, max_value=3),
    text=st.binary(min_size=0, max_size=9),
)
def test_png_roundtrip(width, height, channels, seed, n_idat, text):
    """encode -> decode is the identity on pixels for every dim /
    channel / IDAT-split / ancillary-chunk combination, and the decoder
    reports the filter types the encoder wrote (r % 5)."""
    px = ((seed + np.arange(width * height * channels) * 31) % 256).astype(
        np.uint8
    ).tobytes()
    payload = encode_png(
        width, height, channels, px, n_idat=n_idat, text=text
    )
    w, h, ch, out, ni, filters = _decode_png(payload)
    assert (w, h, ch) == (width, height, channels)
    assert out == px
    assert ni == n_idat
    assert filters == [r % 5 for r in range(height)]


def test_png_decoder_matches_spec_fixture():
    """Hand-built filtered scanlines (one row per filter type, every
    byte computed by hand from the PNG spec) reconstruct to the raw
    pixels — this pins `_decode_png` to RFC 2083 §6 independently of
    our own encoder."""
    # 3x5 grayscale; target raw rows and their hand-filtered bytes:
    #   row0 f=None:  10 20 30           -> 10 20 30
    #   row1 f=Sub:   15 25 35           -> 15 10 10
    #   row2 f=Up:    40 50 60           -> 25 25 25
    #   row3 f=Avg:   45 55 65           -> 25  8  8
    #   row4 f=Paeth: 70 80 90           -> 25 10 10
    raw = bytes(
        [0, 10, 20, 30,
         1, 15, 10, 10,
         2, 25, 25, 25,
         3, 25, 8, 8,
         4, 25, 10, 10]
    )
    ihdr = struct.pack(">IIBBBBB", 3, 5, 8, 0, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    w, h, ch, px, ni, filters = _decode_png(payload)
    assert (w, h, ch, ni) == (3, 5, 1, 1)
    assert filters == [0, 1, 2, 3, 4]
    assert px == bytes(
        [10, 20, 30, 15, 25, 35, 40, 50, 60, 45, 55, 65, 70, 80, 90]
    )


def test_png_rejects_malformed():
    good = encode_png(4, 6, 3, bytes(range(72)), n_idat=2, text=b"hi")
    with pytest.raises(ValueError, match="not a PNG"):
        _decode_png(b"\x89PNX" + good[4:])
    # one flipped bit inside an IDAT body -> the chunk CRC must catch it
    bad = bytearray(good)
    bad[bad.index(b"IDAT") + 6] ^= 0x01
    with pytest.raises(ValueError, match="bad CRC"):
        _decode_png(bytes(bad))
    with pytest.raises(ValueError, match="truncated|missing"):
        _decode_png(good[: len(good) // 2])
    # unsupported shapes are rejected at IHDR, not mis-decoded
    ihdr16 = struct.pack(">IIBBBBB", 4, 6, 16, 0, 0, 0, 0)
    p16 = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr16)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 30))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported PNG"):
        _decode_png(p16)
    # a scanline stream of the wrong length (here: dims lie) is caught
    lie = bytearray(good)
    i = lie.index(b"IHDR") + 4
    struct.pack_into(">II", lie, i, 4, 7)  # claims an extra row
    body = bytes(lie[i : i + 13])
    struct.pack_into(
        ">I", lie, i + 13, zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="scanline stream"):
        _decode_png(bytes(lie))


def test_png_encode_rejects_bad_args():
    with pytest.raises(ValueError, match="channels"):
        encode_png(2, 2, 2, bytes(8))
    with pytest.raises(ValueError, match="pixel bytes"):
        encode_png(2, 2, 1, bytes(5))
    with pytest.raises(ValueError, match="IDAT"):
        encode_png(2, 2, 1, bytes(4), n_idat=0)


# --- AVI: pure-Python codec, no Spark needed ---------------------------------


@settings(max_examples=40, deadline=None)
@given(
    width=st.integers(min_value=1, max_value=9),
    height=st.integers(min_value=1, max_value=7),
    n_frames=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_avi_roundtrip(width, height, n_frames, seed):
    """encode -> decode is the identity on frames, including odd-sized
    frames whose movi chunks carry REAL pad bytes."""
    frames = [
        ((seed + f * 17 + np.arange(width * height) * 3) % 256)
        .astype(np.uint8)
        .tobytes()
        for f in range(n_frames)
    ]
    w, h, out = _decode_avi(encode_avi(width, height, 10, frames))
    assert (w, h) == (width, height)
    assert out == frames


def test_avi_movi_pad_byte_is_load_bearing():
    """With an odd frame size the '00db' bodies are pad-separated; a
    walker that ignores the pad rule reads the pad byte as the first
    byte of the next chunk id and the parse falls apart."""
    frames = [bytes([f] * 9) for f in range(4)]  # 3x3 -> odd bodies
    payload = encode_avi(3, 3, 10, frames)
    i = payload.index(b"00db")
    # chunk: id(4) size(4) body(9) PAD, then the next id
    assert payload[i + 17 : i + 18] == b"\x00"
    assert payload[i + 18 : i + 22] == b"00db"
    assert _decode_avi(payload)[2] == frames


def test_avi_rejects_malformed():
    frames = [bytes(range(12))] * 3
    good = encode_avi(4, 3, 10, frames)
    with pytest.raises(ValueError, match="RIFF/AVI"):
        _decode_avi(b"XXXX" + good[4:])
    with pytest.raises(ValueError, match="RIFF size"):
        _decode_avi(good + b"\x00")
    # header/content cross-checks: declared frame count, frame length
    bad = bytearray(good)
    struct.pack_into("<I", bad, bad.index(b"avih") + 8 + 16, 99)
    with pytest.raises(ValueError, match="declares 99 frames"):
        _decode_avi(bytes(bad))
    # a non-vids stream is rejected
    bad = bytearray(good)
    i = bad.index(b"strh") + 8
    bad[i : i + 4] = b"auds"
    with pytest.raises(ValueError, match="need vids"):
        _decode_avi(bytes(bad))


# --- the Spark faces ----------------------------------------------------------


def test_png_stats_in_decode_media_dispatch(spark, sf_dir):
    """The PNG arm participates in decode_media's per-row mime dispatch:
    per-channel sums, dims and pixel count all match the generative
    formula after a REAL inflate + unfilter."""
    from kmeans_mapreduce_spark.operators.multimodal import (
        attach_png_payload,
        decode_media,
    )
    from kmeans_mapreduce_spark.plans.pipeline_queries import _docs

    media = attach_png_payload(_docs(spark, sf_dir).limit(8), "doc_id", "text")
    rows = decode_media(media).collect()
    assert rows and all(r["mime"] == PNG_MIME for r in rows)
    for r in rows:
        mid, w, h = r["media_id"], r["width"], r["height"]
        ch = 1 if mid % 2 == 1 else 3
        px = (mid * 7 + np.arange(w * h * ch)) % 256
        if ch == 3:
            want0 = float(px.reshape(-1, 3)[:, 0].sum())
        else:
            want0 = float(px.sum())
        assert r["feature"][0] == want0
        assert r["feature"][5] == float(w * h)


def test_avi_frame_sample_matches_formula(spark, sf_dir):
    """Sampled frames carry exact per-frame stats derived from the
    generative formula, every 2nd frame starting at 0."""
    from kmeans_mapreduce_spark.operators.multimodal import (
        attach_avi_payload,
        avi_frame_sample,
    )
    from kmeans_mapreduce_spark.plans.pipeline_queries import _docs

    media = attach_avi_payload(_docs(spark, sf_dir).limit(8), "doc_id", "text")
    rows = avi_frame_sample(media, stride=2).collect()
    assert rows
    by_media: dict[int, list] = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, rs in by_media.items():
        nf = 4 + mid % 5
        assert sorted(r["frame_idx"] for r in rs) == list(range(0, nf, 2))
        for r in rs:
            px = (mid * 5 + r["frame_idx"] * 17
                  + np.arange(r["width"] * r["height"]) * 3) % 256
            assert r["f_sum"] == int(px.sum())
            assert r["f_min"] == int(px.min())
            assert r["f_max"] == int(px.max())


@pytest.mark.slow
def test_codebook_sweep_contains_production_point(spark, sf_dir):
    """The sweep's m=8 leg IS the production configuration: its
    mean_recall must equal the mean of `ann_ivf_pq_recall`'s per-query
    recalls (same trained index, probes and ground truth), and the
    curve's shape contract holds (sub_dim = 64/m, recalls in [0, 1])."""
    from kmeans_mapreduce_spark.plans.pipeline_queries14 import (
        ann_ivf_pq_recall,
    )
    from kmeans_mapreduce_spark.plans.pipeline_queries16 import (
        ann_ivf_pq_codebook_sweep,
    )

    rows = ann_ivf_pq_codebook_sweep(spark, sf_dir).collect()
    assert [r["m"] for r in rows] == [2, 4, 8, 16]
    assert [r["sub_dim"] for r in rows] == [32, 16, 8, 4]
    assert all(0.0 <= r["mean_recall"] <= 1.0 for r in rows)
    per_query = ann_ivf_pq_recall(spark, sf_dir).collect()
    want = round(sum(r["recall"] for r in per_query) / len(per_query), 6)
    got = next(r["mean_recall"] for r in rows if r["m"] == 8)
    assert abs(got - want) <= 1e-6, (got, want)


# --- GIF: hand-rolled LZW, pure-Python, no Spark needed ----------------------


@settings(max_examples=40, deadline=None)
@given(
    width=st.integers(min_value=1, max_value=14),
    height=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31),
    comment=st.binary(min_size=0, max_size=9),
)
def test_gif_roundtrip(width, height, seed, comment):
    """encode -> decode is the identity on palette indices for every
    dim/comment combination — most cases cross at least one LZW code
    width boundary (4-bit palette: growth starts ~14 phrases in)."""
    from kmeans_mapreduce_spark.operators.multimodal import (
        _decode_gif,
        encode_gif,
    )

    idx = ((seed + np.arange(width * height) * 7) % 16).astype(np.uint8)
    w, h, out, gct = _decode_gif(
        encode_gif(width, height, idx.tobytes(), comment=comment)
    )
    assert (w, h) == (width, height)
    assert out == idx.tobytes()
    assert len(gct) == 48  # 16 grayscale entries


def test_gif_lzw_deep_growth_and_freeze():
    """A large random image drives the code width through several
    boundaries; a 150x150 one crosses the 4096-entry freeze — both must
    reconstruct exactly."""
    from kmeans_mapreduce_spark.operators.multimodal import (
        _decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(11)
    for dim in (60, 150):
        idx = rng.integers(0, 16, size=dim * dim).astype(np.uint8)
        assert _decode_gif(encode_gif(dim, dim, idx.tobytes()))[2] == idx.tobytes()
    # constant image: the KwKwK code chain from the first phrase on
    idx = np.zeros(200, dtype=np.uint8)
    assert _decode_gif(encode_gif(20, 10, idx.tobytes()))[2] == idx.tobytes()


def test_gif_lzw_decoder_matches_hand_packed_spec_fixture():
    """A hand-packed LZW stream (every bit written out by hand from the
    GIF spec's LZW rules) decodes to the expected indices — this pins
    `_lzw_decompress` to the SPEC independently of our encoder, and the
    stream deliberately contains a KwKwK code AND a width bump:
      codes (value,width): (4,3)=clear (1,3) (6,3)=KwKwK (1,3)
                           -> table hits 8 entries, width bumps to 4 ->
                           (2,4) (2,4) (5,4)=end
      expected output: [1, 1, 1, 1, 2, 2]
    packed LSB-first into 0x8C 0x23 0x52."""
    from kmeans_mapreduce_spark.operators.multimodal import _lzw_decompress

    assert _lzw_decompress(bytes([0x8C, 0x23, 0x52]), 2, 6) == bytes(
        [1, 1, 1, 1, 2, 2]
    )


def test_gif_decoder_walks_container_fixture():
    """A hand-built GIF87a container (4-color table, one image, the
    hand-packed LZW stream) parses end-to-end — header grammar, LSD,
    GCT size math, image descriptor and sub-block chain all pinned
    independently of `encode_gif` (which always writes 89a + 16
    colors)."""
    from kmeans_mapreduce_spark.operators.multimodal import _decode_gif

    gif = bytearray(b"GIF87a")
    gif += struct.pack("<HHBBB", 3, 2, 0x91, 0, 0)  # GCT, 4 entries
    for i in range(4):
        gif += bytes([85 * i] * 3)
    gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, 3, 2, 0)
    gif.append(2)  # LZW min code size
    gif += bytes([3]) + bytes([0x8C, 0x23, 0x52]) + b"\x00"
    gif += b"\x3b"
    w, h, idx, gct = _decode_gif(bytes(gif))
    assert (w, h) == (3, 2)
    assert idx == bytes([1, 1, 1, 1, 2, 2])
    assert gct[:6] == bytes([0, 0, 0, 85, 85, 85])


def test_gif_rejects_malformed():
    from kmeans_mapreduce_spark.operators.multimodal import (
        _decode_gif,
        encode_gif,
    )

    good = encode_gif(5, 4, bytes([i % 16 for i in range(20)]), comment=b"c")
    with pytest.raises(ValueError, match="not a GIF"):
        _decode_gif(b"JIF87a" + good[6:])
    with pytest.raises(ValueError, match="trailer"):
        _decode_gif(good[:-1])
    # truncated mid-LZW: the stream must end WITH an end code
    i = good.index(b"\x2c")
    with pytest.raises(ValueError, match="truncated|end code|trailer"):
        _decode_gif(good[: i + 15])
    with pytest.raises(ValueError, match="indices must be 4-bit"):
        encode_gif(2, 2, bytes([1, 2, 3, 200]))
    with pytest.raises(ValueError, match="need 4 indices"):
        encode_gif(2, 2, bytes([1, 2, 3]))


def test_gif_stats_in_decode_media_dispatch(spark, sf_dir):
    """The GIF arm participates in decode_media's dispatch with
    palette-mapped semantics: slot 0 is the gray-value sum
    (17 * index sum under the grayscale table)."""
    from kmeans_mapreduce_spark.operators.multimodal import (
        GIF_MIME,
        attach_gif_payload,
        decode_media,
    )
    from kmeans_mapreduce_spark.plans.pipeline_queries import _docs

    media = attach_gif_payload(_docs(spark, sf_dir).limit(8), "doc_id", "text")
    rows = decode_media(media).collect()
    assert rows and all(r["mime"] == GIF_MIME for r in rows)
    for r in rows:
        mid, w, h = r["media_id"], r["width"], r["height"]
        idx = (mid * 7 + np.arange(w * h)) % 16
        assert r["feature"][0] == float(17 * idx.sum())
        assert r["feature"][5] == float(w * h)
