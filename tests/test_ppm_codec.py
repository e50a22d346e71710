"""Real PPM (P6) codec tests: hand-computed fixtures, format edge
cases, and the decode -> resize -> tiles pipeline over genuine bytes.

The pure-Python parser (operators/multimodal._decode_ppm) is the one
REAL codec in the repo — everything here pins it against byte-level
fixtures computed by hand, independent of the encoder."""

from __future__ import annotations

import pytest

from kmeans_mapreduce_spark.operators import multimodal as MM
from kmeans_mapreduce_spark.operators.multimodal import (
    PPM_MIME,
    _decode_ppm,
    _ppm_stats,
    encode_ppm,
)

# 2x2 image, pixels (r,g,b): (10,20,30) (40,50,60) / (70,80,90) (1,2,3)
_PIXELS = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 1, 2, 3])
_PLAIN = b"P6\n2 2\n255\n" + _PIXELS


def test_decode_hand_fixture():
    w, h, raster = _decode_ppm(_PLAIN)
    assert (w, h) == (2, 2)
    assert raster == _PIXELS


def test_decode_header_variants():
    # comments anywhere whitespace is legal, CRLF, multi-space runs
    variants = [
        b"P6 2 2 255\n" + _PIXELS,
        b"P6\n# a comment\n2 2\n255\n" + _PIXELS,
        b"P6\n2 # trailing comment\n2\n255\n" + _PIXELS,
        b"P6\r\n2\t2\r\n255 " + _PIXELS,
        b"P6\n#c1\n#c2\n  2\n\n2\n255\n" + _PIXELS,
    ]
    for payload in variants:
        w, h, raster = _decode_ppm(payload)
        assert (w, h, raster) == (2, 2, _PIXELS), payload[:20]


def test_decode_raster_offset_is_exactly_one_byte():
    # a raster may START with a whitespace-looking byte (0x0A = 10):
    # the parser must consume exactly ONE separator, not skip into the
    # raster — this is the classic P6 off-by-N bug
    px = bytes([10, 10, 10]) * 4  # every byte looks like '\n'
    w, h, raster = _decode_ppm(b"P6\n2 2\n255\n" + px)
    assert raster == px


def test_decode_rejects_malformed():
    for bad in [
        b"P5\n2 2\n255\n" + _PIXELS,  # wrong magic (P5 is grayscale)
        b"P6\n2 2\n65535\n" + _PIXELS * 2,  # 16-bit maxval unsupported
        b"P6\n2 2\n255\n" + _PIXELS[:-1],  # truncated raster
        b"P6\n2 2\n",  # truncated header
        b"P6\n2 -2\n255\n" + _PIXELS,  # negative dim ('-' not a digit)
        b"P6\n0 2\n255\n",  # zero dim
        # maxval followed by a non-whitespace raster byte: consuming it
        # as the separator would shift the raster by one (regression for
        # the blind pos += 1)
        b"P6\n2 2\n255" + bytes([65] * 12) + b"x",
        b"P62 2\n255\n" + _PIXELS,  # magic not whitespace-delimited
    ]:
        with pytest.raises(ValueError):
            _decode_ppm(bad)


def test_encode_decode_roundtrip():
    for w, h in [(1, 1), (3, 5), (16, 14)]:
        px = bytes((i * 37) % 256 for i in range(3 * w * h))
        assert _decode_ppm(encode_ppm(w, h, px)) == (w, h, px)
    with pytest.raises(ValueError):
        encode_ppm(2, 2, b"short")


def test_stats_hand_computed():
    n_bytes, w, h, feat = _ppm_stats(_PLAIN)
    assert n_bytes == len(_PLAIN) and (w, h) == (2, 2)
    # [sum_r, sum_g, sum_b, first, last, n_px, min, max]
    assert feat == [
        float(10 + 40 + 70 + 1),
        float(20 + 50 + 80 + 2),
        float(30 + 60 + 90 + 3),
        10.0,
        3.0,
        4.0,
        1.0,
        90.0,
    ]


def test_decode_media_dispatches_on_mime(spark):
    rows = [
        (1, bytearray(_PLAIN), PPM_MIME),
        (2, bytearray(b"not an image, goes through the fake path"), "image/fake"),
    ]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in MM.decode_media(df).collect()}
    assert (out[1]["width"], out[1]["height"]) == (2, 2)  # REAL parse
    assert out[1]["feature"][0] == 121.0
    assert out[2]["width"] == 64 + (len(rows[1][1]) % 64)  # fake path


def test_resize_nearest_neighbor_hand_computed(spark):
    # 4x2 image downscaled to max_side=2 -> thumb 2x1 (integer math:
    # tw = 4*2//4 = 2, th = max(1, 2*2//4) = 1); NN picks source rows
    # sy = 0*2//1 = 0 and cols sx = (0*4//2, 1*4//2) = (0, 2)
    px = bytes(range(24))  # pixel (y,x) byte = 3*(y*4+x)+c
    df = spark.createDataFrame(
        [(7, bytearray(encode_ppm(4, 2, px)), PPM_MIME)], MM.MEDIA_SCHEMA
    )
    r = MM.resize_media(df, max_side=2).collect()[0]
    assert (r["thumb_width"], r["thumb_height"]) == (2, 1)
    # thumb pixels = source (0,0) and (0,2): bytes 0,1,2 and 6,7,8
    assert r["thumb_feature"] == [0.0 + 6, 1.0 + 7, 2.0 + 8, 24.0]


def test_attach_ppm_payload_is_genuine_p6(spark, sf_dir):
    from kmeans_mapreduce_spark.plans.pipeline_queries import _docs

    media = MM.attach_ppm_payload(_docs(spark, sf_dir).limit(5), "doc_id", "text")
    for r in media.collect():
        w, h, raster = _decode_ppm(bytes(r["payload"]))  # parses for real
        assert 4 <= w <= 16 and 4 <= h <= 14
        # content follows the generative formula the oracles recompute
        mid = r["media_id"]
        assert raster[0] == (mid * 7) % 256
        assert raster[-1] == (mid * 7 + 3 * w * h - 1) % 256


# --- hypothesis: parser robustness over generated headers -------------------

from hypothesis import given, settings, strategies as st

_ws = st.sampled_from([b" ", b"\t", b"\r", b"\n", b"\x0b", b"\x0c"])


@st.composite
def _sep(draw):
    """1-3 whitespace bytes, optionally carrying a comment."""
    parts = [draw(_ws)]
    if draw(st.booleans()):
        comment = draw(
            st.binary(min_size=0, max_size=8).filter(
                lambda b: b"\n" not in b and b"\r" not in b
            )
        )
        parts += [b"#", comment, b"\n"]
    parts += [draw(_ws)] * draw(st.integers(0, 2))
    return b"".join(parts)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    s1=_sep(),
    s2=_sep(),
    s3=_sep(),
    last=_ws,
    data=st.data(),
)
def test_decode_generated_headers(w, h, s1, s2, s3, last, data):
    px = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=3 * w * h, max_size=3 * w * h
    )))
    payload = (
        b"P6" + s1 + str(w).encode() + s2 + str(h).encode() + s3
        + b"255" + last + px
    )
    assert _decode_ppm(payload) == (w, h, px)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    s1=_sep(),
    s2=_sep(),
    s3=_sep(),
    last=_ws,
    data=st.data(),
)
def test_decode_generated_headers_pgm(w, h, s1, s2, s3, last, data):
    """P5 arm over the same generated-header space: the shared scanner
    must handle whitespace runs/comments identically with a 1-byte/px
    raster length."""
    from kmeans_mapreduce_spark.operators.multimodal import _decode_pgm

    px = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=w * h, max_size=w * h
    )))
    payload = (
        b"P5" + s1 + str(w).encode() + s2 + str(h).encode() + s3
        + b"255" + last + px
    )
    assert _decode_pgm(payload) == (w, h, px)


def test_pnm_magic_cross_rejection():
    """A P6 payload must not decode through the P5 arm and vice versa —
    the mime dispatch depends on the magic check, not just raster math."""
    import pytest as _pytest

    from kmeans_mapreduce_spark.operators.multimodal import (
        _decode_pgm,
        _decode_ppm,
        encode_pgm,
        encode_ppm,
    )

    p6 = encode_ppm(2, 2, bytes(range(12)))
    p5 = encode_pgm(2, 2, bytes(range(4)))
    with _pytest.raises(ValueError, match="not a P5"):
        _decode_pgm(p6)
    with _pytest.raises(ValueError, match="not a P6"):
        _decode_ppm(p5)


def test_pbm_padding_bits_masked():
    """P4's row padding must not leak into the set-bit count: a 10x3
    bitmap (2 bytes/row, 6 padding bits each) with all-ones padding
    counts only the true-grid bits."""
    import numpy as np

    from kmeans_mapreduce_spark.operators.multimodal import (
        _decode_pbm,
        _pbm_stats,
        encode_pbm,
    )

    packed = bytes([0b10110001, 0b11000000, 0xFF, 0xFF, 0x00, 0b11000000])
    pay = encode_pbm(10, 3, packed)
    assert _decode_pbm(pay) == (10, 3, packed)
    _, w, h, feat = _pbm_stats(pay)
    want = int(
        np.unpackbits(
            np.frombuffer(packed, dtype=np.uint8).reshape(3, 2), axis=1
        )[:, :10].sum()
    )
    raw = sum(bin(b).count("1") for b in packed)
    assert feat[0] == want
    assert want < raw  # the padding carried set bits this test masks


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 17),
    h=st.integers(1, 9),
    s1=_sep(),
    s2=_sep(),
    last=_ws,
    data=st.data(),
)
def test_decode_generated_headers_pbm(w, h, s1, s2, last, data):
    """P4 over generated headers: TWO header tokens (no maxval) and a
    ceil(w/8)*h raster through the same whitespace/comment scanner."""
    from kmeans_mapreduce_spark.operators.multimodal import _decode_pbm

    n = ((w + 7) // 8) * h
    px = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=n, max_size=n
    )))
    payload = (
        b"P4" + s1 + str(w).encode() + s2 + str(h).encode() + last + px
    )
    assert _decode_pbm(payload) == (w, h, px)


def test_histogram_gif_branch_rejects_gct_less_gif(spark):
    """The histogram's GIF branch must mirror _gif_stats on a
    structurally valid GIF with NO global color table: raise the
    contract ValueError, not an IndexError from an empty palette
    lookup (found by review in round 11's ADVICE)."""
    import struct

    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    gif = bytearray(b"GIF87a")
    gif += struct.pack("<HHBBB", 2, 1, 0x00, 0, 0)  # NO global color table
    gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 1, 0)
    gif.append(2)
    gif += bytes([2, 0x0C, 0x0A]) + b"\x00\x3b"
    df = spark.createDataFrame(
        [(1, bytearray(gif), MM.GIF_MIME)], MM.MEDIA_SCHEMA
    )
    with pytest.raises((PythonException, Py4JJavaError)) as exc:
        MM.ppm_pixel_histogram(df).collect()
    assert "global color table" in str(exc.value)
    assert "IndexError" not in str(exc.value)


def test_gif_decode_stats_rejects_gct_less_gif(spark):
    """gif_decode_stats performs the same palette lookup as the
    histogram's GIF branch and must honor the same contract on a
    structurally valid GCT-less GIF: ValueError, never IndexError
    (the third lookup site, found by the round-12 second review)."""
    import struct

    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    gif = bytearray(b"GIF87a")
    gif += struct.pack("<HHBBB", 2, 1, 0x00, 0, 0)  # NO global color table
    gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 1, 0)
    gif.append(2)
    gif += bytes([2, 0x0C, 0x0A]) + b"\x00\x3b"
    df = spark.createDataFrame(
        [(1, bytearray(gif), MM.GIF_MIME)], MM.MEDIA_SCHEMA
    )
    with pytest.raises((PythonException, Py4JJavaError)) as exc:
        MM.gif_decode_stats(df).collect()
    assert "global color table" in str(exc.value)
    assert "IndexError" not in str(exc.value)
