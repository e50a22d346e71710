"""Decoder fuzz contract: every real decoder, fed arbitrary or
corrupted bytes, either succeeds or raises ValueError — never
IndexError/struct.error/KeyError, never a hang.  At 100 TB a decode
stage meets wild bytes constantly; a non-ValueError escape inside a
mapInPandas task fails the whole job instead of flowing to the
quarantine path a pipeline routes ValueError rows into."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kmeans_mapreduce_spark.operators.multimodal import (
    _decode_avi,
    _decode_gif,
    _decode_pnm,
    _decode_png,
    _decode_wav,
    encode_avi,
    encode_gif,
    encode_png,
    encode_wav,
)

_DECODERS = [
    ("png", _decode_png),
    ("gif", _decode_gif),
    ("wav", _decode_wav),
    ("avi", _decode_avi),
    ("ppm", lambda b: _decode_pnm(b, b"P6")),
    ("pgm", lambda b: _decode_pnm(b, b"P5")),
    ("pbm", lambda b: _decode_pnm(b, b"P4")),
]


@settings(max_examples=150, deadline=None)
@given(data=st.binary(max_size=300))
def test_decoders_reject_garbage_with_valueerror_only(data):
    for name, dec in _DECODERS:
        try:
            dec(data)
        except ValueError:
            pass
        # anything else (struct.error, IndexError, zlib.error...) is a
        # contract violation and propagates as a test failure


def _valid_payloads():
    png = encode_png(
        5, 7, 3, bytes((i * 11) % 256 for i in range(105)), n_idat=2, text=b"t"
    )
    gif = encode_gif(
        6, 5, bytes(i % 16 for i in range(30)), comment=b"fuzz"
    )
    wav = encode_wav(
        8000, np.arange(-40, 41, dtype="<i2"), note=b"xyz"
    )
    avi = encode_avi(3, 3, 10, [bytes([f] * 9) for f in range(4)])
    return [("png", png, _decode_png), ("gif", gif, _decode_gif),
            ("wav", wav, _decode_wav), ("avi", avi, _decode_avi)]


def test_every_truncation_point_raises_valueerror():
    """Cut each valid payload at EVERY byte offset: the decoder must
    raise ValueError at every prefix (no prefix of these fixtures is
    itself valid) — exhaustive, not sampled."""
    for name, payload, dec in _valid_payloads():
        for cut in range(len(payload)):
            with pytest.raises(ValueError):
                dec(payload[:cut])


def test_single_byte_corruption_never_escapes_valueerror():
    """Flip one byte at every offset: the decoder either still
    succeeds (flips in skipped/ancillary regions may be invisible or
    caught later) or raises ValueError — no other exception type at
    any offset."""
    for name, payload, dec in _valid_payloads():
        for i in range(len(payload)):
            bad = bytearray(payload)
            bad[i] ^= 0x41
            try:
                dec(bytes(bad))
            except ValueError:
                pass


def test_stats_wrappers_honor_the_valueerror_contract():
    """The _REAL_STATS wrappers — the functions decode_media_safe
    actually dispatches — must ALSO stay inside the ValueError
    contract, including on DEGENERATE container-valid payloads the
    bare decoders accept: a WAV with an empty data chunk, a zero-frame
    AVI, a GIF with no global color table.  (Found by review: these
    raised IndexError through the stats layer and would have aborted
    the quarantine operator's task.)"""
    import struct

    from kmeans_mapreduce_spark.operators.multimodal import _REAL_STATS

    # container-valid, content-degenerate payloads
    empty_wav = encode_wav(8000, np.array([], dtype="<i2"))
    zero_frame_avi = encode_avi(3, 3, 10, [])
    gif = bytearray(b"GIF87a")
    gif += struct.pack("<HHBBB", 2, 1, 0x00, 0, 0)  # NO global color table
    gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 1, 0)
    gif.append(2)
    gif += bytes([2, 0x0C, 0x0A]) + b"\x00\x3b"  # clear,1,0,end @3 bits
    degenerates = [bytes(empty_wav), bytes(zero_frame_avi), bytes(gif)]
    for payload in degenerates:
        for name, stats in _REAL_STATS.items():
            try:
                stats(payload)
            except ValueError:
                pass


@settings(max_examples=80, deadline=None)
@given(data=st.binary(max_size=300))
def test_stats_wrappers_reject_garbage_with_valueerror_only(data):
    from kmeans_mapreduce_spark.operators.multimodal import _REAL_STATS

    for name, stats in _REAL_STATS.items():
        try:
            stats(data)
        except ValueError:
            pass


def test_encoders_reject_zero_area_dims():
    """encode_gif/encode_png must refuse width or height 0: a 0x0 GIF
    passed the length check then crashed _lzw_compress with IndexError;
    a 0xH PNG encoded a payload our own decoder's IHDR check rejects.
    The encoders now share the decoders' >= 1 dimension contract."""
    import pytest

    from kmeans_mapreduce_spark.operators.multimodal import (
        encode_gif,
        encode_png,
    )

    for w, h in [(0, 0), (0, 5), (5, 0)]:
        with pytest.raises(ValueError, match=">= 1"):
            encode_gif(w, h, b"")
        with pytest.raises(ValueError, match=">= 1"):
            encode_png(w, h, 1, b"")
