"""Property tests for the deterministic sampler and OHLC aggregation
shape: the Spark expressions must match plain-Python references for
arbitrary inputs (the cross-engine oracle contract rides on this)."""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark_m(spark):
    return spark


def _py_bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=12, unique=True))
def test_md5_bucket_matches_python(spark_m, ids):
    """The sampler's md5 bucket expression == hashlib reference for
    arbitrary ids — this equality is exactly why the DuckDB oracle can
    hash-match the SPLIT itself, not just its size."""
    df = spark_m.createDataFrame([(i,) for i in ids], "doc_id long")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("int")
    got = {r["doc_id"]: r["b"] for r in df.select("doc_id", bucket.alias("b")).collect()}
    assert got == {i: _py_bucket(i) for i in ids}


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3600 * 6 - 1),  # seconds offset
            st.sampled_from(["a", "b"]),
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],  # unique ts => min_by/max_by deterministic
    )
)
def test_ohlc_agg_matches_python(spark_m, rows):
    """min_by/max_by OHLC per (hour, type) == a plain-Python fold over
    the same rows (open = value at earliest ts, close at latest)."""
    base = datetime(2024, 3, 1)
    data = [(base + timedelta(seconds=s), t, float(v)) for s, t, v in rows]
    df = spark_m.createDataFrame(data, "ts timestamp, typ string, value double")
    got = {
        (r["h"], r["typ"]): (r["open"], r["high"], r["low"], r["close"], r["n"])
        for r in df.groupBy(
            F.date_trunc("hour", "ts").alias("h"), "typ"
        )
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    ref: dict = {}
    for ts, typ, v in data:
        key = (ts.replace(minute=0, second=0, microsecond=0), typ)
        ref.setdefault(key, []).append((ts, v))
    want = {}
    for key, vals in ref.items():
        vals.sort()
        want[key] = (
            vals[0][1],
            max(v for _, v in vals),
            min(v for _, v in vals),
            vals[-1][1],
            len(vals),
        )
    assert got == want
    for o, h, lo, c, _ in got.values():
        assert lo <= o <= h and lo <= c <= h
