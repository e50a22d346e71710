"""The events.ts normalization perimeter: batch (_events) and streaming
(events_stream_source) must produce identical UTC TIMESTAMP event-times
for EVERY parquet layout the harness has shipped or could ship —
TIMESTAMP(NANOS), timestamp[us] (TIMESTAMP_NTZ), and tz-aware
timestamp[us] (TIMESTAMP_LTZ).  Round 2 lost its entire driver bench to
an untested layout change; this file makes that class of regression a
local test failure instead."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

ROWS = [
    (1, 1704103200_000_000, 7, "click", 1.5, "{}"),       # 2024-01-01 10:00:00
    (2, 1704106800_000_000, 7, "purchase", 2.5, "{}"),    # 2024-01-01 11:00:00
    (3, 1704110399_999_999, 8, "view", 3.5, "{}"),        # 2024-01-01 11:59:59.999999
]
EXPECT = {
    1: "2024-01-01 10:00:00",
    2: "2024-01-01 11:00:00",
    3: "2024-01-01 11:59:59",
}


def _write(path: str, ts_type: pa.DataType) -> None:
    ts_vals = [
        int(us * 1000) if ts_type.unit == "ns" else us for _, us, *_ in ROWS
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": pa.array(ts_vals, ts_type),
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS], pa.string()),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array([r[5] for r in ROWS], pa.string()),
        }
    )
    pq.write_table(t, path)


LAYOUTS = {
    "nanos": pa.timestamp("ns"),
    "micros_ntz": pa.timestamp("us"),
    "micros_utc": pa.timestamp("us", tz="UTC"),
}


@pytest.mark.parametrize("name", list(LAYOUTS))
def test_batch_events_normalizes_every_layout(spark, tmp_path, name):
    from kmeans_mapreduce_spark.plans.relational import _events

    d = tmp_path / name
    d.mkdir()
    _write(str(d / "events.parquet"), LAYOUTS[name])
    ev = _events(spark, str(d))
    assert dict(ev.dtypes)["ts"] == "timestamp", dict(ev.dtypes)
    got = {
        r["event_id"]: r["s"]
        for r in ev.select(
            "event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("s")
        ).collect()
    }
    assert got == EXPECT, (name, got)
    # unix_micros (the sessionize dependency that broke in round 2)
    # must type-check and round-trip the stored micros exactly
    us = {
        r["event_id"]: r["us"]
        for r in ev.select("event_id", F.unix_micros("ts").alias("us")).collect()
    }
    assert us == {r[0]: r[1] for r in ROWS}, (name, us)


@pytest.mark.parametrize("name", list(LAYOUTS))
def test_stream_source_matches_batch_every_layout(spark, tmp_path, name):
    from kmeans_mapreduce_spark.streaming.windows import events_stream_source

    d = tmp_path / name
    d.mkdir()
    _write(str(d / "events.parquet"), LAYOUTS[name])
    src = events_stream_source(spark, str(d))
    assert src.isStreaming
    assert dict(src.dtypes)["ts"] == "timestamp", dict(src.dtypes)
    out = str(tmp_path / f"out_{name}")
    q = (
        src.select("event_id", F.unix_micros("ts").alias("us"))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["event_id"]: r["us"] for r in spark.read.parquet(out).collect()}
    assert got == {r[0]: r[1] for r in ROWS}, (name, got)
