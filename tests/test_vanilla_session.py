"""Contract test: the catalog must run on an EXTERNALLY-built session.

Every local harness (tests, tools/compare.py, bench.py, audit_plans.py)
builds its session via ``session.get_spark``, which pre-sets confs like
``spark.sql.legacy.parquet.nanosAsLong`` and the UTC session TZ.  The
round driver does NOT — it passes its own bare ``SparkSession``.  Two
driver-only regressions (round-2 ts-layout, round-4 conf-guard
TYPE_MISMATCH) hid in exactly that gap: code that only works when
``get_spark`` already prepared the session.

This test closes the blind spot by running a representative catalog
slice in a SUBPROCESS with a vanilla ``SparkSession.builder`` session —
none of ``get_spark``'s confs, fresh JVM, same as the driver.  The slice
covers each loader family that does session-conf probing or layout
sniffing: an ``_events`` query (the round-4 failure class), a TPC-H
relational query, a pipeline/text query, and the streaming events
loader.
"""

from __future__ import annotations

import pytest

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF_DIR = "/root/testdata/sf0.001"

# One query per loader/operator family.  Keep the slice small (fresh
# JVM is the expensive part) but make every conf-probing or
# session-assuming code path fire at least once.
SLICE = [
    "events_ohlc_rollup",  # _events loader: nanosAsLong + TZ guards
    "events_ewma",  # analytics.py's own _events route
    "q1_pricing_summary",  # plain relational scan path
    "text_quality",  # documents/pipeline path
    "dedup_minhash",  # signature/cache-heavy dedup path
    "km_assign",  # K-Means expression path
    "ann_brute_topk_pandas",  # Arrow pandas-UDF path (arrow conf unset)
    # round-5 additions: build-time collects + localCheckpoint paths
    "ann_pq_fixed_topk",
    "pipeline_ngram_contamination",
    "pipeline_bpe_train",
    # batches 18-20 (rotate into the round-6 driver window): decimal-sum
    # DSIR scoring, broadcast bloom bits, _events-routed watermark audit
    "pipeline_dsir_select",
    "dedup_bloom_probe",
    "events_watermark_audit",
    "ann_lsh_recall",
    # round-7 additions: the driver-loop collect paths (integer Lloyd
    # fixpoint, fixed-merge fold, recall contract, yield-curve collect)
    "kmeans_fit_fixed",
    "pipeline_bpe_apply_fixed",
    "dedup_minhash_recall",
    "pipeline_dedup_yield_curve",
    "pipeline_sample_temperature",
]

CHILD = r"""
import json, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

# Deliberately bare: no get_spark, no nanosAsLong, no UTC TZ, default
# shuffle partitions.  This mirrors the round driver's session exactly.
spark = (
    SparkSession.builder.master("local[2]")
    .appName("vanilla-contract")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)

import __spark_entry__ as e

out = {{}}
qs = e.queries()
for name in {slice!r}:
    try:
        df = qs[name](spark, {sf_dir!r})
        out[name] = {{"rows": df.count(), "cols": df.columns}}
    except Exception as ex:  # noqa: BLE001 - report, don't crash the probe
        out[name] = {{"error": f"{{type(ex).__name__}}: {{ex}}"[:500]}}

# Streaming loader does the same conf probing; exercise its build path
# (plan construction is where the guard fires — no need to run the stream).
try:
    from kmeans_mapreduce_spark.streaming.windows import events_stream_source
    sdf = events_stream_source(spark, {sf_dir!r} + "/events.parquet")
    out["__stream_loader__"] = {{"cols": sdf.columns}}
except Exception as ex:  # noqa: BLE001
    out["__stream_loader__"] = {{"error": f"{{type(ex).__name__}}: {{ex}}"[:500]}}

print("VANILLA_RESULT " + json.dumps(out))
spark.stop()
"""


@pytest.mark.slow
def test_catalog_slice_on_vanilla_session():
    code = CHILD.format(repo=str(REPO), slice=SLICE, sf_dir=SF_DIR)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(REPO),
    )
    marker = [l for l in proc.stdout.splitlines() if l.startswith("VANILLA_RESULT ")]
    assert marker, (
        f"child produced no result line\nstdout:\n{proc.stdout[-2000:]}"
        f"\nstderr:\n{proc.stderr[-3000:]}"
    )
    out = json.loads(marker[0][len("VANILLA_RESULT "):])
    errors = {k: v["error"] for k, v in out.items() if "error" in v}
    assert not errors, f"queries failed on a vanilla session: {errors}"
    for name in SLICE:
        assert out[name]["rows"] >= 0
