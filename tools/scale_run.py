"""Whole-catalog scale smoke + re-execution regression gate.

Runs EVERY queries() entry end-to-end at sf0.1 (default), reports
per-query wall clock + errors, and — when tools/SCALE_BASELINE.json
exists — flags any query whose slowdown vs its recorded baseline is
far out of line with the run-wide median slowdown.

Why the median-normalized ratio: this box is shared, so ALL queries
drift together by 1.5-3x with host load (BASELINE.md round-2 caveat).
A real plan regression — the round-4 class where an iterative
operator's uncached input was re-executed every round, 3-5x wall
clock on ONE query — moves a single query against the pack.  So the
gate is:  t_q / baseline_q  >  GATE_K * median_ratio  AND  t_q >
ABS_FLOOR (small queries jitter too much to gate).

Usage:
    python tools/scale_run.py [sf_dir] [--update-baseline] [query ...]

Bare-word args (no "/") name a catalog subset to run — the compare.py
convention.  With --update-baseline, a subset run MERGES its timings
into the existing baseline instead of rewriting it, so adding a query
batch costs one subset run, not a full-catalog rerun.  (A full run
still rewrites the file outright, dropping entries for queries that no
longer exist.)

Exit status: 1 if any query errored or any regression flagged (so CI
can gate on it); 0 otherwise.  --update-baseline rewrites
tools/SCALE_BASELINE.json from this run — do that only on a run whose
SLOWEST table you've reviewed.  The companion prose artifact is
SCALE_RUN.md.
"""
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from kmeans_mapreduce_spark.session import get_spark  # noqa: E402
import __spark_entry__ as e  # noqa: E402

GATE_K = 3.0  # per-query ratio must exceed 3x the median ratio ...
ABS_FLOOR = 5.0  # ... AND 5s wall clock before we call it a regression
BASELINE_PATH = Path(__file__).resolve().parent / "SCALE_BASELINE.json"

update_baseline = "--update-baseline" in sys.argv
args = [a for a in sys.argv[1:] if not a.startswith("--")]
sf_dir = next((a for a in args if "/" in a), "/root/testdata/sf0.1")
subset = [a for a in args if "/" not in a]

spark = get_spark("catalog-sf01")
spark.conf.set("spark.sql.shuffle.partitions", "64")
from kmeans_mapreduce_spark.session import quiet_audited_window_warnings  # noqa: E402

quiet_audited_window_warnings(spark)  # audited bounded-aggregate windows
qs = e.queries()
if subset:
    unknown = sorted(set(subset) - set(qs))
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    qs = {n: qs[n] for n in subset}
results = []
for name, fn in qs.items():
    t0 = time.time()
    try:
        n = fn(spark, sf_dir).count()
        dt = time.time() - t0
        results.append((dt, name, n, None))
        print(f"ok   {name}: {n} rows {dt:.1f}s", flush=True)
    except Exception as exc:
        dt = time.time() - t0
        results.append((dt, name, -1, str(exc)[:200]))
        print(f"ERR  {name}: {exc}", flush=True)

results.sort(reverse=True)
print("\nSLOWEST:")
for dt, name, n, err in results[:12]:
    print(f"  {dt:6.1f}s {name}")
errs = [r for r in results if r[3]]
print(f"\nerrors: {len(errs)}")

times = {name: dt for dt, name, n, err in results if err is None}
flagged = []
if BASELINE_PATH.exists() and not update_baseline:
    base = json.loads(BASELINE_PATH.read_text())
    ratios = {
        q: times[q] / base[q]
        for q in times
        if q in base and base[q] > 0.1  # sub-100ms baselines are noise
    }
    if ratios:
        med = statistics.median(ratios.values())
        print(f"\nmedian slowdown vs baseline: {med:.2f}x ({len(ratios)} queries)")
        for q, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
            if r > GATE_K * med and times[q] > ABS_FLOOR:
                flagged.append((q, r, base[q], times[q]))
        for q, r, b, t in flagged:
            print(
                f"REGRESSION {q}: {t:.1f}s vs baseline {b:.1f}s "
                f"({r:.1f}x; gate {GATE_K}x median {med:.2f}x) — "
                f"likely an uncached re-executed frame; check the "
                f"query's iterative inputs and PLAN_INVENTORY.md"
            )
        if not flagged:
            print("regression gate: clean")
    new = sorted(set(times) - set(base))
    if new:
        print(f"not in baseline (new queries, unchecked): {len(new)}: {new[:8]}...")

if update_baseline:
    if subset and BASELINE_PATH.exists():
        merged = json.loads(BASELINE_PATH.read_text())
        merged.update(times)
        times = merged
    BASELINE_PATH.write_text(json.dumps(times, indent=0, sort_keys=True))
    print(f"baseline updated: {BASELINE_PATH} ({len(times)} queries)")

sys.exit(1 if (errs or flagged) else 0)
