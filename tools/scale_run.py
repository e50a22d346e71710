"""Whole-catalog scale smoke: run EVERY queries() entry end-to-end at
sf0.1 (default) and report per-query wall clock + errors.  The
companion artifact is SCALE_RUN.md.  Usage:

    python tools/scale_run.py [sf_dir]
"""
import sys, time, traceback
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from kmeans_mapreduce_spark.session import get_spark
import __spark_entry__ as e

spark = get_spark("catalog-sf01")
spark.conf.set("spark.sql.shuffle.partitions", "64")
qs = e.queries()
sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
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
