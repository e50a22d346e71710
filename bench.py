"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is total wall-clock over the headline set — the
queries that exercise every engine subsystem: the full native K-Means
loop, the MLlib path, heavy relational joins/aggs, the scalable dedup
pipeline (MinHash LSH — the N^2-free path), ANN, and the text stack.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: name -> catalog key.  Each runs via the same callables the
# correctness gate checks, so bench and correctness can't drift apart.
HEADLINE = [
    "kmeans_fit_native",
    "kmeans_fit_mllib",
    "kmeans_fit_lineitem",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "window_top_orders",
    "agg_cube_lineitem",
    "asof_events_orders",
    "events_sessionize",
    "dedup_exact",
    "dedup_minhash",
    "ann_brute_topk",
    "ann_lsh_topk",
    "text_quality",
    "mm_decode",
]


def main() -> None:
    from kmeans_mapreduce_spark.plans.catalog import QUERIES
    from kmeans_mapreduce_spark.session import get_spark

    spark = get_spark("bench")
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])

    # warm the JVM + parquet footers so per-query numbers measure the
    # plan, not first-touch JIT/IO noise
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    # warm the Python/Arrow workers too: one trivial mapInPandas across
    # all cores forks the daemons and imports pandas/pyarrow once, so
    # the pandas-path queries measure the operator, not 32 interpreter
    # cold starts (~10s of noise otherwise, all landing on mm_decode)
    spark.range(0, int(cpus := spark.sparkContext.defaultParallelism), 1, cpus).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, SF_DIR)
        n = df.count()  # full materialization of the result
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
