"""100x-correctness-scale stress point for the heavy operators.

Every "100 TB posture" claim in this repo is otherwise verified at
plan-shape level plus sf0.1 execution (10x the correctness scale).
This run manufactures a ~100x point and EXECUTES the heaviest
operators there, because the round-4 re-execution-trap class was only
ever caught by running, not by reading plans:

  Phase A — synthetic K-Means at true scale: the partition-parallel
  synthetic_points DataSource generates 2M x 16-dim Gaussian-blob
  points inside the executors (4000x the sf0.01 embeddings row count;
  no driver materialization), and both the reference-semantics native
  Lloyd loop and the MLlib path fit k=8 on it.

  Phase B — a 10x-replicated sf0.1 corpus (= 100x sf0.01) for the
  document/embedding operators: documents.parquet and
  embeddings.parquet are each unioned 10x with re-keyed ids into a
  stress directory, then the REAL catalog callables run against it
  (same code path the driver gates).  Replication makes the corpus
  heavily duplicate-laden — the realistic dedup workload — so the
  MinHash/dedup family does strictly more candidate work per row than
  on organic data.  Excluded by design: queries whose ORACLE side is
  the O(N^2) all-pairs baseline (dedup_ngram_jaccard,
  dedup_minhash_recall ground truth) — the production paths those
  baselines exist to verify ARE in the list.

Run this EXCLUSIVELY (no concurrent Spark JVM on the box): the
round-5 contaminated-baseline incident is why.  Results go to stdout
as one JSON line; copy the table into SCALE_RUN.md with an explicit
load statement.

Usage:  python tools/stress_run.py [--keep] [query ...]
        (bare words restrict Phase B to a subset; --keep preserves the
        stress directory for reruns)
"""

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from kmeans_mapreduce_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
STRESS_DIR = str(Path(__file__).resolve().parent.parent / ".stress_x100")
REPLICAS = 10
SYN_N = 2_000_000
SYN_DIM = 16
SYN_K = 8

# Phase B: the heavy operators the round-5 verdict named, all running
# the REAL catalog callables against the stress dir.  Each touches only
# documents.parquet / embeddings.parquet.
PHASE_B = [
    "dedup_exact",
    "dedup_minhash",
    "dedup_components",
    "dedup_simhash",
    "graph_pagerank_vectors",
    "graph_triangle_count",
    "ann_ivf_topk",
    "ann_pq_topk",
    "docs_ngram_novelty",
    "pipeline_bpe_train",
    "pipeline_bpe_apply_fixed",
    "kmeans_fit_fixed",
    "kmeans_fit_native",
    "kmeans_fit_mllib",
    # round-7 batch 22/23 heavies (documents/embeddings only; the
    # exact-all-pairs eval queries — yield curve, minhash recall —
    # stay out by design, same as dedup_ngram_jaccard)
    "pipeline_dedup_cross_source",
    "pipeline_pack_efficiency",
    "pipeline_quality_prune_sweep",
    "embedding_pq_distortion",
]


def build_stress_dir(spark) -> None:
    """10 replicas of the sf0.1 documents/embeddings with disjoint id
    ranges (offset per replica).  One job per table; the union is read
    10x from the same parquet, so build cost is bounded by write
    bandwidth."""
    out = Path(STRESS_DIR)
    if (out / "_READY").exists():
        return
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True)
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    embs = spark.read.parquet(f"{SF01}/embeddings.parquet")
    doc_parts = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        for i in range(REPLICAS)
    ]
    emb_parts = [
        embs.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        for i in range(REPLICAS)
    ]
    d = doc_parts[0]
    for p in doc_parts[1:]:
        d = d.unionByName(p)
    embs_u = emb_parts[0]
    for p in emb_parts[1:]:
        embs_u = embs_u.unionByName(p)
    d.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    embs_u.repartition(32).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )
    (out / "_READY").touch()


def main() -> int:
    subset = [a for a in sys.argv[1:] if not a.startswith("--")]
    spark = get_spark("stress-x100")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    results = {}
    rc = 0

    # --- Phase A: synthetic K-Means at 2M x 16 ---------------------------
    from kmeans_mapreduce_spark.operators.kmeans import (
        fit_kmeans_mllib,
        fit_kmeans_native,
    )
    from kmeans_mapreduce_spark.sources import synthetic

    synthetic.register(spark)
    pts = (
        spark.read.format("synthetic_points")
        .option("n", SYN_N)
        .option("dim", SYN_DIM)
        .option("k", SYN_K)
        .option("seed", 7)
        .option("partitions", 64)
        .load()
    )
    if not subset:
        t0 = time.time()
        res = fit_kmeans_native(pts, k=SYN_K, dim=SYN_DIM, seed=7, max_iter=10)
        results["syn_kmeans_native_2M"] = {
            "sec": round(time.time() - t0, 1),
            "iters": res.iterations,
            "converged": res.converged,
        }
        print("A native:", results["syn_kmeans_native_2M"], file=sys.stderr)
        t0 = time.time()
        _, assigned = fit_kmeans_mllib(pts, k=SYN_K, seed=7, max_iter=10)
        n = assigned.groupBy("cluster_id").count().count()
        results["syn_kmeans_mllib_2M"] = {
            "sec": round(time.time() - t0, 1),
            "clusters": n,
        }
        print("A mllib:", results["syn_kmeans_mllib_2M"], file=sys.stderr)

    # --- Phase B: 10x-replicated corpus through the catalog callables ----
    t0 = time.time()
    build_stress_dir(spark)
    print(f"B build: {time.time() - t0:.1f}s", file=sys.stderr)
    import __spark_entry__ as e

    qs = e.queries()
    names = subset or PHASE_B
    for name in names:
        t0 = time.time()
        try:
            nrows = qs[name](spark, STRESS_DIR).count()
            results[name] = {"sec": round(time.time() - t0, 1), "rows": nrows}
            print(f"B {name}: {results[name]}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            rc = 1
            results[name] = {"error": str(exc)[:300]}
            print(f"B {name}: ERROR {exc}", file=sys.stderr)
    print(json.dumps({"stress": results}))
    if "--keep" not in sys.argv:
        shutil.rmtree(STRESS_DIR, ignore_errors=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
