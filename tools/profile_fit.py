"""Per-iteration timing breakdown of the native Lloyd loop.

Usage: python tools/profile_fit.py [embeddings|lineitem|mllib]

Instruments one fit at $SPARK_GRAFT_SF_DIR: wall per phase (cache
materialization, init, each iteration's createDataFrame / plan-build /
collect), so the optimization targets the measured cost, not a guess
(guide §1).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def profile_native(spark, pts, k: int, dim: int, init, max_iter: int = 100):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from kmeans_mapreduce_spark.operators.kmeans import (
        DELTA_THRESHOLD,
        _assign_expr,
        compute_delta,
    )

    cent_schema = T.StructType(
        [T.StructField("_C", T.ArrayType(T.ArrayType(T.DoubleType())))]
    )
    centroids = [list(c) for c in init]
    it = 0
    t_create = t_plan = t_collect = 0.0
    while it < max_iter:
        it += 1
        t0 = time.perf_counter()
        cent_df = spark.createDataFrame([(centroids,)], cent_schema)
        t1 = time.perf_counter()
        assigned = pts.crossJoin(F.broadcast(cent_df)).withColumn(
            "cluster_id", _assign_expr("features")
        )
        if dim <= 16:
            plan = assigned.groupBy("cluster_id").agg(
                F.count("*").alias("cnt"),
                *[F.sum(F.col("features")[i]).alias(f"s{i}") for i in range(dim)],
            )
        else:
            plan = (
                assigned.select(
                    "cluster_id", F.posexplode("features").alias("pos", "x")
                )
                .groupBy("cluster_id", "pos")
                .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            )
        t2 = time.perf_counter()
        rows = plan.collect()
        t3 = time.perf_counter()
        t_create += t1 - t0
        t_plan += t2 - t1
        t_collect += t3 - t2
        new = [list(c) for c in centroids]
        if dim <= 16:
            for r in rows:
                new[r["cluster_id"]] = [r[f"s{i}"] / r["cnt"] for i in range(dim)]
        else:
            for r in rows:
                new[r["cluster_id"]][r["pos"]] = r["s"] / r["n"]
        delta = compute_delta(centroids, new)
        centroids = new
        if delta < DELTA_THRESHOLD:
            break
    print(
        f"iters={it} create={t_create:.2f}s plan_build={t_plan:.2f}s "
        f"collect={t_collect:.2f}s per_iter_collect={t_collect / it * 1000:.0f}ms"
    )
    return centroids


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "embeddings"
    from pyspark.sql import functions as F

    from kmeans_mapreduce_spark.session import get_spark

    spark = get_spark("profile-fit")
    t0 = time.perf_counter()
    if which == "embeddings":
        from kmeans_mapreduce_spark.sources.ingest import points_from_embeddings

        pts = points_from_embeddings(spark, SF_DIR, dim=64).select("id", "features").cache()
        init = [
            list(r["features"])
            for r in pts.where(F.col("id") < 4).orderBy("id").collect()
        ]
        t1 = time.perf_counter()
        print(f"cache+init: {t1 - t0:.2f}s")
        profile_native(spark, pts, 4, 64, init)
        t2 = time.perf_counter()
        print(f"loop total: {t2 - t1:.2f}s")
    elif which == "lineitem":
        from kmeans_mapreduce_spark.sources.ingest import points_from_columns

        cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").withColumn(
            "rid", F.col("l_orderkey") * 10 + F.col("l_linenumber")
        )
        pts = points_from_columns(li, cols, id_col="rid").cache()
        stats = pts.select(
            *[F.avg(F.col("features")[i]).alias(f"m{i}") for i in range(4)],
            *[F.stddev_pop(F.col("features")[i]).alias(f"s{i}") for i in range(4)],
        ).collect()[0]
        mu = [float(stats[f"m{i}"]) for i in range(4)]
        sd = [float(stats[f"s{i}"]) for i in range(4)]
        z = F.array(
            *[(F.col("features")[i] - F.lit(mu[i])) / F.lit(sd[i]) for i in range(4)]
        )
        zpts = pts.select("id", z.alias("features"))
        init = [
            [(float(x) - m) / s for x, m, s in zip(r["features"], mu, sd)]
            for r in pts.orderBy("id").limit(4).collect()
        ]
        t1 = time.perf_counter()
        print(f"cache+stats+init: {t1 - t0:.2f}s")
        profile_native(spark, zpts, 4, 4, init, max_iter=10)
        t2 = time.perf_counter()
        print(f"loop total: {t2 - t1:.2f}s")
    else:  # mllib
        from kmeans_mapreduce_spark.operators.kmeans import fit_kmeans_mllib
        from kmeans_mapreduce_spark.sources.ingest import points_from_embeddings

        pts = points_from_embeddings(spark, SF_DIR, dim=64)
        t1 = time.perf_counter()
        model, assigned = fit_kmeans_mllib(pts, k=10, seed=42)
        n = assigned.groupBy("cluster_id").count().count()
        t2 = time.perf_counter()
        print(f"mllib fit+sizes: {t2 - t1:.2f}s ({n} clusters) "
              f"iters={model.summary.numIter}")


if __name__ == "__main__":
    main()
