"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full reference-semantics K-Means on sf0.001 embeddings.

    Farthest-point init (seeded), Lloyd loop with mean-movement stop rule
    (reference master.go:123-236), then the cluster-size report the
    reference prints (client.go:211-214) joined with final centroids'
    first coordinate as a sanity column.
    """
    from kmeans_mapreduce_spark.operators.kmeans import (
        assign_clusters,
        fit_kmeans_native,
    )
    from kmeans_mapreduce_spark.sources.ingest import points_from_embeddings

    pts = points_from_embeddings(spark, "/root/testdata/sf0.001", dim=64)
    res = fit_kmeans_native(pts, k=10, dim=64, seed=42)
    assigned = assign_clusters(pts, res.centroids)
    from pyspark.sql import functions as F

    return (
        assigned.groupBy("cluster_id")
        .agg(F.count("*").alias("size"))
        .orderBy("cluster_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kmeans_mapreduce_spark.plans.catalog import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from kmeans_mapreduce_spark.plans.catalog import ORACLES

    return dict(ORACLES)
