"""Sinks: partitioned cluster CSV dump + cluster-size report.

Reference parity:
  * CSV sink (reference main/client/client.go:236-256): one
    ``cluster_<i>.csv`` per cluster, rows ``[id, coord...]``.  Spark-first
    replacement is a single distributed ``partitionBy('cluster_id')``
    write — one directory per cluster, arbitrarily many part files, no
    driver collect (the reference materializes every cluster member on
    the driver, which is exactly what cannot happen at 100 TB).
  * Size report (client.go:211-214, master.go:213-227): cluster sizes +
    convergence message.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_clusters_csv(assigned: DataFrame, path: str, mode: str = "overwrite") -> None:
    """assigned[id, features, cluster_id] -> path/cluster_id=<i>/*.csv.

    Coordinates are exploded to one column per dimension (CSV has no
    array type); scientific notation like the reference's FormatFloat
    'E' (client.go:247) via format_string.
    """
    dim = len(assigned.select("features").head()["features"])
    cols = [F.col("id")] + [
        F.format_string("%E", F.col("features")[i]).alias(f"c{i}") for i in range(dim)
    ]
    (
        assigned.select(F.col("cluster_id"), *cols)
        .write.mode(mode)
        .partitionBy("cluster_id")
        .option("header", False)
        .csv(path)
    )


def cluster_size_report(assigned: DataFrame) -> DataFrame:
    """[cluster_id, size] sorted by cluster id (client.go:211-214)."""
    return (
        assigned.groupBy("cluster_id")
        .agg(F.count("*").alias("size"))
        .orderBy("cluster_id")
    )


def convergence_message(iterations: int, delta: float, max_iter: int, tol: float) -> str:
    """The reference's human-readable stop report (master.go:213-227)."""
    if delta < tol:
        return (
            f"Algorithm converged to a solution after {iterations} iterations "
            f"(delta {delta:.6f} < {tol})"
        )
    return f"Algorithm terminated after reaching the maximum number of iterations ({max_iter})"
