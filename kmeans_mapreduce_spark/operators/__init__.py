from kmeans_mapreduce_spark.operators.kmeans import (
    KMeansResult,
    assign_clusters,
    farthest_point_init,
    fit_kmeans_native,
    fit_kmeans_mllib,
    recenter,
)

__all__ = [
    "KMeansResult",
    "assign_clusters",
    "recenter",
    "farthest_point_init",
    "fit_kmeans_native",
    "fit_kmeans_mllib",
]
