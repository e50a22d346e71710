from kmeans_mapreduce_spark.functions.distance import (
    cosine_similarity,
    dot,
    euclidean,
    l2_norm,
    squared_euclidean,
)

__all__ = [
    "euclidean",
    "squared_euclidean",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
