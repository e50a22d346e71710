from kmeans_mapreduce_spark.sources.ingest import (
    points_from_columns,
    points_from_embeddings,
    read_points_csv,
)
from kmeans_mapreduce_spark.sources.sinks import (
    cluster_size_report,
    write_clusters_csv,
)

__all__ = [
    "read_points_csv",
    "points_from_columns",
    "points_from_embeddings",
    "write_clusters_csv",
    "cluster_size_report",
]
