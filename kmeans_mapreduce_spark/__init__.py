"""kmeans_mapreduce_spark — a PySpark-native analytics engine with the
capabilities of livias1726/KMeans_MapReduce, rebuilt Spark-first.

The reference (/root/reference, Go, 1.6k LoC) is a hand-rolled MapReduce
K-Means engine: RPC master/worker, chunked ingest, map/combine/reduce
phases, farthest-point init.  This package re-expresses every capability
as declarative DataFrame plans so Catalyst/Tungsten pick the physical
strategy, and layers on the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) that a
100 TB deployment of such an engine needs.

Layout:
    session       SparkSession builder tuned for the local[32] harness
    sources/      ingest (csv/parquet -> [id, features]) and sinks
    functions/    scalar column builders: distances, text metrics
    operators/    kmeans (native + MLlib), dedup, similarity, multimodal
    plans/        relational query catalog (joins/aggs/windows/set-ops)
    streaming/    Structured Streaming windowed aggregations
"""

from kmeans_mapreduce_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
