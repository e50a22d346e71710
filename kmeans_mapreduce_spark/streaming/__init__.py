from kmeans_mapreduce_spark.streaming.windows import (
    incremental_ingest,
    stream_tumbling_counts,
)

__all__ = ["stream_tumbling_counts", "incremental_ingest"]
