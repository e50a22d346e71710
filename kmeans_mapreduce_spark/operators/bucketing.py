"""Bucketed (pre-shuffled) tables: co-located joins and aggregations.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides.  Bucketing moves that shuffle to WRITE time, once: both tables
are hash-partitioned into the same number of buckets on the join key
and each bucket is written sorted, so a later join (or groupBy on the
key) reads bucket i of A against bucket i of B with NO Exchange in the
plan — the reference engine's analog is `getChunks` fixed partitioning
(master.go:511-547), except Spark persists the partitioning as table
metadata and every future query benefits.

The trade-offs encoded here:
  * bucket count is fixed at write time — size it so one bucket of the
    larger table fits an executor (`n_buckets ~ table_bytes / 256MB`);
  * bucket pruning applies to equality filters on the bucket key;
  * writes must go through ``saveAsTable`` (bucket metadata lives in
    the catalog, not the parquet footer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally bucket-sorted)
    managed table.  Sorting within buckets makes downstream sort-merge
    joins skip their sort stage too."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    With matching bucket counts Catalyst plans a SortMergeJoin whose
    children are bare scans — no Exchange, no Sort (if bucket-sorted).
    Callers should verify with ``.explain()``; tests/test_bucketing.py
    pins the no-shuffle property.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
