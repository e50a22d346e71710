"""Interchange formats: schema-enforced readers/writers beyond parquet.

The reference's only formats are headerless all-numeric CSV in
(client.go:172-186) and CSV out (client.go:236-256).  An engine at
100 TB needs the full interchange set; these helpers pin the two rules
that matter at scale:

  * reads are SCHEMA-ENFORCED and FAILFAST — schema inference costs an
    extra full pass over the data and silently degrades types
    (utils.go:29's hard error on a bad float is the right instinct);
  * writes that will be re-read go through columnar formats, and large
    fact tables are PARTITIONED BY their pruning column so readers with
    a partition predicate never open the other directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_FORMATS = ("parquet", "orc", "json", "csv")


def read_table(
    spark: SparkSession, path: str, fmt: str, schema: T.StructType
) -> DataFrame:
    """Schema-enforced FAILFAST read of any supported format."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    reader = spark.read.schema(schema).option("mode", "FAILFAST")
    if fmt == "csv":
        reader = reader.option("header", True)
    return reader.format(fmt).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` in any supported format, optionally hive-partitioned.

    CSV/JSON refuse array/struct columns loudly (flatten first) instead
    of producing stringified garbage."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    if fmt in ("csv",):
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType))
        ]
        if bad:
            raise ValueError(f"{fmt} cannot hold nested columns {bad}; flatten first")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.format(fmt).save(path)
