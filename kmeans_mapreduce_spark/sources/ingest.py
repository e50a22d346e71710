"""Ingest: anything -> DataFrame[id: long, features: array<double>].

Reference parity:
  * CSV scan (reference main/client/client.go:172-186): headerless,
    all-numeric CSV read whole, then float64-parsed.
  * Typed projection (reference utils/utils.go:21-42): [][]string ->
    Points, aborting on any non-numeric field, positional int ids.

Spark-first differences (deliberate):
  * The scan is a distributed ``spark.read.csv`` with an explicit schema
    — Catalyst prunes columns and the parse happens in the JVM scan, not
    a driver loop.  ANSI casts reproduce the reference's fail-fast
    behavior on malformed numerics (utils.go:29) without a Python pass.
  * Ids come from ``monotonically_increasing_id()``: non-contiguous but
    unique per job — strictly better than the reference, whose ids reset
    per 100k-point client message and collide (client.go:56-89).
  * Fixed dimensionality IS enforced (the reference silently truncates
    ragged rows — utils.go:46-54 iterates len(p1)); we fail fast.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _enforce_dim(df: DataFrame, dim: int | None) -> DataFrame:
    if dim is None:
        return df
    # Cheap distributed assertion: raise on first ragged row at scan time
    # rather than producing silently-wrong distances downstream.
    bad = F.size("features") != F.lit(dim)
    return df.withColumn(
        "features",
        F.when(bad, F.raise_error(F.concat(F.lit(f"expected dim {dim}, got "), F.size("features").cast("string"))))
        .otherwise(F.col("features")),
    )


def read_points_csv(
    spark: SparkSession, path: str, dim: int, strict: bool = True
) -> DataFrame:
    """Headerless all-numeric CSV -> [id, features] (reference S2+S3).

    strict=True mirrors utils.go:29: any unparseable field aborts the job
    (FAILFAST + non-nullable doubles).  dim is required — the CSV carries
    no header, so the caller declares the point dimensionality.
    """
    schema = T.StructType(
        [T.StructField(f"c{i}", T.DoubleType(), not strict) for i in range(dim)]
    )
    reader = spark.read.schema(schema)
    if strict:
        reader = reader.option("mode", "FAILFAST")
    raw = reader.csv(path, header=False)
    return raw.select(
        F.monotonically_increasing_id().alias("id"),
        F.array(*[F.col(f"c{i}") for i in range(dim)]).alias("features"),
    )


def read_points_csv_permissive(
    spark: SparkSession, path: str, dim: int
) -> tuple[DataFrame, DataFrame]:
    """Quarantining CSV ingest: (good_points, bad_rows).

    FAILFAST (read_points_csv strict) is right for curated inputs; for
    the wild-data case a 100 TB job must not die on row
    48,000,000,001.  PERMISSIVE mode with a `columnNameOfCorruptRecord`
    column keeps the scan distributed and JVM-side: malformed rows land
    with their RAW text in the corrupt column (nulls elsewhere), so the
    caller gets clean points PLUS an auditable quarantine frame — count
    it, sample it, alert on its rate — instead of a dead job or silent
    row loss.  Rows parsed but with any null field are quarantined too
    (a half-parsed point is still a bad point)."""
    schema = T.StructType(
        [T.StructField(f"c{i}", T.DoubleType(), True) for i in range(dim)]
        + [T.StructField("_corrupt", T.StringType(), True)]
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path, header=False)
        # PERMISSIVE requires the corrupt column to be materialized via
        # a cache/shuffle boundary before filtering on it (SPARK-38523
        # family); a plain filter straight off the scan can be pruned.
        .cache()
    )
    # reduce over | rather than F.greatest: greatest() asserts >= 2
    # columns, which would crash the (valid) dim=1 case
    null_field = functools.reduce(
        lambda a, b: a | b, [F.col(f"c{i}").isNull() for i in range(dim)]
    )
    is_bad = F.col("_corrupt").isNotNull() | null_field
    bad = raw.where(is_bad)
    # complementary filter, not exceptAll — a set-difference would add
    # a full shuffle to compute what a predicate already knows
    good = raw.where(~is_bad).select(
        F.monotonically_increasing_id().alias("id"),
        F.array(*[F.col(f"c{i}") for i in range(dim)]).alias("features"),
    )
    return good, bad.select(F.col("_corrupt").alias("raw_record"), *[f"c{i}" for i in range(dim)])


def points_from_columns(df: DataFrame, cols: list[str], id_col: str | None = None) -> DataFrame:
    """Project numeric columns of any table into [id, features].

    The typed-projection analog (utils.go:21-42) for data already in a
    relational shape, e.g. lineitem's (l_quantity, l_extendedprice, ...).
    """
    from kmeans_mapreduce_spark.session import ensure_parallelism

    id_expr = (
        F.col(id_col).cast("long").alias("id")
        if id_col
        else F.monotonically_increasing_id().alias("id")
    )
    # monotonically_increasing_id must run BEFORE any repartition (its
    # value depends on partition layout); with an explicit id column the
    # repartition can go first so downstream iteration scans parallelize
    # even when the source is a few large row groups.
    if id_col:
        df = ensure_parallelism(df)
        return df.select(id_expr, F.array(*[F.col(c).cast("double") for c in cols]).alias("features"))
    out = df.select(id_expr, F.array(*[F.col(c).cast("double") for c in cols]).alias("features"))
    return ensure_parallelism(out)


def points_from_embeddings(
    spark: SparkSession, sf_dir: str, dim: int | None = 64, parallelize: bool = True
) -> DataFrame:
    """The harness embeddings table -> [id, features(array<double>), label].

    ``parallelize=False`` skips the small-file repartition: callers that
    feed the numpy block engine (which sizes its own partitions from
    the data volume) would only pay a pointless 32-way shuffle of a
    single-split file to have the blocks coalesce it straight back.
    """
    from kmeans_mapreduce_spark.session import ensure_parallelism

    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    if parallelize:
        df = ensure_parallelism(df)
    df = df.select(
        F.col("vec_id").cast("long").alias("id"),
        F.col("embedding").cast("array<double>").alias("features"),
        F.col("label"),
    )
    return _enforce_dim(df, dim)


def list_datasets(spark: SparkSession, dirpath: str, suffix: str = "") -> DataFrame:
    """Dataset catalog listing (reference S1, client.go:151-170) —
    non-interactive: instead of printing a numbered menu and blocking on
    stdin, return the same (choice, name) inventory as a DataFrame with
    file sizes, so callers (or a UI) select programmatically via
    ``pick_dataset``.

    Uses the Hadoop FileSystem API (the maintenance._tree_bytes
    convention), so the listing works identically on file://, hdfs://
    and s3a:// — a local os.listdir would not.
    """
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(dirpath)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    entries = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if suffix and not name.endswith(suffix):
            continue
        entries.append((name, int(st.getLen()), bool(st.isDirectory())))
    entries.sort()  # deterministic menu order (HDFS listing order is not)
    return spark.createDataFrame(
        [(i + 1, n, sz, d) for i, (n, sz, d) in enumerate(entries)],
        T.StructType(
            [
                T.StructField("choice", T.IntegerType(), False),
                T.StructField("name", T.StringType(), False),
                T.StructField("size_bytes", T.LongType(), False),
                T.StructField("is_dir", T.BooleanType(), False),
            ]
        ),
    )


def pick_dataset(listing: DataFrame, choice: int) -> str:
    """Resolve a menu choice to a dataset name (client.go:165-169 without
    the Scanf): raises KeyError on an out-of-range pick instead of
    silently returning the empty string like the reference's map lookup."""
    rows = listing.where(F.col("choice") == choice).collect()
    if not rows:
        raise KeyError(f"no dataset with choice number {choice}")
    return rows[0]["name"]
