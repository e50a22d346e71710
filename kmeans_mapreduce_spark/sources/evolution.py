"""Schema evolution for long-lived parquet tables.

The reference has a single fixed all-double schema (utils.go:21-33);
a table that lives for years does not.  Two primitives cover the
lifecycle:

  * `read_merged` — read a directory whose files were written under
    DIFFERENT schema versions (columns added over time) as one frame:
    parquet `mergeSchema` unions the footers, so old files surface the
    new columns as nulls.  Spark's default (schema of a random file)
    silently DROPS newer columns — the footgun this wrapper exists to
    avoid.
  * `align_to_schema` — coerce any frame onto a target schema: missing
    columns materialize as typed nulls, extra columns drop (opt-in),
    and type changes apply only when the cast is provably lossless
    (int widening, float widening, anything→string).  Lossy casts
    (long→int, double→float, string→int) raise instead of silently
    truncating — at 100 TB a silent narrowing corrupts data faster
    than any bug.

Scale note: mergeSchema reads every file footer (a metadata pass, not
a data pass).  At very large file counts, pin the evolved schema
explicitly with `.schema(...)` and skip the merge — `align_to_schema`
is exactly the tool that produces frames for that pinned schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Widening ladders: a cast within one ladder, moving right, is
# lossless.  (int->float ladders are NOT included: long->double loses
# precision above 2^53, float->double is fine but int64->float32 is
# not — keep the rule conservative and explicit.)
_INT_LADDER = ("byte", "short", "integer", "long")
_FLOAT_LADDER = ("float", "double")


def _lossless(src: T.DataType, dst: T.DataType) -> bool:
    if src == dst:
        return True
    s, d = src.typeName(), dst.typeName()
    if d == "string":
        return True  # formatting, never truncation
    if s in _INT_LADDER and d in _INT_LADDER:
        return _INT_LADDER.index(s) <= _INT_LADDER.index(d)
    if s in _FLOAT_LADDER and d in _FLOAT_LADDER:
        return _FLOAT_LADDER.index(s) <= _FLOAT_LADDER.index(d)
    if s in ("byte", "short", "integer") and d == "double":
        return True  # <= 32-bit ints fit double's 53-bit mantissa
    if s in ("byte", "short") and d == "float":
        return True
    if s == "date" and d == "timestamp":
        return True
    return False


def read_merged(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory written under multiple schema versions
    as the UNION of all file schemas (added columns null-fill in older
    files)."""
    return spark.read.option("mergeSchema", True).parquet(path)


def align_to_schema(
    df: DataFrame,
    schema: T.StructType,
    drop_extra: bool = False,
) -> DataFrame:
    """Project `df` onto `schema`: add missing columns as typed nulls,
    reorder, and apply lossless casts.  Raises on a lossy type change,
    or on extra columns unless `drop_extra` (explicit opt-in — silently
    discarding data is the other footgun)."""
    have = {f.name: f for f in df.schema.fields}
    want = {f.name: f for f in schema.fields}
    extra = [n for n in have if n not in want]
    if extra and not drop_extra:
        raise ValueError(
            f"columns {extra} not in target schema; pass drop_extra=True "
            "to discard them explicitly"
        )
    lossy = [
        (n, have[n].dataType.simpleString(), f.dataType.simpleString())
        for n, f in want.items()
        if n in have and not _lossless(have[n].dataType, f.dataType)
    ]
    if lossy:
        raise ValueError(f"lossy casts refused: {lossy}")
    cols = [
        (
            F.col(f.name).cast(f.dataType)
            if f.name in have
            else F.lit(None).cast(f.dataType)
        ).alias(f.name)
        for f in schema.fields
    ]
    return df.select(*cols)
