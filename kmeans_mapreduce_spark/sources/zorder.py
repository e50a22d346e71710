"""Z-order (Morton) data layout: multi-dimensional clustering for
min/max file skipping.

Beyond-reference surface (mandated).  At 100 TB, a table queried by
2-D boxes (user x time, key x price, lat x lon) cannot be sorted to
serve both dimensions: a linear sort on either column leaves the other
scattered across every file, so per-file min/max statistics prune
nothing on the second predicate.  Interleaving the bits of both
columns (the Morton / Z-order curve) makes file-range locality track
SPATIAL locality: each file's bounding box in (x, y) space is small,
and a box query's min/max check skips most files on EITHER predicate.
This module provides the key expression and the write path; the
catalog query `layout_zorder_pruning` measures the effect with an
engine-portable bucket model, and tests assert it on physically
written files via per-file bounding boxes.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column | str, y: Column | str, bits: int = 8) -> Column:
    """The Morton interleave of two ``bits``-bit non-negative ints as a
    single long: bit b of x lands at position 2b, bit b of y at 2b+1.
    Pure JVM bit arithmetic (shiftleft / bitwise and/or) — stays inside
    whole-stage codegen; no UDF.

    Callers normalize their columns into [0, 2^bits) first (modulo or
    width-bucketing); the key is only a CLUSTERING ORDER, so coarse
    quantization loses nothing but granularity."""
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    xl = xc.cast("long")
    yl = yc.cast("long")
    parts = []
    for b in range(bits):
        parts.append(F.shiftleft(F.shiftright(xl, b).bitwiseAND(F.lit(1)), 2 * b))
        parts.append(
            F.shiftleft(F.shiftright(yl, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return reduce(lambda a, c: a.bitwiseOR(c), parts)


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    n_files: int,
    bits: int = 8,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Z-order curve of (x, y): range-partition by the Morton key (files
    = contiguous curve ranges, the layout a lakehouse OPTIMIZE ZORDER
    produces) and sort within each file so row-group min/max stats are
    tight too.  The key column is dropped before writing — it is a
    layout decision, not data."""
    keyed = df.withColumn("_zkey", zorder_key(x, y, bits))
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
