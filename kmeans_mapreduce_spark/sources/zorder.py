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


def write_zordered_tiles(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    n_tiles: int = 64,
    bits: int = 8,
    rows_per_file: int | None = None,
) -> None:
    """Write ``df`` Z-clustered with EXPLICIT tile-aligned cuts: file
    boundaries at quadtree tile edges instead of `write_zordered`'s
    sampled equal-count ranges.

    `repartitionByRange` samples split points for equal ROW counts, so
    its file boundaries straddle curve tiles and each straddling file's
    (x, y) bounding box covers two tiles — measured round 12, that is
    exactly why the physical stat-hit count ran 8/64 against the bucket
    model's 4/64.  Here the cut points are known a priori: with
    ``n_tiles`` a power of 4, the Morton key's top bits name a square
    quadtree tile (key >> (2*bits - log2(n_tiles))), every tile is one
    CONTIGUOUS curve range, and hive-partitioning the write by that
    tile id IS explicit range partitioning at tile boundaries — the
    one write API Spark gives for caller-chosen cuts.  Each data file
    then bounds exactly one tile, so a box query's footer check hits
    exactly the tiles the box geometrically intersects (the model
    number), and a reader that derives the tile-id set from the box
    (`tiles_for_box`) prunes at the CATALOG level — directories it
    never lists, footers it never opens.

    Scale shape: one hash exchange on the tile id co-locates each
    tile's rows in ONE task, so by default each tile writes one file
    — fine at fixture scale, a straggler/size hazard for a hot tile
    at 100 TB.  ``rows_per_file`` caps file size there (Spark's
    maxRecordsPerFile splits the task's output); every split file
    still contains only its tile, so both pruning paths (footer
    stats, tile-id partition pruning) survive the split unchanged.
    Trade-off vs sampled ranges: tile files carry the data's spatial
    skew (equal AREA, not equal rows)."""
    k = n_tiles.bit_length() - 1
    if n_tiles <= 0 or 1 << k != n_tiles or k % 2 != 0:
        raise ValueError(
            f"n_tiles must be a power of 4 (square quadtree tiles), "
            f"got {n_tiles}"
        )
    if n_tiles > 4**bits:
        raise ValueError(
            f"n_tiles={n_tiles} exceeds the key's 4**bits={4 ** bits} "
            f"addressable tiles — shiftright would mask the negative "
            f"count and silently scramble tile ids"
        )
    shift = 2 * bits - k
    keyed = df.withColumn("_zkey", zorder_key(x, y, bits)).withColumn(
        "_ztile", F.shiftright("_zkey", shift)
    )
    w = (
        keyed.repartition(n_tiles, "_ztile")
        .sortWithinPartitions("_ztile", "_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
    )
    if rows_per_file is not None:
        w = w.option("maxRecordsPerFile", rows_per_file)
    w.partitionBy("_ztile").parquet(path)


def tiles_for_box(
    xlo: int,
    xhi: int,
    ylo: int,
    yhi: int,
    n_tiles: int = 64,
    bits: int = 8,
) -> list[int]:
    """The tile ids a (x, y) box intersects under the
    `write_zordered_tiles` layout — driver-side arithmetic over at most
    ``n_tiles`` candidates (64 here; a constant, never data-sized), for
    catalog-level partition pruning: ``.where(col('_ztile').isin(...))``
    makes Spark skip the other tile DIRECTORIES at planning time.
    Validates the same n_tiles contract as the write path and rejects
    boxes outside [0, 2^bits) — out-of-domain coordinates would alias
    back onto real tile ids and corrupt the consumer's hit count."""
    k = n_tiles.bit_length() - 1
    if n_tiles <= 0 or 1 << k != n_tiles or k % 2 != 0:
        raise ValueError(
            f"n_tiles must be a power of 4 (square quadtree tiles), "
            f"got {n_tiles}"
        )
    if n_tiles > 4**bits:
        raise ValueError(
            f"n_tiles={n_tiles} exceeds the key's 4**bits={4 ** bits} "
            f"addressable tiles"
        )
    lim = 1 << bits
    if not (0 <= xlo <= xhi < lim and 0 <= ylo <= yhi < lim):
        raise ValueError(
            f"box ({xlo},{xhi},{ylo},{yhi}) outside the layout domain "
            f"[0, {lim})"
        )
    side = 1 << (bits - k // 2)  # spatial tile edge length
    out = []
    for tx in range(xlo // side, xhi // side + 1):
        for ty in range(ylo // side, yhi // side + 1):
            z = 0
            for b in range(k // 2):
                z |= ((tx >> b) & 1) << (2 * b)
                z |= ((ty >> b) & 1) << (2 * b + 1)
            out.append(z)
    return sorted(out)
