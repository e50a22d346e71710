"""Interval overlap join: all pairs (l, r) whose [start, end] spans
intersect — the temporal-join primitive behind concurrent-session
analysis, conflict detection, and entity timeline alignment.

Spark has no native interval join; a naive theta join
(``l.start <= r.end AND r.start <= l.end``) plans as a nested-loop
over the full cross product — O(N·M) at any scale.  This operator is
the standard bucket-blocked formulation:

  1. explode each interval into the sequence of fixed-width time
     buckets it touches (intervals are typically short relative to the
     table's span, so the blow-up factor is small and bounded by
     ``ceil(len/bucket) + 1``);
  2. equi-join on (bucket [, extra keys]) — a plain shuffled hash
     join, never a nested loop;
  3. verify the exact overlap predicate on the candidates;
  4. emit each pair EXACTLY ONCE without any distinct/shuffle: a
     qualifying pair shares every bucket in the intersection of its
     spans, so keeping only the match in the FIRST shared bucket —
     ``bucket == floor(max(l.start, r.start) / width)`` — is a free
     dedup (the MinHash-LSH first-band trick applied to time).

At 100 TB the shuffle volume is O(rows × avg buckets-per-interval),
tunable via ``bucket_seconds``: pick it near the median interval
length so most intervals land in 1-2 buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    start: str,
    end: str,
    bucket_seconds: int,
    keys: list[str] | None = None,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """All (left, right) row pairs whose [start, end] second-epoch
    spans intersect (closed intervals), optionally restricted to equal
    `keys`.  Columns come back suffixed.  `start`/`end` are epoch
    seconds (long/double) — callers convert timestamps first so the
    bucket arithmetic is exact integer math."""
    keys = keys or []
    sl, sr = suffixes

    def explode_buckets(df: DataFrame, suffix: str) -> DataFrame:
        b0 = F.floor(F.col(start) / bucket_seconds).cast("long")
        b1 = F.floor(F.col(end) / bucket_seconds).cast("long")
        return df.select(
            *keys,
            *[F.col(c).alias(c + suffix) for c in df.columns if c not in keys],
            F.explode(F.sequence(b0, b1)).alias("_bucket"),
        )

    lb = explode_buckets(left, sl)
    rb = explode_buckets(right, sr)
    joined = lb.join(rb, [*keys, "_bucket"])
    first_shared = F.floor(
        F.greatest(F.col(start + sl), F.col(start + sr)) / bucket_seconds
    ).cast("long")
    return (
        joined.where(
            (F.col(start + sl) <= F.col(end + sr))
            & (F.col(start + sr) <= F.col(end + sl))
            & (F.col("_bucket") == first_shared)
        )
        .drop("_bucket")
    )
