"""Skew mitigation: salted two-phase aggregation + salted replicated join.

At 100 TB a groupBy on a power-law key (user_id, domain, token) puts one
key's entire volume through one reducer.  AQE's skew-join splitting
covers joins; for AGGREGATIONS the classic fix is salting: phase 1
aggregates on (key, salt), spreading each hot key over `salt_buckets`
reducers, phase 2 merges the per-salt partials — shuffle 2 carries only
|keys| x salt_buckets tiny rows.

Spark's map-side partial aggregation already bounds reducer input to
(distinct keys per upstream partition), so salting pays when final-phase
state per hot reducer is the bottleneck — extreme key skew with heavy
agg state, or aggregates that disable partial aggregation (collect_list/
collect_set).  The operator's output is bit-equal to the plain groupBy,
which is exactly what the catalog oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# phase-2 merge function for each algebraic phase-1 aggregate
MERGE = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str | None]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation over algebraic functions.

    aggs: output_name -> (fn, src_col); fn in {count, sum, min, max};
    src_col None for count(*).  avg is not directly algebraic — request
    sum + count and divide.

    The salt is rand-derived (seeded) — any uniform per-row int works;
    correctness never depends on it, only load balance does.
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int")
    p1 = df.withColumn("_salt", salt).groupBy(key, "_salt").agg(
        *[
            (F.count("*") if src is None else getattr(F, fn)(F.col(src))).alias(f"_p_{out}")
            for out, (fn, src) in aggs.items()
        ]
    )
    return p1.groupBy(key).agg(
        *[
            getattr(F, MERGE[fn])(F.col(f"_p_{out}")).alias(out)
            for out, (fn, src) in aggs.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-defusing equi-join: salt the (skewed) fact side, replicate
    the dim side once per salt bucket, join on (key, salt).

    Each hot key's rows spread over `salt_buckets` reducers instead of
    one; the price is a `salt_buckets`x blow-up of the OTHER side's
    shuffle, so use this when `dim` is small-ish but above the
    broadcast threshold (below it, broadcast makes skew moot; at the
    other extreme AQE's skew-join splitting handles two big sides).
    Result is row-identical to the plain join — the invariant the
    tests pin.

    Supported `how`: inner / left (semantics preserved because every
    fact row carries exactly one salt and every dim row exists in
    every bucket).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = (F.rand(seed=42) * salt_buckets).cast("int")
    f = fact.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return f.join(d, [key, "_salt"], how).drop("_salt")
