"""As-of (time-travel) join — beyond-reference surface.

The reference engine has no joins at all (SURVEY §2.6); an as-of join is
the canonical "operator Spark lacks natively" the mandate asks us to
compose from existing DataFrame ops.

Construction: the union trick, not a join.  Tag both inputs, union them,
and run one `last(..., ignorenulls=True)` window per right-side payload
column ordered by (time, side).  Each left row then carries the most
recent right row at-or-before its timestamp.

Scale shape: ONE hash shuffle on the key + a per-key sort — linear in
|L|+|R|.  The naive alternative (non-equi join then max_by) materializes
every (left, right-earlier) pair: O(|L|x|R|) within key groups, which is
exactly what dies on skewed keys at 100 TB.  DuckDB's native ASOF JOIN
serves as the oracle for the catalog query over events x orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str] | None = None,
    how: str = "inner",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_time`` <= ``left_time`` within the same ``key`` (backward
    as-of, inclusive — DuckDB ``ASOF JOIN ... ON l.t >= r.t`` semantics).

    ``right`` must be unique per (key, right_time) — pre-aggregate if
    not, or the matched payload is ambiguous.  ``how``: 'inner' drops
    unmatched left rows, 'left' keeps them with null payload.

    ``tolerance`` (a SQL interval string, e.g. ``'7 days'``) is the
    feature-store max-staleness bound: a match older than
    ``left_time - tolerance`` is treated as NO match (dropped under
    'inner', nulled under 'left').  Same construction either way — the
    staleness test is a post-window predicate, so the one-shuffle
    union+window plan is unchanged.

    Returns all left columns + ``matched_time`` + the payload columns.
    """
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (key, right_time)]

    lt, rt = F.col(left_time), F.col(right_time)
    l_tagged = left.withColumn("_t", lt).withColumn("_side", F.lit(1))
    r_tagged = right.select(
        F.col(key),
        rt.alias("_t"),
        F.lit(0).alias("_side"),
        rt.alias("_rt"),
        *[F.col(c) for c in payload_cols],
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # Right rows sort before left rows at equal _t, so a left row at
    # exactly the right row's time matches it (inclusive bound).
    w = (
        Window.partitionBy(key)
        .orderBy(F.asc("_t"), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    keep = [c for c in left.columns]
    out = u.select(
        *keep,
        F.col("_side"),
        F.last("_rt", ignorenulls=True).over(w).alias("matched_time"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload_cols],
    )
    out = out.where(F.col("_side") == 1).drop("_side")
    if tolerance is not None:
        fresh = F.col("matched_time").isNotNull() & (
            F.expr(f"matched_time + INTERVAL {tolerance}") >= F.col(left_time)
        )
        if how == "inner":
            out = out.where(fresh)
        else:
            out = out.select(
                *left.columns,
                F.when(fresh, F.col("matched_time")).alias("matched_time"),
                *[F.when(fresh, F.col(c)).alias(c) for c in payload_cols],
            )
    if how == "inner":
        out = out.where(F.col("matched_time").isNotNull())
    return out
