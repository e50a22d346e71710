"""Snapshot diff: typed added/removed/changed/unchanged compare of two
table versions on a key.

The CDC-adjacent complement to ``sources/maintenance.upsert_parquet``:
upsert APPLIES a change batch; ``snapshot_diff`` RECOVERS the change
batch from two materialized snapshots (audit, backfill validation,
replication drift checks).  The reference engine has no table concept
at all (its state is one CSV per run, utils.go:16-44); this surface is
part of the mandated beyond-reference scope (SURVEY §2.5+).

Scale posture: ONE full-outer shuffle join on the key — at 100 TB both
sides hash-partition on the key once and stream; no driver state, no
collect.  If both snapshots are written bucketed by the key
(operators/bucketing.write_bucketed) the Exchange disappears entirely.
Column comparison is null-safe struct equality (`<=>`), evaluated
whole-stage-codegen — no hashing, no Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUS_COL = "diff_status"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Full-outer compare of ``old`` vs ``new`` on ``keys``.

    Returns one row per key present in either side with ``diff_status``
    in {'added', 'removed', 'changed', 'unchanged'}, the key columns,
    and every compared column twice (``old_<c>`` / ``new_<c>``).

    ``compare_cols`` defaults to all shared non-key columns.  Null-safe:
    a column flipping NULL<->value counts as changed; NULL==NULL does
    not (struct ``<=>`` semantics).
    """
    keys = list(keys)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]
    compare_cols = list(compare_cols)

    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = None
    for k in keys:
        eq = F.col(f"_ok_{k}") == F.col(f"_nk_{k}")
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")

    same = F.struct(*[F.col(f"old_{c}") for c in compare_cols]).eqNullSafe(
        F.struct(*[F.col(f"new_{c}") for c in compare_cols])
    )
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    key_out = [
        F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k) for k in keys
    ]
    return j.select(
        status.alias(STATUS_COL),
        *key_out,
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Per-status row counts — the drift report a replication monitor
    alerts on.  Same single-shuffle plan; the count partial-aggregates
    map-side so the second exchange moves 4 rows."""
    return (
        snapshot_diff(old, new, keys, compare_cols)
        .groupBy(STATUS_COL)
        .agg(F.count("*").alias("n"))
        .orderBy(STATUS_COL)
    )
