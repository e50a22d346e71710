"""Vector-distance column builders — pure Catalyst expressions, no UDFs.

Reference parity: ``GetDistance`` (reference utils/utils.go:46-54) is
``sqrt(sum((p1_i - p2_i)^2))`` over a dense float64 vector.  Here each
metric is a Column expression over ``array<double>`` columns, so it stays
inside whole-stage codegen: the JVM evaluates the fold per row with zero
Python round-trips.  ``(x-y)*(x-y)`` (not ``pow``) keeps the IEEE op
sequence identical to a left-to-right SQL sum, which lets DuckDB oracles
reproduce results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def squared_euclidean(a: Column | str, b: Column | str) -> Column:
    """sum_i (a_i - b_i)^2 — left-to-right fold over dimensions."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def euclidean(a: Column | str, b: Column | str) -> Column:
    """sqrt(sum (a_i-b_i)^2) — parity with reference utils/utils.go:46-54."""
    return F.sqrt(squared_euclidean(a, b))


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (|a| * |b|); null-safe only in that 0-norm yields null."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
