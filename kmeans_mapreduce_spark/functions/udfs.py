"""Vectorized (Arrow) pandas UDFs — the sanctioned Python escape hatch.

The engine's hot paths are UDF-free (whole-stage codegen, see
functions/distance.py); these exist for semantics that genuinely need
Python (custom scoring, model inference) and to pin down the pattern:
@pandas_udf over Arrow batches, NEVER row-at-a-time Python UDFs
(~10-100x slower — each row a serialized round trip).

Numerical note: numpy reductions use pairwise summation, so results can
differ from the SQL left-to-right fold in the last ulp — queries built
on these are therefore rows-only in the catalog, with equality-to-expr
asserted at 1e-9 in tests rather than by value hash.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def cosine_sim_pd(a: pd.Series, b: pd.Series) -> pd.Series:
    """Cosine similarity of two array<double> columns, one Arrow batch at
    a time.  np.stack turns the list-arrays into (n, d) matrices so the
    whole batch is three BLAS calls, not n Python loops."""
    import numpy as np

    ma = np.stack(a.values)
    mb = np.stack(b.values)
    dots = np.einsum("ij,ij->i", ma, mb)
    na = np.sqrt(np.einsum("ij,ij->i", ma, ma))
    nb = np.sqrt(np.einsum("ij,ij->i", mb, mb))
    return pd.Series(dots / (na * nb))


def brute_force_topk_pandas(
    corpus, queries, k: int = 5, id_col: str = "id", vec_col: str = "v",
    round_dp: int = 6,
):
    """ann brute-force top-k with the scoring inside cosine_sim_pd —
    identical plan shape to similarity.brute_force_topk except the score
    expression crosses the Arrow boundary.  Exists to benchmark the
    UDF-vs-codegen gap honestly and as the template for real Python
    scoring (e.g. a learned reranker).

    round_dp: numpy's pairwise summation and a sequential SQL fold can
    differ in the last ulp; at 4 decimals the gap is unobservable, which
    is what lets the catalog entry share an exact SQL oracle (ranks
    tie-break on neighbor_id, deterministic in both engines)."""
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_sim_pd(F.col("qv"), F.col("cv")), round_dp).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )
