"""df.observe() instrumentation: metrics ride the action, no second
scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kmeans_mapreduce_spark.sources.observability import (
    observe_metrics,
    write_with_metrics,
)


def test_write_with_metrics_single_job(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "id long, val double"
    )
    out = str(tmp_path / "out")
    m = write_with_metrics(
        df,
        out,
        {
            "rows": F.count(F.lit(1)),
            "null_vals": F.count_if(F.col("val").isNull()),
            "total": F.sum("val"),
        },
    )
    assert m == {"rows": 3, "null_vals": 1, "total": 40.0}
    got = sorted(r["id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]


def test_observe_metrics_with_any_action(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    observed, obs = observe_metrics(
        docs,
        {"rows": F.count(F.lit(1)), "chars": F.sum("n_chars")},
    )
    n = observed.count()  # any action over the observed frame works
    vals = dict(obs.get)
    assert vals["rows"] == n
    direct = docs.agg(F.sum("n_chars")).collect()[0][0]
    assert vals["chars"] == direct
