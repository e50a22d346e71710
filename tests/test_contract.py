"""Driver-contract sanity: catalog shape + entry smoke."""

from __future__ import annotations


def test_catalog_shapes():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs), "oracle without a query"
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())
    # documented rows-only set stays intentional, not accidental
    rows_only = set(qs) - set(oracles)
    assert rows_only == {"kmeans_fit_native", "kmeans_fit_mllib", "ann_lsh_topk", "mm_decode"}


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"cluster_id", "size"} <= set(df.columns)
    assert sum(r["size"] for r in rows) == 500
