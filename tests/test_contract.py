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
    assert rows_only == {
        "kmeans_fit_native",
        "kmeans_fit_mllib",
        "kmeans_fit_lineitem",
        "dedup_simhash",
        "ann_lsh_topk",
        "mm_decode",
        "agg_approx_stats",
        "ann_brute_topk_pandas",
    }


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"cluster_id", "size"} <= set(df.columns)
    assert sum(r["size"] for r in rows) == 500


def test_approx_stats_error_bounds(spark, sf_dir):
    """Sketch aggregates must be close to exact: HLL++ rsd=0.02 -> allow
    5x sigma; GK median with accuracy 10000 -> tight on this data."""
    from kmeans_mapreduce_spark.plans.relational import agg_approx_stats

    for r in agg_approx_stats(spark, sf_dir).collect():
        assert abs(r["approx_customers"] - r["exact_customers"]) <= max(
            3, 0.10 * r["exact_customers"]
        ), r
        # percentile_approx returns a real data value; exact percentile
        # interpolates — at smoke scale (~300 rows/group) one inter-value
        # gap near the median can be ~1% of the value itself.
        assert abs(r["approx_median"] - r["exact_median"]) <= 0.05 * abs(r["exact_median"]) + 1, r
