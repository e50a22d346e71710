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
        "ann_pq_topk",
    }
    # the driver's correctness gate only checks the first 50 dict
    # entries — the north-star pipeline + newest queries must be inside
    first50 = list(qs)[:50]
    for name in (
        "dedup_minhash",
        "dedup_components",
        "ann_ivf_topk",
        "text_bm25_rank",
        "mm_decode",
        "events_sessionize",
        "agg_approx_stats",
        "q22_dormant_customers",
        "dedup_latest_event",
        "q11_important_parts",
        "q16_supplier_part_counts",
        "events_ohlc_rollup",
        "sample_train_split",
    ):
        assert name in first50, f"{name} fell outside the correctness window"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"cluster_id", "size"} <= set(df.columns)
    assert sum(r["size"] for r in rows) == 500


def test_approx_stats_error_bounds(spark, sf_dir):
    """Sketch error bounds are now part of the query's own output (so
    the DuckDB oracle hash-checks them); assert they hold here too."""
    from kmeans_mapreduce_spark.plans.relational import agg_approx_stats

    rows = agg_approx_stats(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["hll_within_5pct"], r
        assert r["median_within_5pct"], r
