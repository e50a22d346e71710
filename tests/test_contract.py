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
        "ann_pq_topk",
    }
    # the driver's correctness gate only checks the first 50 dict
    # entries — round 4: never-recorded rotations + changed + new
    # queries must be inside
    first50 = list(qs)[:50]
    for name in (
        # (a) rotated in — never driver-recorded before round 4
        "events_funnel",
        "events_retention_cohorts",
        "pipeline_corpus_curation",
        "sketch_rollup_weekly_users",
        "dq_validation_report",
        "ann_pq_topk",
        "set_multiset_priorities",
        "case_coalesce_buckets",
        "array_top_tokens",
        "scd2_user_value_history",
        # (b) changed in round 4
        "agg_collect_sets",
        "dedup_embedding_cosine",
        "ann_lsh_topk",
        "mm_decode",
        "ann_brute_topk_pandas",
        "events_ohlc_rollup",
        # (c) new in round 4
        "pipeline_contamination_check",
        "pipeline_seq_packing",
        "pipeline_domain_mix",
        "text_repetition_score",
        "window_percentile_customers",
        "events_gapfill_locf",
        "dedup_semantic_clusters",
        "knn_graph_cells",
        "pipeline_lang_rebalance",
        "text_pii_scrub",
        "embedding_dim_stats",
        "text_quality_zscore",
        # (c) new in round 4, third batch
        "pipeline_shuffle_shards",
        "pipeline_stratified_sample",
        "pipeline_dataset_card",
        "pipeline_bpe_pair_counts",
        "dedup_cluster_representatives",
        "text_char_entropy",
        "events_concurrency_sweep",
        "graph_pagerank_vectors",
        "graph_bfs_reach",
        "dedup_substring_pairs",
        "events_anomaly_mad",
        "table_column_stats",
        "hybrid_search_rrf",
        "corpus_drift_psi",
        # (c) new in round 4, fourth batch — last TPC-H shapes
        "q2_min_cost_supplier",
        "q9_nation_profit",
        "q12_priority_shipping",
        "q20_dominant_suppliers",
        # (c) new in round 4, fifth batch — chunking/linkage/diff
        "pipeline_doc_chunks",
        "linkage_fuzzy_parts",
        "snapshot_diff_orders",
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
