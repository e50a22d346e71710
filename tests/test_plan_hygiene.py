"""Catalog-wide physical-plan hygiene: no accidental nested-loop joins.

Builds every catalog query's executed plan at sf0.001 and asserts
BroadcastNestedLoopJoin / CartesianProduct appear ONLY on the
documented allowlist — each entry a deliberate small-side broadcast,
never a data×data blowup.  This is the regression fence for the
round-3 lesson (dedup_embedding_cosine shipped as an accidental
all-pairs BNLJ until the verdict flagged it).
"""

from __future__ import annotations

import pytest

# Every allowlisted BNLJ is a broadcast of a BOUNDED side:
#   events_funnel            1-row conversion-base scalar onto 3 rows
#   dq_validation_report     1-row corpus-total scalars onto the report
#   ann_brute_topk           Q=5 query vectors (documented brute baseline)
#   ann_brute_topk_pandas    same baseline through the pandas-UDF path
#   km_avg_pairwise          k=4 centroids × k=4 centroids (reference F3)
#   km_avg_point_dist        k-row centroid set against points (reference F2)
#   join_range_quantity_bands  3-row band dimension (theta join)
#   hybrid_search_rrf        1-row query vector onto the vector leg
#   corpus_drift_psi         |sources|×|buckets| dense grid (≤ dozens)
#   lm_bigram_logprob        1-row vocabulary-size scalar onto bigrams
#   embedding_pca_power      1-row norm/eigenvalue scalars onto d=64 rows
#   graph_triangle_count     1-row triangle-total scalar onto ≤N nodes
#   pipeline_dsir_select     1-row feature-mass totals onto the stream
#   ann_lsh_recall           Q=50 eval sample through the brute baseline
ALLOWED_NESTED_LOOP = {
    "pipeline_dsir_select",
    "ann_lsh_recall",
    "events_funnel",
    "dq_validation_report",
    "ann_brute_topk",
    "ann_brute_topk_pandas",
    "km_avg_pairwise",
    "km_avg_point_dist",
    "join_range_quantity_bands",
    "hybrid_search_rrf",
    "corpus_drift_psi",
    "lm_bigram_logprob",
    "embedding_pca_power",
    "graph_triangle_count",
}


@pytest.mark.slow
def test_no_accidental_nested_loop_joins(spark, sf_dir):
    import __spark_entry__ as e

    offenders: dict[str, list[str]] = {}
    for name, fn in e.queries().items():
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        flags = [
            p
            for p in ("BroadcastNestedLoopJoin", "CartesianProduct")
            if p in plan
        ]
        if flags and name not in ALLOWED_NESTED_LOOP:
            offenders[name] = flags
    assert not offenders, offenders


@pytest.mark.slow
def test_allowlist_is_tight(spark, sf_dir):
    """Every allowlisted name still HAS a nested-loop join — entries
    whose plans improved must leave the allowlist."""
    import __spark_entry__ as e

    qs = e.queries()
    stale = []
    for name in ALLOWED_NESTED_LOOP:
        plan = qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        if "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan:
            stale.append(name)
    assert not stale, f"allowlist entries no longer needed: {stale}"
