"""Catalog-wide physical-plan hygiene: no accidental nested-loop joins,
no accidental unpartitioned windows.

Builds every catalog query's executed plan ONCE at sf0.001 (module
fixture) and asserts
  (a) BroadcastNestedLoopJoin / CartesianProduct appear ONLY on the
      documented allowlist — each entry a deliberate small-side
      broadcast, never a data×data blowup (regression fence for the
      round-3 lesson: dedup_embedding_cosine shipped as an accidental
      all-pairs BNLJ until the verdict flagged it); and
  (b) UNPARTITIONED window specs appear ONLY on the documented
      allowlist — each a bounded frame (|shards|-, |sources|-,
      |stages|- or top-k-row inputs), never the corpus.  The harness
      suppresses Spark's no-partition WARN for these audited sites
      (session.quiet_audited_window_warnings); this test is what keeps
      that suppression honest — a future corpus-sized unpartitioned
      window fails here instead of scrolling by silenced.
"""

from __future__ import annotations

import re

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
# (knn_graph_cells' centroid relation only appears on the >8-cell
#  production path; the fixture's 4 cells inline as plan literals, so
#  the catalog entry carries no BNLJ)
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

# Every allowlisted unpartitioned window runs over a BOUNDED frame —
# per-group/per-bucket aggregates (dozens of rows), never the corpus.
# Audited 2026-08-15 via tools/scan_windows.py; if a query leaves this
# list (plan improved) or joins it (new unpartitioned window), both
# directions fail below and force a re-audit.
ALLOWED_UNPARTITIONED_WINDOW = {
    "pipeline_shard_balance",        # global rank over 8 shards
    "hybrid_search_rrf",             # ranks over k=10 fused candidates
    "window_rows_moving_avg",        # global avg over |dates| buckets
    "pipeline_mixture_schedule",     # cum share over |sources| rows
    "stats_chi2_independence",       # totals over |segment×band| grid
    "orders_pareto_frontier",        # frontier scan over ≤100 topk rows
    "events_rolling_corr",           # corr over |hour buckets| series
    "hist_equidepth_prices",         # quantile cuts over |buckets| rows
    "docs_vocab_coverage",           # cum coverage over topk vocab
    "orders_mom_growth",             # lag over |months| buckets
    "events_user_lifecycle",         # stage rank over |stages| rows
    "customers_rfm_segments",        # terciles over per-customer aggs
    "events_ks_two_sample",          # cum CDFs over |value grid| rows
    "orders_benford_digits",         # share over 9 digit rows
    "events_top_paths",              # rank over ≤ |paths| aggregates
    "parts_brand_share_topn",        # share over |brands| aggregates
    "customers_abc_classes",         # cum share over per-class aggs
    "pipeline_curriculum_stages",    # cum tokens over |stages| rows
    "pipeline_token_budget_epochs",  # cum budget over |sources| rows
    "pipeline_sample_temperature",   # share over |sources| rows
    "pipeline_context_length_plan",  # cum packing over |buckets| rows
    "quality_stump_fit",             # rank over |features|x|values| candidates
}


def unpartitioned_window_specs(plan: str) -> int:
    """Count windowspecdefinition(...) occurrences with an EMPTY
    partition clause.  Spec args print as ``windowspecdefinition(
    part..., order ASC/DESC ..., specifiedwindowframe(...))`` —
    partition expressions never carry a sort direction, so a spec is
    unpartitioned iff its first depth-0 argument is an ordering
    expression (ends with a sort direction) or the frame itself."""
    n_unpart = 0
    for m in re.finditer(r"windowspecdefinition\(", plan):
        i, depth, args, cur = m.end(), 1, [], ""
        while i < len(plan) and depth:
            c = plan[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            if c == "," and depth == 1:
                args.append(cur.strip())
                cur = ""
            else:
                cur += c
            i += 1
        args.append(cur.strip())
        first = args[0] if args else ""
        if first.startswith("specifiedwindowframe") or re.search(
            r"\b(ASC NULLS (FIRST|LAST)|DESC NULLS (FIRST|LAST))$", first
        ):
            n_unpart += 1
    return n_unpart


@pytest.fixture(scope="module")
def catalog_plans(spark, sf_dir) -> dict[str, str]:
    """name -> executed-plan string for every catalog query, built once
    and shared by all hygiene assertions in this module."""
    import __spark_entry__ as e

    return {
        name: fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        for name, fn in e.queries().items()
    }


@pytest.mark.slow
def test_no_accidental_nested_loop_joins(catalog_plans):
    offenders: dict[str, list[str]] = {}
    for name, plan in catalog_plans.items():
        flags = [
            p
            for p in ("BroadcastNestedLoopJoin", "CartesianProduct")
            if p in plan
        ]
        if flags and name not in ALLOWED_NESTED_LOOP:
            offenders[name] = flags
    assert not offenders, offenders


@pytest.mark.slow
def test_nested_loop_allowlist_is_tight(catalog_plans):
    """Every allowlisted name still HAS a nested-loop join — entries
    whose plans improved must leave the allowlist."""
    stale = [
        name
        for name in ALLOWED_NESTED_LOOP
        if "BroadcastNestedLoopJoin" not in catalog_plans[name]
        and "CartesianProduct" not in catalog_plans[name]
    ]
    assert not stale, f"allowlist entries no longer needed: {stale}"


@pytest.mark.slow
def test_no_accidental_unpartitioned_windows(catalog_plans):
    offenders = {
        name: n
        for name, plan in catalog_plans.items()
        if (n := unpartitioned_window_specs(plan))
        and name not in ALLOWED_UNPARTITIONED_WINDOW
    }
    assert not offenders, (
        "unpartitioned window outside the audited bounded-frame list "
        f"(WARNs are suppressed for these — audit before allowlisting): "
        f"{offenders}"
    )


@pytest.mark.slow
def test_unpartitioned_window_allowlist_is_tight(catalog_plans):
    stale = [
        name
        for name in ALLOWED_UNPARTITIONED_WINDOW
        if not unpartitioned_window_specs(catalog_plans[name])
    ]
    assert not stale, f"allowlist entries no longer needed: {stale}"
