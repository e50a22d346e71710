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
        # iterative data-dependent argmax per round; merge sequence
        # pinned against a pure-Python reference in tests/test_bpe.py
        "pipeline_bpe_train",
    }
    # the driver's correctness gate only checks the first 50 dict
    # entries — round 16: the changed similarity module's probe
    # (ADVICE fixes) and the whole fit/PQ rows-only family at its
    # two-round policy bound (each with its invariants sibling, per
    # the standing ledger rule — and the numpy-block engine's first
    # driver-recorded oracle verification) must all be inside
    first50 = list(qs)[:50]
    from kmeans_mapreduce_spark.plans.catalog import _R16_WINDOW

    assert first50 == _R16_WINDOW, "driver window drifted from the ledger"
    for name in (
        # (c) changed this round (the similarity module's guards)
        "ann_ivf_topk",
        # (d) rows-only freshness at the two-round policy bound, with
        # the invariants siblings in the same window (standing rule)
        "kmeans_fit_native",
        "kmeans_fit_invariants",
        "kmeans_fit_mllib",
        "mllib_fit_invariants",
        "kmeans_fit_lineitem",
        "ann_pq_topk",
        "pq_train_invariants",
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


def test_scale_baseline_covers_catalog():
    """tools/SCALE_BASELINE.json (the scale-run regression gate's
    reference) must cover every catalog query — adding a query without
    re-running `python tools/scale_run.py --update-baseline` leaves it
    outside the re-execution gate."""
    import json
    from pathlib import Path

    import __spark_entry__ as e

    base = json.loads(
        (Path(__file__).resolve().parent.parent / "tools" / "SCALE_BASELINE.json")
        .read_text()
    )
    missing = sorted(set(e.queries()) - set(base))
    assert not missing, f"queries missing from scale baseline: {missing}"


def test_trained_calibration_family_is_frozen_at_five():
    """The trained-calibration family (each member retrains IVF-PQ
    products + brute ground truth per vanilla oracle session) is
    FROZEN at five axes per the round-11 verdict.  A sixth trained
    sweep/recall query must not join until the shared-prefix plan
    documented at pipeline_queries16.TRAINED_CALIBRATION_FAMILY
    exists — update the family constant AND that plan together."""
    import __spark_entry__ as e
    from kmeans_mapreduce_spark.plans.pipeline_queries16 import (
        TRAINED_CALIBRATION_FAMILY,
    )

    qs = set(e.queries())
    assert TRAINED_CALIBRATION_FAMILY <= qs
    assert len(TRAINED_CALIBRATION_FAMILY) == 5
    pattern_members = {
        q
        for q in qs
        if (q.startswith("ann_ivf_pq_") and ("recall" in q or "sweep" in q))
        or q.startswith("ann_rerank_")
    }
    assert pattern_members == TRAINED_CALIBRATION_FAMILY, (
        "trained-calibration family changed without updating the "
        f"frozen constant: {pattern_members ^ TRAINED_CALIBRATION_FAMILY}"
    )
