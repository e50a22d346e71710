"""Reference-parity extras: dataset listing (S1), named session
registry (O1), barrier fan-out (O3)."""

from __future__ import annotations

import pytest


def test_list_datasets_menu(spark):
    """Non-interactive analog of the reference's numbered dataset menu
    (client.go:151-170): deterministic 1-based choices, name resolution,
    KeyError on a bad pick (the reference silently returns '')."""
    from kmeans_mapreduce_spark.sources.ingest import list_datasets, pick_dataset

    listing = list_datasets(spark, "/root/testdata/sf0.001", suffix=".parquet")
    rows = listing.orderBy("choice").collect()
    names = [r["name"] for r in rows]
    assert "lineitem.parquet" in names
    assert "documents.parquet" in names
    assert [r["choice"] for r in rows] == list(range(1, len(rows) + 1))
    assert names == sorted(names)  # listing order pinned, not FS-dependent
    assert all(r["size_bytes"] > 0 for r in rows)

    first = pick_dataset(listing, 1)
    assert first == names[0]
    with pytest.raises(KeyError):
        pick_dataset(listing, 999)


def test_named_session_registry_isolation(spark):
    """O1 parity: named child sessions share the SparkContext but not
    temp-view state; the registry returns the same session for the same
    name and drops it on close."""
    from kmeans_mapreduce_spark.session import (
        close_named_session,
        get_named_session,
    )

    a = get_named_session("client-a", base=spark)
    b = get_named_session("client-b", base=spark)
    assert a is get_named_session("client-a", base=spark)
    assert a is not b
    assert a.sparkContext is b.sparkContext

    a.range(3).createOrReplaceTempView("reg_test_view")
    assert a.catalog.tableExists("reg_test_view")
    assert not b.catalog.tableExists("reg_test_view")

    assert close_named_session("client-a")
    assert not close_named_session("client-a")
    fresh = get_named_session("client-a", base=spark)
    assert not fresh.catalog.tableExists("reg_test_view")
    close_named_session("client-a")
    close_named_session("client-b")


def test_barrier_fanout_agrees_on_global_count(spark, points):
    """O3 parity: every barrier task reports the same allGather-derived
    global count, and partials partition the data."""
    from kmeans_mapreduce_spark.operators.barrier import barrier_partial_stats

    total = points.count()
    rows = barrier_partial_stats(points, dim=64, num_tasks=4)
    assert 1 <= len(rows) <= 4
    globals_seen = {r["global_count"] for r in rows}
    assert globals_seen == {total}
    assert sum(r["partial_count"] for r in rows) == total
    assert {r["task_id"] for r in rows} == set(range(len(rows)))
