"""Permissive CSV quarantine ingest + versioned table snapshots."""

from __future__ import annotations

import pytest

from kmeans_mapreduce_spark.sources.ingest import read_points_csv_permissive
from kmeans_mapreduce_spark.sources.versioning import (
    latest_version,
    read_version,
    vacuum,
    write_version,
)


def test_permissive_csv_quarantines_bad_rows(spark, tmp_path):
    p = tmp_path / "pts.csv"
    p.write_text(
        "1.0,2.0\n"
        "3.0,oops\n"       # malformed numeric -> corrupt/null
        "5.0,6.0\n"
        "7.0\n"            # missing field -> null -> quarantined
        "bad,row\n"
    )
    good, bad = read_points_csv_permissive(spark, str(p), dim=2)
    feats = sorted(tuple(r["features"]) for r in good.collect())
    assert feats == [(1.0, 2.0), (5.0, 6.0)]
    assert bad.count() == 3
    # quarantine keeps raw text where the parser flagged corruption
    raws = {r["raw_record"] for r in bad.collect() if r["raw_record"]}
    assert any("oops" in r for r in raws)


def test_permissive_matches_strict_on_clean_input(spark, tmp_path):
    from kmeans_mapreduce_spark.sources.ingest import read_points_csv

    p = tmp_path / "clean.csv"
    p.write_text("1.0,2.0\n3.0,4.0\n")
    good, bad = read_points_csv_permissive(spark, str(p), dim=2)
    strict = read_points_csv(spark, str(p), dim=2)
    assert bad.count() == 0
    assert sorted(tuple(r["features"]) for r in good.collect()) == sorted(
        tuple(r["features"]) for r in strict.collect()
    )


def test_versioned_writes_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "vt")
    df1 = spark.createDataFrame([(1, "a")], "id long, s string")
    df2 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    assert latest_version(spark, t) == 0
    assert write_version(spark, df1, t) == 1
    assert write_version(spark, df2, t) == 2
    assert latest_version(spark, t) == 2
    assert read_version(spark, t).count() == 2          # latest
    assert read_version(spark, t, 1).count() == 1       # time travel
    with pytest.raises(FileNotFoundError):
        read_version(spark, t, 9)


def test_vacuum_keeps_recent_versions(spark, tmp_path):
    t = str(tmp_path / "vt2")
    for i in range(4):
        write_version(
            spark,
            spark.createDataFrame([(i,)], "id long"),
            t,
        )
    removed = vacuum(spark, t, keep_last=2)
    assert removed == [1, 2]
    assert read_version(spark, t, 3).count() == 1
    assert read_version(spark, t).count() == 1
    with pytest.raises(FileNotFoundError):
        read_version(spark, t, 1)


def test_permissive_read_dim1(spark, tmp_path):
    """dim=1 must work: the null-field predicate is a reduce over `|`,
    not F.greatest (which asserts >= 2 columns)."""
    p = tmp_path / "pts1.csv"
    p.write_text("1.5\n\nnot_a_number\n2.5\n")
    good, bad = read_points_csv_permissive(spark, str(p), dim=1)
    vals = sorted(r["features"][0] for r in good.collect())
    assert vals == [1.5, 2.5]
    assert bad.count() >= 1  # the unparseable row is quarantined
