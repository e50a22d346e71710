"""Bucketed-by-cell persistence: the co-location contract, executed.

The k-NN/dedup docstrings all promise "at 100 TB the corpus is written
bucketed-by-cell so the self-join is co-located (zero extra shuffle)".
These tests make that claim falsifiable on the real operators: the
bucketed table's self-join must plan ZERO hash exchanges where the
plain frame plans two, and the co-located build must produce the
byte-identical edge set."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def no_broadcast(spark):
    """Disable auto-broadcast so the join strategy (and its exchanges)
    is decided by distribution alone — at real scale neither side of
    the corpus self-join is broadcastable anyway."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _assigned(spark, sf_dir):
    from kmeans_mapreduce_spark.plans.kmeans_queries import _fixed_centroids
    from kmeans_mapreduce_spark.plans.pipeline_queries import _embs
    from kmeans_mapreduce_spark.plans.pipeline_queries3 import assigned_cells

    e = _embs(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return assigned_cells(e, _fixed_centroids(spark, sf_dir, k=4))


def test_bucketed_cell_self_join_is_shuffle_free(
    no_broadcast, sf_dir, tmp_path
):
    from kmeans_mapreduce_spark.plans.pipeline_queries3 import (
        rank_cell_pairs,
    )
    from kmeans_mapreduce_spark.sources.bucketed import write_bucketed_table

    spark = no_broadcast
    assigned = _assigned(spark, sf_dir)
    spark.sql("DROP TABLE IF EXISTS knn_cells_test")
    tbl = write_bucketed_table(
        assigned,
        "knn_cells_test",
        "cell",
        8,
        path=str(tmp_path / "knn_cells"),
    )
    try:
        # plan contract: the bucketed self-join satisfies both sides'
        # hash distribution from the files — zero exchanges; the same
        # join over the plain frame needs one per side
        def pair_plan(frame):
            a = frame.alias("a")
            b = frame.select(
                "cell",
                F.col("vec_id").alias("nid"),
            ).alias("b")
            j = a.join(b, "cell").where(F.col("vec_id") != F.col("nid"))
            return j._jdf.queryExecution().executedPlan().toString()

        assert pair_plan(tbl).count("Exchange hashpartitioning") == 0
        assert pair_plan(assigned).count("Exchange hashpartitioning") == 2

        # result contract: the co-located build returns the identical
        # edge set (the only allowed exchange left is the rank window's)
        got = sorted(
            map(tuple, rank_cell_pairs(tbl, k_neighbors=3).collect())
        )
        want = sorted(
            map(tuple, rank_cell_pairs(assigned, k_neighbors=3).collect())
        )
        assert got == want
        full_plan = (
            rank_cell_pairs(tbl, 3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the window's node_id repartition is the ONE remaining shuffle
        assert full_plan.count("Exchange hashpartitioning") == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS knn_cells_test")


def test_overwrite_preserves_external_data_of_prior_table(
    spark, sf_dir, tmp_path
):
    """Overwrite pre-clean must resolve the prior table's location from
    the CATALOG, not a naming convention: dropping an EXTERNAL table of
    the same name may not delete its data directory, and no warehouse
    path may be rmtree'd on its behalf."""
    from kmeans_mapreduce_spark.sources.bucketed import write_bucketed_table

    assigned = _assigned(spark, sf_dir)
    ext_dir = tmp_path / "ext_data"
    spark.sql("DROP TABLE IF EXISTS bucketed_overwrite_t")
    try:
        write_bucketed_table(
            assigned, "bucketed_overwrite_t", "cell", 4, path=str(ext_dir)
        )
        n_ext = len(list(ext_dir.glob("*.parquet")))
        assert n_ext > 0
        # same name, now managed: the pre-clean drops the EXTERNAL entry
        # but must leave its data files alone
        tbl = write_bucketed_table(assigned, "bucketed_overwrite_t", "cell", 4)
        assert tbl.count() == assigned.count()
        assert len(list(ext_dir.glob("*.parquet"))) == n_ext
        # and a managed->managed overwrite still works (the catalog-
        # resolved MANAGED location is cleaned, so no
        # LOCATION_ALREADY_EXISTS)
        tbl = write_bucketed_table(assigned, "bucketed_overwrite_t", "cell", 4)
        assert tbl.count() == assigned.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_overwrite_t")


def test_reap_stale_pid_tables_removes_only_dead_pids(spark):
    """The pid-suffix naming's cleanup half: a catalog table and a
    bare warehouse dir named for a DEAD pid are removed; the LIVE
    process's table and non-matching names survive."""
    import os
    from pathlib import Path
    from urllib.parse import urlparse

    from kmeans_mapreduce_spark.sources.bucketed import (
        reap_stale_pid_tables,
        write_bucketed_table,
    )

    dead = 2**22 + 1234  # beyond this container's pid space
    live = os.getpid()
    df = spark.range(10).selectExpr("id", "id % 2 AS b")
    write_bucketed_table(df, f"reaptest_{dead}", "b", 2)
    write_bucketed_table(df, f"reaptest_{live}", "b", 2)
    write_bucketed_table(df, "reaptest_notapid", "b", 2)
    # plus an orphaned warehouse dir with no catalog entry (a prior
    # session's leftover)
    wh = Path(urlparse(spark.conf.get("spark.sql.warehouse.dir")).path)
    orphan = wh / f"reaptest_{dead + 1}"
    orphan.mkdir(parents=True, exist_ok=True)
    (orphan / "part-x.parquet").write_text("stub")

    removed = reap_stale_pid_tables(spark, "reaptest_")
    try:
        assert f"table:reaptest_{dead}" in removed
        assert f"dir:reaptest_{dead + 1}" in removed
        assert not spark.catalog.tableExists(f"reaptest_{dead}")
        assert not orphan.exists()
        assert spark.catalog.tableExists(f"reaptest_{live}")
        assert spark.table(f"reaptest_{live}").count() == 10
        assert spark.catalog.tableExists("reaptest_notapid")
    finally:
        for t in (f"reaptest_{live}", "reaptest_notapid"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_composite_key_bucketed_join_is_shuffle_free(
    no_broadcast, tmp_path
):
    """write_bucketed_table with a COLUMN LIST buckets on the full
    tuple, and an equi-join on exactly those columns plans with zero
    exchanges when both sides read the table — the layout the composed
    pipeline's pre-banded index sibling registers at scale
    (streaming/corpus_pipeline.py)."""
    import os

    from pyspark.sql import functions as F

    from kmeans_mapreduce_spark.sources.bucketed import write_bucketed_table

    spark = no_broadcast
    tbl = f"band_idx_test_{os.getpid()}"
    df = spark.range(200).selectExpr(
        "id", "CAST(id % 8 AS INT) AS band", "CAST(id % 13 AS STRING) AS key"
    )

    def cand_plan(left, right):
        j = (
            left.alias("a")
            .join(
                right.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.id") != F.col("b.id")),
            )
            .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        )
        return j, j._jdf.queryExecution().executedPlan().toString()

    bt = write_bucketed_table(
        df, tbl, ["band", "key"], 4, path=str(tmp_path / "band_idx")
    )
    try:
        plain_j, plain_plan = cand_plan(df, df)
        buck_j, buck_plan = cand_plan(bt, bt)
        assert plain_plan.count("Exchange hashpartitioning") == 2
        assert buck_plan.count("Exchange hashpartitioning") == 0
        assert sorted(map(tuple, plain_j.collect())) == sorted(
            map(tuple, buck_j.collect())
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
