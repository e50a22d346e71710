"""Z-order layout: key correctness by hand, and the pruning claim on
PHYSICALLY WRITTEN parquet files (not just the catalog query's bucket
model) — per-file (x, y) bounding boxes recovered via input_file_name
must shrink under the Z-order write, and a box query must touch fewer
files."""

from __future__ import annotations

from pyspark.sql import functions as F

from kmeans_mapreduce_spark.sources.zorder import write_zordered, zorder_key


def test_zorder_key_matches_hand_computed_morton(spark):
    """Hand-interleaved values: morton(x, y) puts bit b of x at 2b and
    bit b of y at 2b+1."""
    rows = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)], "x long, y long"
    ).select("x", "y", zorder_key("x", "y", 8).alias("z")).collect()
    got = {(r["x"], r["y"]): r["z"] for r in rows}
    #  x=3 (011), y=5 (101) -> z bits: y2 x2 y1 x1 y0 x0 = 1 0 0 1 1 1 = 39
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(3, 5)] == 39
    assert got[(255, 255)] == 65535


def test_zorder_key_is_curve_monotone_within_tiles(spark):
    """All 1024 curve positions of one 32x32 tile (top-6 morton bits
    fixed) stay inside that tile's coordinate box — the property the
    bucket model and the file layout both rely on."""
    pts = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y")
    )
    tiles = (
        pts.select(
            "x", "y", F.shiftright(zorder_key("x", "y", 8), 10).alias("tile")
        )
        .groupBy("tile")
        .agg(
            (F.max("x") - F.min("x")).alias("wx"),
            (F.max("y") - F.min("y")).alias("wy"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert len(tiles) == 64
    for t in tiles:
        assert t["n"] == 1024
        assert t["wx"] == 31 and t["wy"] == 31


def _file_boxes(spark, path):
    df = spark.read.parquet(path).select(
        F.input_file_name().alias("f"), "x", "y"
    )
    return (
        df.groupBy("f")
        .agg(
            F.min("x").alias("x0"),
            F.max("x").alias("x1"),
            F.min("y").alias("y0"),
            F.max("y").alias("y1"),
        )
        .collect()
    )


def test_written_files_have_tight_boxes_and_fewer_touches(spark, tmp_path):
    """The physical claim: write the same 20k-point table 16-file
    linear and 16-file Z-ordered; the Z-order files' mean bounding-box
    area must be a small fraction of the linear layout's, and the
    catalog query's 2-D box must intersect strictly fewer files."""
    pts = spark.range(20_000).select(
        F.col("id").alias("k"),
        # hash-scatter both coordinates so insertion order carries no
        # accidental locality
        (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 4), 16, 10)
         .cast("long") % 256).alias("x"),
        (F.conv(F.substring(F.md5(F.col("id").cast("string")), 5, 4), 16, 10)
         .cast("long") % 256).alias("y"),
    )
    lin, zo = str(tmp_path / "lin"), str(tmp_path / "zo")
    pts.repartitionByRange(16, "k").write.parquet(lin)
    write_zordered(pts, zo, "x", "y", n_files=16)

    def area(b):
        return (b["x1"] - b["x0"] + 1) * (b["y1"] - b["y0"] + 1)

    lin_boxes, zo_boxes = _file_boxes(spark, lin), _file_boxes(spark, zo)
    assert len(lin_boxes) == 16 and len(zo_boxes) == 16
    mean_lin = sum(map(area, lin_boxes)) / len(lin_boxes)
    mean_zo = sum(map(area, zo_boxes)) / len(zo_boxes)
    assert mean_zo < mean_lin / 4, (mean_lin, mean_zo)

    def touched(boxes, xlo, xhi, ylo, yhi):
        return sum(
            1
            for b in boxes
            if b["x1"] >= xlo and b["x0"] <= xhi
            and b["y1"] >= ylo and b["y0"] <= yhi
        )
    t_lin = touched(lin_boxes, 32, 95, 64, 127)
    t_zo = touched(zo_boxes, 32, 95, 64, 127)
    assert t_zo < t_lin, (t_zo, t_lin)
    # both layouts agree on the query result, only cost differs
    n_lin = spark.read.parquet(lin).where(
        "x between 32 and 95 and y between 64 and 127"
    ).count()
    n_zo = spark.read.parquet(zo).where(
        "x between 32 and 95 and y between 64 and 127"
    ).count()
    assert n_lin == n_zo > 0


def test_tiled_write_hits_exactly_the_model_tile_count(spark, tmp_path):
    """Explicit tile-aligned cuts close the model-vs-physical gap that
    sampled ranges leave: every written file's (x, y) bounding box is
    exactly one 32x32 tile, the catalog box query intersects exactly
    the 4 files the bucket model predicts (round-12 sampled ranges
    measured 8 — equal-count split points straddle tiles), and
    tiles_for_box names those same 4 tile ids for catalog-level
    directory pruning."""
    from kmeans_mapreduce_spark.sources.zorder import (
        tiles_for_box,
        write_zordered_tiles,
    )

    pts = spark.range(20_000).select(
        F.col("id").alias("k"),
        (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 4), 16, 10)
         .cast("long") % 256).alias("x"),
        (F.conv(F.substring(F.md5(F.col("id").cast("string")), 5, 4), 16, 10)
         .cast("long") % 256).alias("y"),
    )
    zt = str(tmp_path / "zt")
    write_zordered_tiles(pts, zt, "x", "y", n_tiles=64)
    boxes = _file_boxes(spark, zt)
    # one file per tile, each bounding exactly one 32x32 tile
    assert len(boxes) == 64
    for b in boxes:
        assert b["x1"] - b["x0"] <= 31 and b["y1"] - b["y0"] <= 31
        assert b["x0"] // 32 == b["x1"] // 32
        assert b["y0"] // 32 == b["y1"] // 32
    xlo, xhi, ylo, yhi = 32, 95, 64, 127
    touched = [
        b for b in boxes
        if b["x1"] >= xlo and b["x0"] <= xhi
        and b["y1"] >= ylo and b["y0"] <= yhi
    ]
    assert len(touched) == 4, len(touched)
    # tiles_for_box = the same 4 tiles, by driver-side arithmetic
    want = {
        (b["x0"] // 32, b["y0"] // 32) for b in touched
    }
    ids = tiles_for_box(xlo, xhi, ylo, yhi, n_tiles=64)
    assert len(ids) == 4
    # decode each id back to (tx, ty) and compare
    def decode(z):
        tx = ty = 0
        for b in range(3):
            tx |= ((z >> (2 * b)) & 1) << b
            ty |= ((z >> (2 * b + 1)) & 1) << b
        return tx, ty
    assert {decode(z) for z in ids} == want
    # catalog-level pruning returns the identical result set
    full = spark.read.parquet(zt)
    box = "x between 32 and 95 and y between 64 and 127"
    n_all = full.where(box).count()
    n_pruned = full.where(F.col("_ztile").isin(ids)).where(box).count()
    assert n_all == n_pruned > 0


def test_tiled_write_rejects_non_power_of_four(spark, tmp_path):
    from kmeans_mapreduce_spark.sources.zorder import write_zordered_tiles

    pts = spark.range(4).select(
        F.col("id").alias("x"), F.col("id").alias("y")
    )
    import pytest

    with pytest.raises(ValueError, match="power of 4"):
        write_zordered_tiles(pts, str(tmp_path / "bad"), "x", "y", n_tiles=32)
