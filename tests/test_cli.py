"""CLI parity: the reference client flow (list -> pick -> validate k ->
cluster -> CSV sink -> plots) end-to-end, non-interactively."""

from __future__ import annotations

import os


def _write_csv(tmp_path, name="pts.csv", n=30, dim=3):
    rows = []
    for i in range(n):
        base = float(i % 3) * 10.0
        rows.append(",".join(f"{base + (i % 5) * 0.1 + j:.3f}" for j in range(dim)))
    p = tmp_path / name
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def test_cli_end_to_end(spark, tmp_path, capsys):
    from kmeans_mapreduce_spark.cli import main

    csv = _write_csv(tmp_path)
    out = str(tmp_path / "clusters")
    plots = str(tmp_path / "plots")
    rc = main(
        [csv, "--dim", "3", "--k", "3", "--out", out, "--plots", plots],
        spark=spark,
    )
    assert rc == 0
    printed = capsys.readouterr().out
    assert "cluster 0:" in printed
    assert "Algorithm" in printed  # the master.go:213-227 message shape
    # per-cluster CSV layout (client.go:236-256 analog)
    parts = [d for d in os.listdir(out) if d.startswith("cluster_id=")]
    assert len(parts) == 3
    assert os.path.exists(f"{plots}/scatter.svg")
    assert os.path.exists(f"{plots}/sizes.svg")


def test_cli_menu_and_validation(spark, tmp_path, capsys):
    from kmeans_mapreduce_spark.cli import main

    _write_csv(tmp_path, "a.csv")
    _write_csv(tmp_path, "b.csv")
    # directory without --choice: print the menu, exit 2 (no stdin block)
    rc = main([str(tmp_path)], spark=spark)
    assert rc == 2
    menu = capsys.readouterr().out
    assert "1) a.csv" in menu and "2) b.csv" in menu
    # resolve via --choice; reject invalid k (client.go:188-205)
    rc = main(
        [str(tmp_path), "--choice", "2", "--dim", "3", "--k", "0"],
        spark=spark,
    )
    assert rc == 2
    rc = main(
        [str(tmp_path), "--choice", "2", "--dim", "3", "--k", "99999"],
        spark=spark,
    )
    assert rc == 2
    # and a valid run through the menu path
    rc = main(
        [str(tmp_path), "--choice", "1", "--dim", "3", "--k", "2"],
        spark=spark,
    )
    assert rc == 0
