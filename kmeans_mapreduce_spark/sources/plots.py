"""Plot sinks: SVG scatter + bar chart of clustering results.

Reference parity: the Go engine ships HTML chart sinks via go-echarts —
scatter of 2-D cluster points + centroids (plot/plotter.go:16-86) and a
bar chart of cluster sizes (plot/plotter.go:139-184), with d>2 data
forced through the block-average reshape (plot/plotter.go:114-137 —
ported as plans/kmeans_queries.km_reshape_2d).

Spark-first shape: everything that touches the full dataset happens IN
the cluster (reshape projection, per-cluster aggregation, bounded
sample); the driver only renders the already-small result to SVG.  No
plotting libraries — deterministic, dependency-free string assembly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# go-echarts-ish categorical palette; fixed order = deterministic output
# (the reference uses rand.Intn colors — plotter.go:80 — which we pin).
PALETTE = (
    "#5470c6", "#91cc75", "#fac858", "#ee6666", "#73c0de",
    "#3ba272", "#fc8452", "#9a60b4", "#ea7ccc", "#2f4554",
)


def _scale(vals: list[float], lo: float, hi: float, out_lo: float, out_hi: float) -> list[float]:
    span = (hi - lo) or 1.0
    return [out_lo + (v - lo) / span * (out_hi - out_lo) for v in vals]


def scatter_svg(
    assigned_2d: DataFrame,
    centroids_2d: list[list[float]] | None = None,
    max_points: int = 2000,
    width: int = 640,
    height: int = 480,
) -> str:
    """SVG scatter of [x, y, cluster_id] rows; centroids drawn as larger
    ringed markers.  The DataFrame side samples down to max_points
    (deterministic: lowest xxhash64 of the row) so driver memory is
    bounded no matter the input size — the reference instead collects
    every point into the plot (plotter.go:45-60), which is exactly the
    at-scale failure mode we refuse to reproduce.
    """
    pts = (
        assigned_2d.select("x", "y", "cluster_id")
        .withColumn("_h", F.xxhash64("x", "y", "cluster_id"))
        .orderBy("_h")
        .limit(max_points)
        .collect()
    )
    xs = [r["x"] for r in pts] + [c[0] for c in (centroids_2d or [])]
    ys = [r["y"] for r in pts] + [c[1] for c in (centroids_2d or [])]
    if not xs:
        return f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}"/>'
    sx = _scale(xs, min(xs), max(xs), 20, width - 20)
    sy = _scale(ys, min(ys), max(ys), height - 20, 20)  # y flips
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
    ]
    for i, r in enumerate(pts):
        color = PALETTE[r["cluster_id"] % len(PALETTE)]
        parts.append(
            f'<circle cx="{sx[i]:.1f}" cy="{sy[i]:.1f}" r="2.5" fill="{color}" fill-opacity="0.7"/>'
        )
    for j in range(len(centroids_2d or [])):
        i = len(pts) + j
        color = PALETTE[j % len(PALETTE)]
        parts.append(
            f'<circle cx="{sx[i]:.1f}" cy="{sy[i]:.1f}" r="7" fill="{color}" '
            f'stroke="black" stroke-width="2"/>'
        )
    parts.append("</svg>")
    return "\n".join(parts)


def bar_chart_svg(sizes: DataFrame, width: int = 640, height: int = 480) -> str:
    """SVG bar chart of [cluster_id, size] (plotter.go:139-184 parity).
    The aggregation is k rows — computed distributed, rendered driver-side."""
    rows = sorted(sizes.collect(), key=lambda r: r["cluster_id"])
    if not rows:
        return f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}"/>'
    max_size = max(r["size"] for r in rows) or 1
    bar_w = (width - 40) / len(rows)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
    ]
    for i, r in enumerate(rows):
        h = (r["size"] / max_size) * (height - 60)
        x = 20 + i * bar_w
        color = PALETTE[r["cluster_id"] % len(PALETTE)]
        parts.append(
            f'<rect x="{x:.1f}" y="{height - 30 - h:.1f}" width="{bar_w * 0.8:.1f}" '
            f'height="{h:.1f}" fill="{color}"/>'
        )
        parts.append(
            f'<text x="{x + bar_w * 0.4:.1f}" y="{height - 12}" font-size="12" '
            f'text-anchor="middle">{r["cluster_id"]}</text>'
        )
        parts.append(
            f'<text x="{x + bar_w * 0.4:.1f}" y="{height - 36 - h:.1f}" font-size="11" '
            f'text-anchor="middle">{r["size"]}</text>'
        )
    parts.append("</svg>")
    return "\n".join(parts)


def write_cluster_plots(
    assigned: DataFrame, centroids: list[list[float]], dim: int, out_dir: str
) -> None:
    """End-to-end plot sink: reshape to 2-D in the cluster, render
    scatter + size bar chart, write <out_dir>/{scatter,sizes}.svg."""
    from pathlib import Path

    half = dim // 2
    two_d = assigned.select(
        (F.aggregate(F.slice("features", 1, half), F.lit(0.0), lambda s, v: s + v) / half).alias("x"),
        (F.aggregate(F.slice("features", half + 1, dim - half), F.lit(0.0), lambda s, v: s + v) / (dim - half)).alias("y"),
        "cluster_id",
    )
    cents_2d = [
        [sum(c[:half]) / half, sum(c[half:]) / (dim - half)] for c in centroids
    ]
    sizes = assigned.groupBy("cluster_id").agg(F.count("*").alias("size"))
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "scatter.svg").write_text(scatter_svg(two_d, cents_2d))
    (out / "sizes.svg").write_text(bar_chart_svg(sizes))
