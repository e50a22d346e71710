"""In-flight pipeline metrics via ``df.observe()`` — data-quality
counters collected DURING the action, not by a second scan.

The naive way to report "rows written, nulls seen, revenue total"
alongside a write is to run the aggregations as a separate job —
at 100 TB that doubles the I/O.  Spark's Observation API attaches
named aggregate expressions to a point in the plan; they are computed
incrementally by the SAME tasks that execute the action and surface
on the driver when the action finishes.  Zero extra passes, exact
values (unlike accumulators, observed metrics are consistent under
task retries — Spark reports the value from the successful attempt
set only).

`write_with_metrics` is the instrumented-sink pattern: one call =
one write job + its audit row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observe_metrics(
    df: DataFrame, metrics: dict[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to `df`.  Returns the observed
    frame (use it in place of `df`) and the Observation handle —
    read `observation.get` AFTER an action has run the frame."""
    obs = Observation()
    first, *rest = [c.alias(n) for n, c in metrics.items()]
    return df.observe(obs, first, *rest), obs


def write_with_metrics(
    df: DataFrame,
    path: str,
    metrics: dict[str, Column],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> dict:
    """Write `df` and return the observed metric dict, computed by the
    write job itself (no second scan of the data)."""
    observed, obs = observe_metrics(df, metrics)
    observed.write.mode(mode).format(fmt).save(path)
    return dict(obs.get)
