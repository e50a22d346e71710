"""One-off audit: list catalog queries whose physical plan contains an
UNPARTITIONED window spec (used to seed tests/test_plan_hygiene.py's
allowlist — the suppression in session.quiet_audited_window_warnings is
only honest while this list stays pinned)."""

from __future__ import annotations

import json
import sys


def main() -> int:
    sys.path.insert(0, ".")
    sys.path.insert(0, "tests")
    import __spark_entry__ as e
    from test_plan_hygiene import unpartitioned_window_specs

    from kmeans_mapreduce_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("scan-windows")
    hits: dict[str, int] = {}
    errors: dict[str, str] = {}
    for name, fn in e.queries().items():
        try:
            plan = (
                fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
            )
        except Exception as exc:  # noqa: BLE001
            errors[name] = str(exc)[:120]
            continue
        n = unpartitioned_window_specs(plan)
        if n:
            hits[name] = n
        print(f"{name}: {n}", file=sys.stderr)
    # hits stays int-valued so consumers can sum/compare; build failures
    # ride a separate key instead of polluting the counts with strings
    print(json.dumps({"hits": hits, "errors": errors}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
