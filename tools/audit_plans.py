"""Generate PLAN_INVENTORY.md: per-catalog-query physical-plan audit.

For every ``queries()`` entry, build the DataFrame at the given sf dir
and count the plan features that matter at 100 TB:

  shuffles   Exchange hashpartitioning / rangepartitioning (data moves)
  bcast      BroadcastExchange (small side shipped to every executor)
  sorts      Sort nodes (in-partition or range sort)
  gen        Generate nodes (explode fan-out)
  bnlj       BroadcastNestedLoopJoin (allowed only on the documented
             bounded-broadcast allowlist — see tests/test_plan_hygiene.py)
  pushed     scans whose parquet PushedFilters is non-empty

The numbers are the INITIAL AQE plan (what Catalyst committed to before
runtime re-planning; AQE can only improve them).  Iterative queries
(K-Means fits, PageRank) execute driver loops while building — their
row reports the FINAL returned frame's plan, with loop economics
documented in PLANS.md instead.

Iterative MIN-LABEL queries (connected components) are special-cased:
their returned frame's lineage spans every pre-checkpoint round, so a
raw node count walks the full unrolled DAG (350+ "shuffles") while the
EXECUTED shape is two shuffles per round over a checkpoint-truncated
prefix.  Their rows report per-round shape x observed rounds instead
of raw lineage counts.

Usage: python tools/audit_plans.py [sf_dir] > PLAN_INVENTORY.md
"""

from __future__ import annotations

import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _cc_rounds() -> int:
    from kmeans_mapreduce_spark.operators import components

    return components.LAST_RUN_ROUNDS


# query name -> per-round executed shape (the driver loop materializes
# each round as its own job; _cc_rounds() reads the count the build
# just executed).  The trailing "+ ..." names the one-off finalization
# plan on top of the loop.
ITERATIVE = {
    "dedup_components": lambda: (
        f"2 shuffles/round x {_cc_rounds()} rounds (observed), "
        "localCheckpoint every 5"
    ),
    "dedup_cluster_representatives": lambda: (
        f"2 shuffles/round x {_cc_rounds()} rounds (observed), "
        "localCheckpoint every 5, + 1 join to pick representatives"
    ),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from kmeans_mapreduce_spark.session import get_spark

    import __spark_entry__ as e

    spark = get_spark("audit-plans")
    rows = []
    for name, fn in e.queries().items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in ITERATIVE:
                rows.append(
                    (
                        name,
                        ITERATIVE[name](),
                        "—",
                        "—",
                        "—",
                        "—",
                        "—",
                        f"{time.time() - t0:.1f}",
                    )
                )
                print(f"{name} done", file=sys.stderr, flush=True)
                continue
            plan = df._jdf.queryExecution().executedPlan().toString()
            rows.append(
                (
                    name,
                    len(re.findall(r"Exchange (?:hash|range)partitioning", plan)),
                    plan.count("BroadcastExchange"),
                    plan.count("Sort ["),
                    plan.count("Generate "),
                    plan.count("BroadcastNestedLoopJoin"),
                    len(re.findall(r"PushedFilters: \[[^\]]+\]", plan)),
                    f"{time.time() - t0:.1f}",
                )
            )
        except Exception as ex:  # pragma: no cover - inventory must finish
            rows.append((name, "-", "-", "-", "-", "-", "-", f"ERR {ex}"))
        print(f"{name} done", file=sys.stderr, flush=True)

    print("# Physical-plan inventory (auto-generated)")
    print()
    print(f"`python tools/audit_plans.py {sf_dir}` — one row per catalog")
    print("query; column meanings in the script docstring.  Regenerate")
    print("whenever the catalog changes.")
    print()
    print("| query | shuffles | bcast | sorts | gen | bnlj | pushed | build s |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(str(x) for x in r) + " |")

    # the trained-calibration family's build budget (frozen at five —
    # see pipeline_queries16.TRAINED_CALIBRATION_FAMILY): report the
    # measured combined build time so growth is visible per round
    from kmeans_mapreduce_spark.plans.pipeline_queries16 import (
        TRAINED_CALIBRATION_FAMILY,
    )

    fam = [r for r in rows if r[0] in TRAINED_CALIBRATION_FAMILY]
    errored = [r[0] for r in fam if str(r[-1]).startswith("ERR")]
    total = sum(
        float(r[-1]) for r in fam if not str(r[-1]).startswith("ERR")
    )
    print()
    err_note = (
        f" EXCLUDING {len(errored)} ERRORED member(s): {errored} —"
        " fix before trusting the total"
        if errored
        else ""
    )
    print(
        f"Trained-calibration family ({len(fam)} queries, frozen at 5): "
        f"combined build {total:.1f} s{err_note} (budget ~120 s — a "
        "growing total here means a sixth trained query joined without "
        "the shared-prefix plan)."
    )


if __name__ == "__main__":
    main()
