"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet tables, then compares row count, column
names, and an order-insensitive value hash (columns sorted by name,
rows sorted by their stringified tuple).  Stricter than necessary on
purpose: catching a mismatch here is free; catching it in
CORRECTNESS_r{N}.json costs a round.

Usage: python tools/compare.py [sf_dir] [query ...] [--vanilla]

``--vanilla`` builds a bare ``SparkSession.builder`` session instead of
``session.get_spark`` — the exact session shape the round driver uses
(no pre-set confs).  Run the driver window through it before a round
closes; the round-2 and round-4 driver-only regressions lived precisely
in the gap between the two session shapes.
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def norm_cell(v) -> str:
    import datetime
    import math

    import numpy as np

    if isinstance(v, np.ndarray):
        v = v.tolist()
    elif isinstance(v, np.integer):
        v = int(v)
    elif isinstance(v, np.floating):
        v = float(v)
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"  # pandas renders SQL NULL as NaN in float cols
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))  # 3.0 vs 3 — engines disagree on int-ness
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) else v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def run(sf_dir: str, only: list[str] | None = None, vanilla: bool = False) -> int:
    import __spark_entry__ as entrymod

    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("compare-vanilla")
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
    else:
        from kmeans_mapreduce_spark.session import get_spark

        spark = get_spark("compare-harness")
    from kmeans_mapreduce_spark.session import quiet_audited_window_warnings

    # the unpartitioned-window WARN is audited (bounded aggregates only;
    # see the helper's docstring) — keep sweep stderr clean
    quiet_audited_window_warnings(spark)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    names = only or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}; known: {sorted(qs)}")
        return len(unknown)
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
            ocols = list(odf.columns)
            orows = [tuple(r) for r in odf.itertuples(index=False, name=None)]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = []
        # The driver compares through pandas, where DuckDB HUGEINT (e.g.
        # SUM over integers) lands as float64 while Spark returns long —
        # "3" vs "3.0" hash-mismatches even when values agree.  Catch
        # int/float skew between engines before it costs a round.
        sint = {f.name for f in sdf.schema.fields
                if f.dataType.typeName() in ("long", "integer", "short", "byte")}
        for c in ocols:
            if c in sint and str(odf[c].dtype).startswith("float"):
                problems.append(f"dtype skew: {c} is integer in spark, {odf[c].dtype} in oracle (CAST the oracle to BIGINT)")
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        if not problems and not srows and not orows:
            # both engines agreeing on ZERO rows is a vacuous green — the
            # hash pins nothing about the query's semantics.  Warn (not
            # fail) so always-empty results get a data-dependent predicate
            # instead of silently counting as coverage.
            print(
                f"WARN  {name}: both engines returned 0 rows — "
                "hash match is vacuous; tighten the predicate"
            )
        if not problems:
            hs, ho = table_hash(scols, srows), table_hash(ocols, orows)
            if hs != ho:
                problems.append(f"hash {hs} vs {ho}")
                # show a sample diff to debug
                so = sorted(
                    "|".join(norm_cell(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))
                    for r in srows
                )
                oo = sorted(
                    "|".join(norm_cell(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i]))
                    for r in orows
                )
                diffs = [(a, b) for a, b in zip(so, oo) if a != b][:3]
                for a, b in diffs:
                    print(f"      spark : {a[:200]}")
                    print(f"      duckdb: {b[:200]}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"ok    {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    vanilla = "--window" in args or "--vanilla" in args
    window = "--window" in args
    args = [a for a in args if not a.startswith("--")]
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a] or None
    if window and only is None:
        # --window: the driver's exact gate — first 50 catalog entries
        # on the vanilla session
        import __spark_entry__ as _e

        only = list(_e.queries())[:50]
    sys.exit(1 if run(sf, only, vanilla=vanilla) else 0)
