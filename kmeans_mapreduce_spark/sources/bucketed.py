"""Bucketed-table persistence: the co-location contract for repeated
equi-joins on a stable key.

Every heavy self-join in this repo (k-NN cells, semantic-dedup
clusters, fact-fact orderkey joins) documents the same 100 TB posture:
"write the corpus bucketed by the join key so the join is co-located
(zero extra shuffle)".  This module is that write path made concrete —
``bucketBy`` pre-hashes rows into a fixed bucket count at WRITE time,
and Spark's bucketed-scan planning then satisfies both join sides'
required hash distribution straight from the files: the self-join
plans with ZERO ``Exchange hashpartitioning`` nodes (the plain-table
control plans two).  tests/test_bucketed.py pins both the plan shape
and result equality with the shuffle-based builder.

No reference analog (the reference has no storage layer at all —
utils.go:12-50 reads CSVs per job); this is beyond-reference surface
the scale story requires.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from urllib.parse import urlparse

from pyspark.sql import DataFrame


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str | list[str],
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> DataFrame:
    """Persist ``df`` bucketed (and by default sorted) by ``bucket_col``
    (one column or a list — composite join keys bucket on the full
    tuple) and return the table-backed frame.

    ``path`` makes the table EXTERNAL (data at the given location —
    tests point this at tmp dirs); without it the session warehouse
    owns the files.  ``sort`` additionally orders rows within each
    bucket file so sort-merge joins skip the per-partition sort too.
    Bucket count is a layout contract: both sides of a co-located join
    must agree on it, so pick the value once per key domain (at 100 TB:
    O(data size / target task size), a power of two for re-splitting).
    """
    spark = df.sparkSession
    if mode == "overwrite" and path is None:
        if spark.catalog.tableExists(table):
            # resolve the REAL location + type from the catalog before
            # dropping: only a MANAGED table's directory belongs to the
            # drop — rmtree'ing a derived warehouse path could hit an
            # EXTERNAL table's data or miss a custom location
            typ = loc = None
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
                if r["col_name"] == "Type":
                    typ = r["data_type"]
                elif r["col_name"] == "Location":
                    loc = r["data_type"]
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            if typ == "MANAGED" and loc:
                p = urlparse(loc)
                if p.scheme in ("", "file"):
                    shutil.rmtree(p.path, ignore_errors=True)
        else:
            # the default catalog is in-memory: a fresh session doesn't
            # know the table, but a PREVIOUS session's managed LOCATION
            # survives in the warehouse dir and saveAsTable refuses to
            # create over it (LOCATION_ALREADY_EXISTS) — with no catalog
            # entry to consult, fall back to the default managed layout:
            # <warehouse>/<table> in the default db,
            # <warehouse>/<db>.db/<table> otherwise
            wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
            if wh.scheme in ("", "file"):
                parts = table.lower().split(".")
                if len(parts) == 1:
                    db, tbl = spark.catalog.currentDatabase().lower(), parts[0]
                else:
                    db, tbl = parts[-2], parts[-1]
                loc = (
                    Path(wh.path) / tbl
                    if db == "default"
                    else Path(wh.path) / f"{db}.db" / tbl
                )
                shutil.rmtree(loc, ignore_errors=True)
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    w = df.write.mode(mode).bucketBy(n_buckets, cols[0], *cols[1:])
    if sort:
        w = w.sortBy(cols[0], *cols[1:])
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
    return df.sparkSession.table(table)


def reap_stale_pid_tables(
    spark, prefix: str, legacy_names: tuple[str, ...] = ()
) -> list[str]:
    """Remove per-process bucketed tables (``<prefix><pid>``) left by
    DEAD driver processes — the cleanup half of the pid-suffix naming
    that makes concurrent drivers sharing one warehouse safe.

    A live process's table is never touched (``os.kill(pid, 0)``
    probes liveness; PermissionError still means alive).  Covers both
    faces of staleness: catalog entries in THIS session (dropped via
    SQL so the managed location goes with them) and on-disk warehouse
    directories from PREVIOUS sessions (the in-memory catalog forgot
    them, so they are swept directly).  Returns what was removed.

    Best-effort by design: liveness is a pid probe, so a RECYCLED pid
    (or another user's unrelated process with the same number) reads
    as alive and defers that entry's cleanup to a later run when the
    number is free.  The scheme errs toward KEEPING — among drivers on
    the SAME host it can never delete a live driver's table — and a
    deferred dir costs disk until the next reap, never correctness.

    SAME-HOST SCOPE: ``os.kill(pid, 0)`` only sees processes on this
    machine.  If the warehouse dir is shared across hosts (NFS, fuse
    mounts), a live REMOTE driver's pid reads as dead here and its
    table would be reaped mid-query — do not use the pid-suffix scheme
    on a cross-host shared warehouse; production multi-host catalogs
    need a real metastore (or a heartbeat file inside the table dir)
    instead of pid probes.

    ``legacy_names``: exact table/dir names from BEFORE the pid-suffix
    scheme (never pid-liveness-checkable) — dropped unconditionally as
    a one-time migration sweep.  MIGRATION CAVEAT: unconditional means
    a still-running PRE-rename driver's live fixed-name table would be
    dropped under it; pass legacy names only once every writer in the
    warehouse uses the suffixed scheme."""
    import os

    def alive(pid: int) -> bool:
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            return False
        except PermissionError:
            return True
        return True

    def stale_pid(name: str) -> bool:
        tail = name[len(prefix):]
        return tail.isdigit() and not alive(int(tail))

    removed: list[str] = []
    legacy = {n.lower() for n in legacy_names}
    for t in spark.catalog.listTables():
        if t.name.lower() in legacy or (
            t.name.startswith(prefix) and stale_pid(t.name)
        ):
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
            removed.append(f"table:{t.name}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    if wh.scheme in ("", "file"):
        # glob per stale class: pid-suffixed dirs under the prefix,
        # plus the exact pre-rename legacy dirs the prefix glob (with
        # its trailing separator) can never match
        stale_dirs = {
            d
            for d in Path(wh.path).glob(f"{prefix}*")
            if d.is_dir() and stale_pid(d.name)
        } | {
            d for n in legacy if (d := Path(wh.path) / n).is_dir()
        }
        # set union: a legacy name that also parses as a stale
        # pid-suffixed dir must be reaped (and reported) exactly once
        for d in sorted(stale_dirs):
            shutil.rmtree(d, ignore_errors=True)
            removed.append(f"dir:{d.name}")
    return removed
