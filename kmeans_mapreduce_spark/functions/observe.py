"""Deadline-bounded ``Observation.get`` — ONE definition, two paths.

Why this exists: the write that computes an ``df.observe`` observation
has already completed synchronously by the time the caller reads it, so
the metrics are normally available immediately — but delivery rides the
listener bus, and a dropped event would make the stock ``.get`` (which
waits forever) wedge a long-lived caller (the composed corpus fold, the
IVF compactor) with no error and no replay.  Failing the caller's unit
of work instead is safe everywhere this is used: every consumer's write
is an idempotent batch-dir overwrite, so a retry recomputes the
observation exactly.

Two paths, selected at first use and cached process-wide:

* **fast path** — poll the JVM observation's own bounded wait
  (``getRowOrEmpty``, ~100 ms per call): the same private handles the
  stock ``.get`` uses (``obs._jo``, ``PythonSQLUtils.toPyRow``), pinned
  on this PySpark by tests.  Private API, so it is *feature-detected*,
  never assumed.
* **fallback path** — the PUBLIC ``Observation.get`` run on a daemon
  thread under a ``concurrent.futures`` deadline.  A PySpark upgrade
  that moves the private handles degrades to this (same timeout
  semantics, one parked daemon thread per lost event) instead of
  raising ``AttributeError``/``Py4JError`` on every batch of a live
  stream (ADVICE r14).  The abandoned thread stays blocked in the stock
  wait; it is a daemon and holds no locks the caller needs, so process
  exit is unaffected.
"""

from __future__ import annotations

import time

# None = not probed yet; True/False = cached verdict for this process
# (the handles cannot appear or vanish mid-process — one probe is
# enough, and re-raising Py4J errors per batch would spam the JVM).
_FAST_PATH_OK: bool | None = None


def _fast_poll(obs, timeout_sec: float) -> dict:
    """Bounded wait via the JVM observation's getRowOrEmpty."""
    from pyspark.serializers import CPickleSerializer

    utils = getattr(
        obs._jvm, "org.apache.spark.sql.api.python.PythonSQLUtils"
    )
    deadline = time.monotonic() + timeout_sec
    while True:
        row_opt = obs._jo.getRowOrEmpty()
        if not row_opt.isEmpty():
            row = CPickleSerializer().loads(utils.toPyRow(row_opt.get()))
            return row.asDict(recursive=False)
        if time.monotonic() > deadline:
            raise TimeoutError(
                f"observed metrics not delivered within {timeout_sec}s "
                f"of the write completing — listener event lost; "
                f"failing this (idempotently replayable) unit of work "
                f"instead of hanging"
            )


def _public_get_with_deadline(obs, timeout_sec: float) -> dict:
    """Stock Observation.get on a daemon thread under a deadline.

    A plain daemon ``threading.Thread``, NOT a ThreadPoolExecutor: on a
    lost event the worker stays parked in the stock blocking wait
    forever, and executor workers are non-daemon — the interpreter's
    atexit join on them would turn the per-batch wedge this function
    exists to prevent into a process-exit wedge."""
    import threading

    box: dict = {}
    err: list[BaseException] = []

    def _run() -> None:
        try:
            box["v"] = dict(obs.get)
        except BaseException as e:  # noqa: BLE001 — relayed below
            err.append(e)

    t = threading.Thread(target=_run, daemon=True, name="observed-fallback")
    t.start()
    t.join(timeout_sec)
    if t.is_alive():
        raise TimeoutError(
            f"observed metrics not delivered within {timeout_sec}s "
            f"(public-API fallback) — listener event lost; failing "
            f"this (idempotently replayable) unit of work instead "
            f"of hanging"
        )
    if err:
        raise err[0]
    return box["v"]


_ABSENT = object()


def observed(obs, timeout_sec: float = 300.0) -> dict:
    """``Observation.get`` with a deadline (see module docstring)."""
    global _FAST_PATH_OK
    # distinguish "attribute present and None" (genuinely unattached —
    # a caller bug worth a clear error) from "attribute absent" (the
    # PySpark-upgrade case this module exists to survive: go straight
    # to the public path, where an unattached observation surfaces as
    # the deadline instead)
    jo = getattr(obs, "_jo", _ABSENT)
    if jo is None:
        raise ValueError("observation was never attached to a write")
    if jo is _ABSENT:
        # route only THIS call to the public path, and leave the
        # process verdict UNTOUCHED either way: the attribute's absence
        # on one (possibly duck-typed) object says nothing about the
        # installed PySpark, so it must neither demote a confirmed
        # fast-path verdict nor pre-empt the probe a later real
        # Observation would run (a real upgrade that removed _jo
        # everywhere lands in this branch on every call regardless)
        return _public_get_with_deadline(obs, timeout_sec)
    if _FAST_PATH_OK is None:
        # feature-detect the private handles with a zero-wait probe:
        # py4j resolves methods at CALL time, so a missing
        # getRowOrEmpty surfaces here as Py4JError, and a relocated
        # PythonSQLUtils as TypeError/AttributeError on the getattr
        try:
            return_now = _fast_poll(obs, timeout_sec)
            _FAST_PATH_OK = True
            return return_now
        except TimeoutError:
            _FAST_PATH_OK = True
            raise
        except Exception:
            _FAST_PATH_OK = False
    if _FAST_PATH_OK:
        return _fast_poll(obs, timeout_sec)
    return _public_get_with_deadline(obs, timeout_sec)
