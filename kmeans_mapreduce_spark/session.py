"""SparkSession factory tuned for this harness (local[N], 128 GiB box).

At 100 TB the same settings matter for different reasons: AQE re-plans
shuffles at runtime (skew joins, partition coalescing), Arrow keeps any
unavoidable Python boundary vectorized, and a generous broadcast
threshold keeps dimension tables out of shuffle joins.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "kmeans-mapreduce-spark") -> SparkSession:
    """Build (or reuse) a SparkSession.

    Honors SPARK_GRAFT_CPUS for local parallelism (default 32, matching
    the driver harness).  shuffle.partitions is pinned to the core count
    so local runs don't pay 200-partition scheduling overhead; on a real
    cluster AQE coalescing makes the initial number mostly irrelevant.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime shuffle-partition coalescing + skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        # Event-time contract (see plans.relational._events): UTC session
        # TZ makes NTZ->TIMESTAMP an identity on stored micros, agreeing
        # with DuckDB's naive timestamps on any box TZ; nanosAsLong lets
        # the TIMESTAMP(NANOS) events layout read at all.  Set HERE, at
        # session build, so no query mutates shared conf mid-session.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Runtime bloom-filter pushdown: a selective dimension-side filter
        # becomes a bloom filter applied to the fact-side scan before the
        # shuffle — big shuffle-volume win on selective joins at scale.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Arrow for any pandas UDF / toPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Dim tables (region/nation/customer at bench SF) broadcast freely.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()


def ensure_parallelism(df, factor: int = 1):
    """Repartition up to defaultParallelism*factor — only when the input
    has FEWER partitions (small single-row-group files read as one split,
    serializing expression-heavy stages on one core).

    On big inputs (file count >= cores — any real-scale dataset) this is
    a no-op, so the extra shuffle exists exactly where it pays for
    itself.  The check costs a plan->RDD conversion, no job.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES):
    """Read the harness parquet tables; returns {name: DataFrame}."""
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


# --- named session registry (reference O1 parity) ---------------------------
#
# The reference master keeps per-client session state in two maps keyed
# by client IP (master.go:20-21 Requests/Clients).  The Spark analog is
# SparkSession.newSession(): one shared SparkContext (the cluster
# resources), independent SQL conf / temp views / UDF registries per
# logical client.  The registry below gives those child sessions stable
# names the way the master keys its map.

_SESSION_REGISTRY: dict[str, SparkSession] = {}


def get_named_session(name: str, base: SparkSession | None = None) -> SparkSession:
    """Return (creating on first use) an isolated child session for
    `name`.  Same JVM/SparkContext, separate session state — temp views
    registered by one named session are invisible to the others, which
    is exactly the isolation the reference's per-client registry
    provides for concurrent requests."""
    s = _SESSION_REGISTRY.get(name)
    if s is not None:
        return s
    root = base or get_spark()
    child = root.newSession()
    _SESSION_REGISTRY[name] = child
    return child


def close_named_session(name: str) -> bool:
    """Drop a named session from the registry (the reference deletes the
    map entry when a request completes, master.go:213-227).  The shared
    SparkContext stays up; only the session state becomes collectable.
    Returns whether the name existed."""
    return _SESSION_REGISTRY.pop(name, None) is not None


def quiet_audited_window_warnings(spark: SparkSession) -> None:
    """Silence Spark's "No Partition Defined for Window operation"
    WARN for harness runs.

    Every unpartitioned window in this repo runs over a BOUNDED
    aggregate — |shards|-, |sources|-, |stages|- or top-k-row frames
    (e.g. global rank over 25 nations, RFM terciles over per-customer
    aggregates, shard-balance audit over 8 shards) — never the corpus;
    each site documents this where it appears.  The warning is correct
    advice in general and deliberately accepted at these row counts, so
    the harness runners drop it to keep compare/stress stderr clean
    rather than re-litigating the audited sites every round.  Scoped to
    the one logger (log4j2 Configurator), not a global level change."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:  # pragma: no cover - log4j internals are best-effort
        pass
