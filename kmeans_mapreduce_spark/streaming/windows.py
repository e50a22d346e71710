"""Structured Streaming surface.

Reference parity: the client→master chunked ingest protocol
(reference utils/structs.go:10-11, client.go:49-89, master.go:71-95) is
bulk ingest framing — "accumulate chunks until Last, then run the job".
Its honest Spark equivalent is a file/stream source with
``Trigger.AvailableNow`` draining everything then stopping, plus
``foreachBatch`` for the job body.  True event-time streaming
(watermarks, tumbling windows, late data) is beyond-reference surface
the mandate asks for; it shares its aggregation plan with the batch
query in plans/relational.events_tumbling_window, which is what the
DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def events_stream_source(
    spark: SparkSession,
    events_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over an events parquet dir, normalized to a true
    TIMESTAMP ``ts`` column whatever physical layout the files use.
    ``max_files_per_trigger`` bounds micro-batch size (files per
    trigger) so bulk replays exercise REAL multi-batch behavior —
    watermark advance and state eviction — instead of one giant batch.

    The harness has shipped events.ts as TIMESTAMP(NANOS) (readable only
    via the nanosAsLong legacy conf -> bigint), as timestamp[us] (read
    as TIMESTAMP_NTZ), and could ship plain TIMESTAMP.  FileStreamSource
    requires an explicit schema, so we sniff the layout with a one-file
    batch read (metadata-only — no job) and reuse that schema for the
    stream, then apply the same normalization as plans.relational._events
    so stream and batch event-times agree bit-for-bit.
    """
    # Same contract as _events: UTC session TZ makes NTZ->TIMESTAMP an
    # identity on the stored micros value.  get_spark sets both confs at
    # session build; the guards only fire for externally-built sessions.
    # timeZone always resolves (JVM TZ default) and Spark 4 validates any
    # fallback default as a timezone string — so pass none.
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Type-valid default required: Spark 4 validates the fallback against
    # the boolean conf type, so "" throws on sessions without the key set.
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    reader = spark.readStream.schema(batch.schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(events_dir)
    if dict(batch.dtypes)["ts"] == "bigint":  # nanos layout
        src = src.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return src.withColumn("ts", F.col("ts").cast("timestamp"))


def stream_tumbling_counts(
    spark: SparkSession,
    events_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """readStream over the events parquet dir -> watermarked tumbling
    window counts per event_type.

    Watermark bounds state: aggregates for windows older than
    (max event time - watermark) are finalized and evicted, so state
    size is O(active windows x event types) regardless of input volume —
    the property that matters when this runs against a firehose.
    """
    ev = events_stream_source(spark, events_dir)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_session_windows(
    spark: SparkSession,
    events_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Watermarked per-user SESSION windows over the event stream:
    dynamic-length windows that extend while events keep arriving
    within `gap` of each other and close after a quiet period.

    Unlike tumbling windows (fixed boundaries, state keyed by window
    start), session state is per (user, open-session) and MERGES when a
    late event bridges two provisional sessions — Spark's
    session_window handles the merge; the watermark closes sessions
    whose gap can no longer be bridged, bounding state by
    (active users x open sessions) regardless of stream length.  The
    batch equivalent is plans.relational.events_session_window, which
    shares the aggregation shape the DuckDB oracle pins.
    """
    ev = events_stream_source(spark, events_dir, max_files_per_trigger)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def run_available_now(stream_df: DataFrame, out_path: str, checkpoint: str) -> None:
    """Drain everything currently available (Trigger.AvailableNow) into
    parquet and stop — the reference's accumulate-until-Last framing."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def incremental_ingest(
    spark: SparkSession,
    events_dir: str,
    batch_fn,
    checkpoint: str,
) -> None:
    """foreachBatch ingest loop: batch_fn(DataFrame, batch_id) is invoked
    per micro-batch with the new chunk — the direct analog of the
    master's per-message accumulate step (master.go:85), except state
    and exactly-once bookkeeping live in the checkpoint, not driver RAM."""
    src = events_stream_source(spark, events_dir)
    q = (
        src.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_dedup_events(
    spark: SparkSession, events_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup: dropDuplicatesWithinWatermark on event_id.

    The streaming face of the batch dedup_exact operator: state keeps
    only ids seen within the watermark horizon, so memory is bounded by
    (arrival rate x watermark) — the property that lets exact dedup run
    against an unbounded firehose.  Late duplicates beyond the horizon
    are the documented trade-off (batch reconciliation catches them)."""
    src = events_stream_source(spark, events_dir)
    return src.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_stream_purchase_attribution(
    spark: SparkSession,
    events_dir: str,
    attribution_window: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stream-stream inner join: attribute each 'purchase' to the same
    user's preceding 'click' within the attribution window.

    Both sides are watermarked and the join condition carries an
    explicit event-time range, so Spark can bound join state: a click
    is dropped from state once no purchase within the window can still
    arrive.  Without the time bound this join would hold both streams
    forever — the canonical unbounded-state mistake this module exists
    to avoid."""

    def side(event_type: str, alias: str) -> DataFrame:
        src = events_stream_source(spark, events_dir, max_files_per_trigger)
        return (
            src.where(F.col("event_type") == event_type)
            .withWatermark("ts", "2 hours")
            .select(
                F.col("user_id").alias(f"{alias}_user"),
                F.col("event_id").alias(f"{alias}_id"),
                F.col("ts").alias(f"{alias}_ts"),
            )
        )

    clicks = side("click", "click")
    purchases = side("purchase", "purch")
    return purchases.join(
        clicks,
        F.expr(
            "purch_user = click_user AND "
            f"click_ts <= purch_ts AND click_ts >= purch_ts - INTERVAL {attribution_window}"
        ),
        "inner",
    ).select("purch_user", "purch_id", "click_id", "purch_ts", "click_ts")


USER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("max_ts_us", T.LongType()),
    ]
)


def stream_user_running_totals(spark: SparkSession, events_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count / value sum across micro-batches.

    This is the "custom stateful streaming operator" escape hatch for
    semantics Spark's built-in aggs can't express (arbitrary per-key
    state machines).  State is one tiny tuple per user, explicitly
    managed; with a real watermark + timeout policy, idle keys would be
    evicted (GroupStateTimeout.NoTimeout here — the harness events span
    a bounded window).

    Scale shape: input shuffles once on user_id; each task holds state
    only for its key range; Arrow-batched pandas per group.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # unix_micros computed JVM-side so the pandas state fn never has to
    # guess the datetime64 unit Arrow hands it (ns vs us varies by layout).
    src = events_stream_source(spark, events_dir).withColumn(
        "ts_us", F.unix_micros("ts")
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total, max_ts = 0, 0.0, 0
        if state.exists:
            n, total, max_ts = state.get
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            max_ts = max(max_ts, int(pdf["ts_us"].max()))
        state.update((n, total, max_ts))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [total],
                "max_ts_us": [max_ts],
            }
        )

    return (
        src.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=USER_STATE_SCHEMA,
            stateStructType="n_events long, sum_value double, max_ts_us long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_ohlc_rollup(
    spark: SparkSession,
    events_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming continuous aggregate: per (hour, event_type) OHLC over
    `value`, the streaming face of plans.relational.events_ohlc_rollup.

    open/close are min_by/max_by on event time — order-insensitive
    aggregates with constant per-bucket state, so the streaming rollup
    carries the same O(buckets) state bound as the batch one-pass plan;
    the watermark finalizes and evicts buckets, making this an
    always-fresh materialized downsample (the hypertable continuous
    aggregate, Spark-native)."""
    ev = events_stream_source(spark, events_dir)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            # same (ts, event_id) tiebreak as the batch rollup — a bare
            # min_by(value, ts) is partition-order-dependent on ts ties
            F.round(F.min_by("value", F.struct("ts", "event_id")), 4).alias(
                "open"
            ),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", F.struct("ts", "event_id")), 4).alias(
                "close"
            ),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "avg_value",
            "n_events",
        )
    )


def user_tier_dim(spark: SparkSession, events_dir: str) -> DataFrame:
    """Static per-user dimension: lifetime value tier (above/below the
    global mean).  Computed ONCE from the batch table — exactly the
    information a stream cannot reconstruct from watermarked windows."""
    ev = spark.read.parquet(events_dir)
    if dict(ev.dtypes)["ts"] == "bigint":
        ev = ev.drop("ts")  # tier needs no event time; skip nanos decode
    ltv = ev.groupBy("user_id").agg(F.sum("value").alias("ltv"))
    mean_ltv = ltv.agg(F.avg("ltv")).collect()[0][0]
    return ltv.select(
        "user_id",
        F.when(F.col("ltv") >= mean_ltv, F.lit("high"))
        .otherwise(F.lit("low"))
        .alias("tier"),
    )


def stream_static_enrich(
    spark: SparkSession,
    events_dir: str,
    window: str = "1 hour",
) -> DataFrame:
    """Stream-static join: enrich each streamed event with its user's
    lifetime-value tier from a BATCH dimension, then windowed per-tier
    revenue.

    The dimension side is a plain DataFrame — Spark re-evaluates it per
    micro-batch (so a dim refresh is picked up live) and, broadcast,
    the join adds no shuffle and no stream state: only the windowed agg
    keeps state, bounded by the watermark.  This is the canonical
    enrichment topology at 100 TB: facts stream; dims stay broadcastable
    tables."""
    dim = user_tier_dim(spark, events_dir)
    src = events_stream_source(spark, events_dir).withWatermark("ts", "2 hours")
    return (
        src.join(F.broadcast(dim), "user_id")
        .groupBy(F.window("ts", window).alias("w"), "tier")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "tier",
            "n_events",
            "sum_value",
        )
    )
