"""Structured Streaming: availableNow drain must equal the batch plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from kmeans_mapreduce_spark.streaming.windows import (
    incremental_ingest,
    run_available_now,
    stream_tumbling_counts,
)


def _stage_events_dir(sf_dir, tmp_path):
    """FileStreamSource requires a directory; stage the single parquet
    file into one (hardlink — no copy cost)."""
    import os

    d = tmp_path / "events_stream"
    d.mkdir()
    os.link(f"{sf_dir}/events.parquet", d / "part-000.parquet")
    return str(d)


def test_stream_matches_batch(spark, sf_dir, tmp_path):
    """Tumbling-window counts via readStream(availableNow) == the batch
    events_tumbling_window aggregation on the same files."""
    stream = stream_tumbling_counts(spark, _stage_events_dir(sf_dir, tmp_path))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_available_now(stream, out, ckpt)
    got = spark.read.parquet(out)

    from kmeans_mapreduce_spark.plans.relational import _events

    ev = _events(spark, sf_dir)
    want = (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
    )
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    # Append mode only emits windows the watermark has closed: windows in
    # the final <watermark> horizon stay in state when the stream drains.
    # Everything emitted must match batch exactly; only trailing windows
    # may be withheld.
    assert set(g) <= set(w)
    missing = sorted(set(w) - set(g))
    horizon = max(r[0] for r in w)
    assert all(m[0] >= "2024-01-30" for m in missing), missing
    assert len(missing) <= 12, f"{len(missing)} missing vs horizon {horizon}"
    assert len(g) >= len(w) - 12


def test_stream_session_windows_match_batch(spark, sf_dir, tmp_path):
    """Session windows via readStream(availableNow) == batch
    session_window aggregation, modulo the trailing sessions append
    mode withholds (watermark can't prove them closed at drain)."""
    from kmeans_mapreduce_spark.streaming.windows import stream_session_windows

    stream = stream_session_windows(spark, _stage_events_dir(sf_dir, tmp_path))
    out, ckpt = str(tmp_path / "sw_out"), str(tmp_path / "sw_ckpt")
    run_available_now(stream, out, ckpt)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))

    from kmeans_mapreduce_spark.plans.relational import _events

    ev = _events(spark, sf_dir)
    want = sorted(
        map(
            tuple,
            ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
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
            .collect(),
        )
    )
    assert set(got) <= set(want)
    missing = sorted(set(want) - set(got))
    horizon = max(r[0] for r in want)
    assert all(m[0] >= "2024-01-30" for m in missing), missing[:5]
    assert len(got) >= len(want) - 60, f"{len(missing)} sessions withheld"


def test_incremental_ingest_accumulates(spark, sf_dir, tmp_path):
    """foreachBatch sees every event exactly once (the reference's
    accumulate-until-Last contract, master.go:85)."""
    seen = []

    def batch_fn(df, batch_id):
        seen.append(df.count())

    incremental_ingest(spark, _stage_events_dir(sf_dir, tmp_path), batch_fn, str(tmp_path / "ck"))
    assert sum(seen) == 1000


def test_stream_dedup_drops_replayed_file(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark: replaying the same events file
    (two hardlinks = two source files with identical rows) must yield
    each event_id exactly once."""
    import os

    from kmeans_mapreduce_spark.streaming.windows import stream_dedup_events

    d = tmp_path / "events_dup"
    d.mkdir()
    os.link(f"{sf_dir}/events.parquet", d / "part-000.parquet")
    os.link(f"{sf_dir}/events.parquet", d / "part-001.parquet")
    dedup = stream_dedup_events(spark, str(d))
    out, ckpt = str(tmp_path / "dd_out"), str(tmp_path / "dd_ckpt")
    run_available_now(dedup, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 1000
    assert got.select("event_id").distinct().count() == 1000


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    """Watermarked stream-stream join == the same join run as batch."""
    from kmeans_mapreduce_spark.streaming.windows import (
        stream_stream_purchase_attribution,
    )

    joined = stream_stream_purchase_attribution(
        spark, _stage_events_dir(sf_dir, tmp_path)
    )
    out, ckpt = str(tmp_path / "ss_out"), str(tmp_path / "ss_ckpt")
    run_available_now(joined, out, ckpt)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))

    from kmeans_mapreduce_spark.plans.relational import _events

    ev = _events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("purch_user"),
        F.col("event_id").alias("purch_id"),
        F.col("ts").alias("purch_ts"),
    )
    want = sorted(
        map(
            tuple,
            purchases.join(
                clicks,
                F.expr(
                    "purch_user = click_user AND click_ts <= purch_ts "
                    "AND click_ts >= purch_ts - INTERVAL 1 HOUR"
                ),
            )
            .select("purch_user", "purch_id", "click_id", "purch_ts", "click_ts")
            .collect(),
        )
    )
    assert got == want
    assert len(got) > 0


def test_stateful_running_totals(spark, sf_dir, tmp_path):
    """applyInPandasWithState totals must equal the batch groupBy."""
    from kmeans_mapreduce_spark.streaming.windows import stream_user_running_totals

    stream = stream_user_running_totals(spark, _stage_events_dir(sf_dir, tmp_path))
    out, ckpt = str(tmp_path / "state_out"), str(tmp_path / "state_ckpt")
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("user_totals")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode: take the LAST emitted row per user
    got = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 6))
        for r in spark.sql("SELECT * FROM user_totals").collect()
    }

    from kmeans_mapreduce_spark.plans.relational import _events
    from pyspark.sql import functions as F2

    want = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F2.count("*").alias("n"), F2.sum("value").alias("s"))
        .collect()
    }
    assert got == want


def test_stream_built_ivf_index_matches_batch(spark, sf_dir, tmp_path):
    """An IVF index appended from a stream must answer probes exactly
    like the batch-written index (same layout, same partition pruning,
    same results)."""
    import os

    from kmeans_mapreduce_spark.operators import similarity as SIM
    from kmeans_mapreduce_spark.operators.kmeans import fit_kmeans_native
    from kmeans_mapreduce_spark.sources.ingest import points_from_embeddings

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pts = points_from_embeddings(spark, sf_dir, dim=64)
    res = fit_kmeans_native(
        pts, k=8, dim=64, initial_centroids=None, seed=7, max_iter=3
    )

    # FileStreamSource needs a directory; hardlink the table in
    d = tmp_path / "emb_stream"
    d.mkdir()
    os.link(f"{sf_dir}/embeddings.parquet", d / "part-000.parquet")

    stream_idx = str(tmp_path / "stream_idx")
    SIM.stream_append_ivf_index(
        spark, str(d), stream_idx, res.centroids,
        checkpoint=str(tmp_path / "idx_ckpt"),
        id_col="vec_id", vec_col="embedding",
    )
    batch_idx = str(tmp_path / "batch_idx")
    SIM.write_ivf_index(
        embs, res.centroids, batch_idx, id_col="vec_id", vec_col="embedding"
    )

    queries = embs.where(F.col("vec_id") < 10)
    got = sorted(map(tuple, SIM.ivf_topk_from_index(
        spark, stream_idx, queries, res.centroids, k=5, n_probe=3,
        id_col="vec_id", vec_col="embedding",
    ).collect()))
    want = sorted(map(tuple, SIM.ivf_topk_from_index(
        spark, batch_idx, queries, res.centroids, k=5, n_probe=3,
        id_col="vec_id", vec_col="embedding",
    ).collect()))
    assert got == want
    assert len(got) == 10 * 5


def test_stream_ohlc_matches_batch(spark, sf_dir, tmp_path):
    """Streaming OHLC (availableNow drain) == the batch
    events_ohlc_rollup on the same files, modulo watermark-withheld
    trailing buckets."""
    from kmeans_mapreduce_spark.plans.relational import events_ohlc_rollup
    from kmeans_mapreduce_spark.streaming.windows import stream_ohlc_rollup

    stream = stream_ohlc_rollup(spark, _stage_events_dir(sf_dir, tmp_path))
    out, ckpt = str(tmp_path / "ohlc_out"), str(tmp_path / "ohlc_ckpt")
    run_available_now(stream, out, ckpt)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, events_ohlc_rollup(spark, sf_dir).collect()))
    assert set(got) <= set(want)
    missing = sorted(set(want) - set(got))
    assert all(m[0] >= "2024-01-30" for m in missing), missing[:5]
    assert len(got) >= len(want) - 12


def test_stream_static_enrich_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static broadcast enrichment == the same join+agg in batch
    (modulo the append-mode watermark horizon, as elsewhere)."""
    from kmeans_mapreduce_spark.streaming.windows import (
        stream_static_enrich,
        user_tier_dim,
    )

    d = _stage_events_dir(sf_dir, tmp_path)
    stream = stream_static_enrich(spark, d)
    out, ckpt = str(tmp_path / "out_enrich"), str(tmp_path / "ckpt_enrich")
    run_available_now(stream, out, ckpt)
    got = spark.read.parquet(out)

    from kmeans_mapreduce_spark.plans.relational import _events

    ev = _events(spark, sf_dir)
    dim = user_tier_dim(spark, d)
    want = (
        ev.join(dim, "user_id")
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "tier",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert set(g) <= set(w)
    missing = sorted(set(w) - set(g))
    assert all(m[0] >= "2024-01-30" for m in missing), missing
    assert len(g) >= len(w) - 24


def test_events_stream_max_files_per_trigger(spark, tmp_path, sf_dir):
    """max_files_per_trigger must actually reach the FileStreamSource:
    a 2-file dir at 1 file/trigger drains in 2 micro-batches (the
    round-9 stress found the option silently ignored — a single giant
    batch makes every watermark/state-bound measurement vacuous)."""
    import os

    from kmeans_mapreduce_spark.streaming.windows import (
        events_stream_source,
    )

    src = tmp_path / "ev2"
    src.mkdir()
    os.link(f"{sf_dir}/events.parquet", src / "part-000.parquet")
    os.link(f"{sf_dir}/events.parquet", src / "part-001.parquet")
    ev = events_stream_source(spark, str(src), max_files_per_trigger=1)
    q = (
        ev.groupBy("event_type")
        .count()
        .writeStream.format("memory")
        .queryName("mfpt_probe")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batches = [p for p in q.recentProgress if p.get("numInputRows", 0) > 0]
    assert len(batches) == 2, [p.get("numInputRows") for p in q.recentProgress]
