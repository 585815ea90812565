"""Structured Streaming: watermarked tumbling-window aggregation over
the events table (the engine's event-time streaming surface, beyond the
reference's index-freshness-only 'streaming')."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_watermarked_window_agg_matches_batch(spark, sf_dir, tmp_path):
    from pgvecto_rs_spark.queries import _events

    # _events canonicalizes ts to int64 epoch nanos whatever the file's
    # physical type (timestamp[us] or legacy TIMESTAMP(NANOS)).
    events = _events(spark, sf_dir)
    # nanos long -> timestamp for event-time semantics
    with_ts = events.withColumn("ets", F.timestamp_micros((F.col("ts") / 1000).cast("long")))

    stage = str(tmp_path / "stage")
    with_ts.write.mode("overwrite").parquet(stage)

    stream = (
        spark.readStream.schema(with_ts.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    agg = (
        stream.withWatermark("ets", "1 hour")
        .groupBy(F.window("ets", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.sql("SELECT window.start AS ws, event_type, n FROM win_out").collect()
    batch = (
        with_ts.groupBy(F.window("ets", "1 hour").alias("window"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "event_type", "n")
        .collect()
    )
    got_map = {(r["ws"], r["event_type"]): r["n"] for r in got}
    batch_map = {(r["ws"], r["event_type"]): r["n"] for r in batch}
    # append mode emits only windows the watermark has closed; every
    # emitted window must match the batch result exactly, and most
    # windows (all but the trailing hour) must have been emitted
    assert got_map, "no windows emitted"
    for key, n in got_map.items():
        assert batch_map[key] == n
    assert len(got_map) >= len(batch_map) - 10


def test_session_window_stream_matches_batch(spark, sf_dir, tmp_path):
    """Native session_window (30-min gap) streaming aggregation — the
    streaming twin of the batch `events_sessions` query.  Sessions whose
    watermark has passed must match the batch session_window result."""
    from pgvecto_rs_spark.queries import _events

    events = _events(spark, sf_dir)
    with_ts = events.withColumn(
        "ets", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    ).select("user_id", "ets", "value")

    stage = str(tmp_path / "stage_sess")
    with_ts.write.mode("overwrite").parquet(stage)

    stream = (
        spark.readStream.schema(with_ts.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    agg = (
        stream.withWatermark("ets", "1 hour")
        .groupBy(F.session_window("ets", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.sql(
        "SELECT session_window.start AS ss, session_window.end AS se, user_id, n FROM sess_out"
    ).collect()
    batch = (
        with_ts.groupBy(
            F.session_window("ets", "30 minutes").alias("session_window"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("session_window.start").alias("ss"),
            F.col("session_window.end").alias("se"),
            "user_id",
            "n",
        )
        .collect()
    )
    got_map = {(r["ss"], r["se"], r["user_id"]): r["n"] for r in got}
    batch_map = {(r["ss"], r["se"], r["user_id"]): r["n"] for r in batch}
    assert got_map, "no sessions emitted"
    for key, n in got_map.items():
        assert batch_map.get(key) == n, key
    # all sessions except those still open under the final watermark
    # must have been emitted
    assert len(got_map) >= int(0.8 * len(batch_map))


def test_session_window_batch_matches_lag_formulation(spark, sf_dir):
    """session_window's session count per user == the events_sessions
    lag/cumsum formulation (same 30-min gap rule) — native operator and
    manual window plan agree."""
    from pgvecto_rs_spark.queries import _events, events_sessions

    events = _events(spark, sf_dir)
    with_ts = events.withColumn(
        "ets", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    )
    native = (
        with_ts.groupBy(
            F.session_window("ets", "30 minutes").alias("sw"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    lag_based = events_sessions(spark, sf_dir).select("user_id", "n_sessions")
    got = {r["user_id"]: r["n_sessions"] for r in native.collect()}
    want = {r["user_id"]: r["n_sessions"] for r in lag_based.collect()}
    assert got == want
