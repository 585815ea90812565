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
