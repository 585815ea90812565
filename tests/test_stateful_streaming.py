"""applyInPandasWithState: per-key running top-k across micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgvecto_rs_spark.queries import Q64
from pgvecto_rs_spark.streaming.stateful import streaming_topk


def test_streaming_topk_state_accumulates(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # fan the corpus into 4 user keys; stream it in multiple files so
    # state must merge across micro-batches
    keyed = emb.select(
        (F.col("vec_id") % 4).alias("user_id"),
        F.col("vec_id").alias("event_id"),
        F.col("embedding").alias("vec"),
    )
    stage = str(tmp_path / "stage")
    keyed.repartition(5).write.mode("overwrite").parquet(stage)

    stream = (
        spark.readStream.schema(keyed.schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    out = streaming_topk(stream, "user_id", "event_id", "vec", Q64, k=3)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stk")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # final state per key: last emitted batch per key must equal the
    # batch-mode exact top-3 for that key
    # memory sink keeps every update; the final state per key is the
    # emission with the highest n_seen
    final = spark.sql(
        """
        SELECT user_id, event_id, rank FROM (
          SELECT *, MAX(n_seen) OVER (PARTITION BY user_id) AS mx FROM stk
        ) WHERE n_seen = mx
        """
    ).collect()
    from pgvecto_rs_spark.operators.search import top_k

    latest: dict = {}
    for r in final:
        latest[(r["user_id"], r["rank"])] = r["event_id"]
    for u in range(4):
        truth = top_k(
            keyed.where(F.col("user_id") == u),
            "vec",
            Q64,
            3,
            metric="l2",
            tiebreaker="event_id",
        ).collect()
        got = [latest[(u, rk)] for rk in (1, 2, 3)]
        assert got == [r["event_id"] for r in truth], u
