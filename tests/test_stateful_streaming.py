"""applyInPandasWithState: per-key running top-k across micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgvecto_rs_spark.queries import Q64
from pgvecto_rs_spark.streaming.stateful import streaming_topk


def test_streaming_dedup_admits_each_hash_once(spark, sf_dir, tmp_path):
    """Streaming exact dedup: across micro-batches, each content hash is
    admitted exactly once (is_new on its first batch only), keep_id is
    the min id of the first batch, and total n_copies equals the batch
    duplicate counts."""
    from pgvecto_rs_spark.streaming.stateful import streaming_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    hashed = docs.select(F.md5(norm).alias("h"), F.col("doc_id"))
    stage = str(tmp_path / "ddstage")
    hashed.repartition(5).write.mode("overwrite").parquet(stage)

    stream = (
        spark.readStream.schema(hashed.schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    out = streaming_dedup(stream, "h", "doc_id")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("sdd")
        .option("checkpointLocation", str(tmp_path / "ddckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = spark.sql("SELECT * FROM sdd").collect()
    # exactly one admission per hash
    admitted = [r for r in rows if r["is_new"]]
    assert len(admitted) == len({r["h"] for r in rows})
    assert len({r["h"] for r in admitted}) == len(admitted)
    # final n_copies per hash equals the batch-mode copy count
    from pgvecto_rs_spark.operators.dedup import exact_dedup

    truth = {
        r["content_hash"]: (r["n_copies"], r["keep_id"])
        for r in exact_dedup(docs, "text", "doc_id").collect()
    }
    final: dict = {}
    for r in rows:  # last emission per hash has the max n_copies
        cur = final.get(r["h"])
        if cur is None or r["n_copies"] > cur[0]:
            final[r["h"]] = (r["n_copies"], r["keep_id"])
    assert set(final) == set(truth)
    for h, (n, _keep) in truth.items():
        assert final[h][0] == n, h
    # keep_id: first-batch min id — equals the global min id whenever
    # the duplicates all arrived in one file; spot-check the singletons
    singles = [h for h, (n, _) in truth.items() if n == 1]
    for h in singles[:50]:
        assert final[h][1] == truth[h][1], h


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
