"""Custom stateful streaming operators via applyInPandasWithState.

The reference's only streaming concern is index freshness; a 100 TB
training-data pipeline additionally needs *event-time* stateful
operators.  This module provides the canonical one for vector
workloads: a per-key running top-k by distance, maintained across
micro-batches — e.g. "closest k events to this probe vector per user,
updated as events stream in".

State layout: per group key, a list of (id, distance) pairs capped at
k — tiny, bounded state per key, safe for millions of keys.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_topk", "streaming_dedup"]


def streaming_topk(
    stream: DataFrame,
    key_col: str,
    id_col: str,
    vector_col: str,
    query: Sequence[float],
    k: int = 5,
    metric: str = "l2",
) -> DataFrame:
    """Maintain per-``key_col`` running top-k rows by distance to
    ``query`` over a stream.  Emits the current top-k set per key on
    every batch that touches the key (update semantics).

    Usage::

        out = streaming_topk(events_stream, "user_id", "event_id", "vec", q, k=5)
        out.writeStream.outputMode("update").format("memory")...
    """
    q = np.asarray([float(x) for x in query], dtype=np.float64)
    m = metric.lower()

    # n_seen = total rows this key has absorbed — lets a consumer pick
    # the most recent emission per key from an append-style sink
    out_schema = f"{key_col} bigint, rank int, {id_col} bigint, distance double, n_seen bigint"
    state_schema = "ids array<bigint>, dists array<double>, n bigint"

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            ids, dists, n_seen = state.get
            ids, dists = list(ids), list(dists)
        else:
            ids, dists, n_seen = [], [], 0
        for pdf in pdfs:
            n_seen += len(pdf)
            mat = np.asarray(pdf[vector_col].tolist(), dtype=np.float64)
            if len(mat) == 0:
                continue
            if m == "l2":
                d = np.einsum("ij,ij->i", mat - q[None, :], mat - q[None, :])
            elif m == "dot":
                d = -(mat @ q)
            else:  # cos
                d = 1.0 - (mat @ q) / (
                    np.linalg.norm(mat, axis=1) * np.linalg.norm(q) + 1e-300
                )
            ids.extend(int(i) for i in pdf[id_col])
            dists.extend(float(x) for x in d)
        order = sorted(range(len(ids)), key=lambda i: (dists[i], ids[i]))[:k]
        ids = [ids[i] for i in order]
        dists = [dists[i] for i in order]
        state.update((ids, dists, n_seen))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(ids),
                "rank": np.arange(1, len(ids) + 1, dtype=np.int32),
                id_col: ids,
                "distance": dists,
                "n_seen": [n_seen] * len(ids),
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_dedup(
    stream: DataFrame,
    hash_col: str,
    id_col: str,
) -> DataFrame:
    """Exact streaming dedup: emit each content hash's FIRST document,
    drop every later duplicate — the streaming form of the batch
    `exact_dedup` operator (a training-data ingest that must not admit
    a document twice across micro-batches).

    The caller computes the content hash up front (e.g.
    ``F.md5(normalized_text)``), so the state key IS the hash: state
    per key is one (keep_id, n_copies) pair — bounded and tiny, safe
    for billions of distinct documents sharded across executors.
    Within a first batch, ties break by min id (same canonical-survivor
    rule as the batch operator).

    Emits (hash, keep_id, n_copies, is_new) per key per touching batch:
    ``is_new`` marks the batch that admitted the document; n_copies
    counts every sighting so consumers can audit duplicate pressure.

    Usage::

        hashed = docs_stream.withColumn("h", F.md5(F.col("text")))
        out = streaming_dedup(hashed, "h", "doc_id")
        out.where("is_new").writeStream...  # admitted documents only
    """
    out_schema = f"{hash_col} string, keep_id bigint, n_copies bigint, is_new boolean"
    state_schema = "keep_id bigint, n bigint"

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            keep_id, n = state.get
            is_new = False
        else:
            keep_id, n = None, 0
            is_new = True
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            batch_min = int(pdf[id_col].min())
            if keep_id is None:
                keep_id = batch_min
        state.update((keep_id, n))
        yield pd.DataFrame(
            {
                hash_col: [key[0]],
                "keep_id": [keep_id],
                "n_copies": [n],
                "is_new": [is_new],
            }
        )

    return stream.groupBy(hash_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
