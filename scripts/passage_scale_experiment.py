#!/usr/bin/env python
"""Duplicate-passage-removal + global-shuffle scale experiment.

Generates an N-document corpus (default 200k) DISTRIBUTIVELY with
heavy passage duplication by construction (docs share 10-token
passages drawn from a small passage pool), then runs:

- ``curation.dedup_passages``: verifies the passage-keyed rank shuffle
  stays word-count-shaped (partial agg before the exchange, no
  cartesian anywhere) and measures wall time;
- ``curation.global_shuffle``: verifies the two-phase global index is
  a permutation of 0..n-1 at scale (no single-partition sort in the
  plan) and measures wall time.

Corpus recipe: a pool of P distinct 10-token passages; doc i is
K passages picked by xxhash64(doc_id, slot) — so expected duplicate
fraction is high and known, and generation is native expressions
(no driver loop).

Run:  python scripts/passage_scale_experiment.py [n_docs]
Writes one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

POOL = 50_000  # distinct passages
K_PASSAGES = 5  # passages per doc
W = 10  # tokens per passage


def synth_docs(spark, n: int):
    """documents(doc_id, text): K passages of W tokens from a POOL-sized
    passage pool; passage p's tokens are deterministic from p."""
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    slots = F.sequence(F.lit(0), F.lit(K_PASSAGES - 1))
    pid = lambda s: F.pmod(F.xxhash64(F.col("doc_id"), s, F.lit("p")), POOL)  # noqa: E731
    passage = lambda p: F.concat_ws(  # noqa: E731
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(W - 1)),
            lambda t: F.concat(
                F.lit("w"), F.pmod(F.xxhash64(p, t, F.lit("t")), 9999).cast("string")
            ),
        ),
    )
    text = F.concat_ws(" ", F.transform(slots, lambda s: passage(pid(s))))
    return base.select("doc_id", text.alias("text")).repartition(64)


def synth_docs_hotkey(spark, n: int, hot_frac: float = 0.30):
    """Single-hot-key variant: ONE boilerplate passage appears in
    ``hot_frac`` of all docs (as the doc's first passage); the rest of
    the corpus is the uniform pool.  With a window rank partitioned by
    passage text, that one key's entire partition lands on a single
    task; the min-struct agg shape must absorb it map-side instead."""
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    slots = F.sequence(F.lit(0), F.lit(K_PASSAGES - 1))
    pid = lambda s: F.pmod(F.xxhash64(F.col("doc_id"), s, F.lit("p")), POOL)  # noqa: E731
    passage = lambda p: F.concat_ws(  # noqa: E731
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(W - 1)),
            lambda t: F.concat(
                F.lit("w"), F.pmod(F.xxhash64(p, t, F.lit("t")), 9999).cast("string")
            ),
        ),
    )
    hot = F.concat_ws(" ", F.transform(F.sequence(F.lit(0), F.lit(W - 1)),
                                       lambda t: F.concat(F.lit("hot"), t.cast("string"))))
    is_hot = F.pmod(F.xxhash64(F.col("doc_id"), F.lit("h")), 1000) < int(hot_frac * 1000)
    first = F.when(is_hot, hot).otherwise(passage(pid(F.lit(0))))
    rest = F.transform(F.slice(slots, 2, K_PASSAGES - 1), lambda s: passage(pid(s)))
    text = F.concat_ws(" ", F.concat(F.array(first), rest))
    return base.select("doc_id", text.alias("text")).repartition(64)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    from pgvecto_rs_spark.operators.curation import dedup_passages, global_shuffle
    from pgvecto_rs_spark.session import get_spark

    spark = get_spark(app_name="passage-scale")
    docs = synth_docs(spark, n)
    docs.cache().count()

    t0 = time.time()
    out = dedup_passages(docs, window_tokens=W)
    agg = out.agg(
        F.count("*").alias("docs"),
        F.sum("n_windows").alias("wins"),
        F.sum("n_dup_windows").alias("dups"),
    ).collect()[0]
    t_dedup = time.time() - t0

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, "passage dedup must never go quadratic"
    assert "Window" not in plan, "first-occurrence must be an agg, not a skewed window"

    # Single-hot-key skew probe: one passage in 30% of docs.  The agg
    # shape partial-aggregates the hot key map-side, so wall time must
    # stay within 3x of the uniform corpus (the old window-rank shape
    # serialized 30% of all windows through one task).
    hotdocs = synth_docs_hotkey(spark, n)
    hotdocs.cache().count()
    t0 = time.time()
    hot_out = dedup_passages(hotdocs, window_tokens=W)
    hot_agg = hot_out.agg(
        F.count("*").alias("docs"), F.sum("n_dup_windows").alias("dups")
    ).collect()[0]
    t_hot = time.time() - t0
    skew_ratio = t_hot / max(t_dedup, 1e-9)
    assert skew_ratio < 3.0, f"hot-key blowup: {skew_ratio:.2f}x"

    t0 = time.time()
    shuf = global_shuffle(docs, seed=7, num_buckets=256).select("shuffle_pos")
    stats = shuf.agg(
        F.count("*").alias("n"),
        F.min("shuffle_pos").alias("lo"),
        F.max("shuffle_pos").alias("hi"),
        F.count_distinct("shuffle_pos").alias("nd"),
    ).collect()[0]
    t_shuffle = time.time() - t0
    assert stats["n"] == n and stats["lo"] == 0
    assert stats["hi"] == n - 1 and stats["nd"] == n, "must be a 0..n-1 permutation"

    print(
        json.dumps(
            {
                "n_docs": n,
                "total_windows": agg["wins"],
                "dup_windows": agg["dups"],
                "dup_fraction": round(agg["dups"] / agg["wins"], 4),
                "dedup_passages_sec": round(t_dedup, 2),
                "hotkey_dedup_sec": round(t_hot, 2),
                "hotkey_dup_windows": hot_agg["dups"],
                "hotkey_skew_ratio": round(skew_ratio, 2),
                "global_shuffle_sec": round(t_shuffle, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
