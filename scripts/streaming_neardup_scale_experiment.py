#!/usr/bin/env python
"""Streaming near-dup admission scale experiment.

N documents (default 100k) with planted near-dup structure arrive in
``B`` equal batches; each batch runs through
``streaming.StreamingNearDup.process_batch``.  What must hold as the
admitted store grows:

- per-batch wall time stays roughly FLAT (the store side of the
  candidate join is bucket-confined: batch codes vs stored codes is an
  equi-join on (band, bucket), never batch x store);
- the driver-resolved edge list stays tiny (true near-dup pairs
  touching the batch only);
- admitted counts match the planted duplicate structure.

Corpus recipe: same template scheme as curation_scale_experiment —
doc i derives from template i % T with per-position substitution
probability 1/8; docs sharing a template are near-dups of each other
with high probability, so admission should keep ~T of each template
family's earliest arrivals.

Run:  python scripts/streaming_neardup_scale_experiment.py [n_docs] [batches]
Writes one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_TEMPLATES = 500
DOC_TOKENS = 60
SUB_ONE_IN = 12


def synth_docs(spark, n: int):
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    tpl = F.col("doc_id") % N_TEMPLATES
    tok = F.transform(
        F.sequence(F.lit(0), F.lit(DOC_TOKENS - 1)),
        lambda p: F.concat(
            F.lit("w"),
            F.when(
                F.pmod(F.xxhash64(F.col("doc_id"), p, F.lit("sub")), SUB_ONE_IN) == 0,
                F.pmod(F.xxhash64(F.col("doc_id"), p, F.lit("alt")), 5000),
            ).otherwise(F.pmod(F.xxhash64(tpl, p, F.lit("base")), 5000)).cast("string"),
        ),
    )
    return base.select("doc_id", F.concat_ws(" ", tok).alias("text")).repartition(64)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from pgvecto_rs_spark.session import get_spark
    from pgvecto_rs_spark.streaming.neardup import StreamingNearDup

    spark = get_spark(app_name="stream-neardup-scale")
    docs = synth_docs(spark, n)
    docs.cache().count()

    with tempfile.TemporaryDirectory() as d:
        snd = StreamingNearDup(spark, d, threshold=0.8)
        per_batch = []
        admitted_total = 0
        step = n // b
        for i in range(b):
            lo, hi = i * step, (i + 1) * step if i < b - 1 else n
            batch = docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            t0 = time.time()
            admitted = snd.process_batch(batch)
            per_batch.append(round(time.time() - t0, 2))
            admitted_total += len(admitted)
        print(
            json.dumps(
                {
                    "n_docs": n,
                    "batches": b,
                    "admitted": admitted_total,
                    "admit_fraction": round(admitted_total / n, 4),
                    "per_batch_sec": per_batch,
                    "flat_ratio_last_vs_first": round(
                        per_batch[-1] / per_batch[0], 2
                    ),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
