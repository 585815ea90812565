#!/usr/bin/env python
"""BPE tokenizer scale experiment: train and apply merge rules on an
N-document corpus (default 100k docs, 20x the sf0.1 gate corpus).

What it demonstrates (recorded in BENCHNOTES.md):
- training cost is per-ROUND roughly constant and driven by the
  distinct-word table, not the corpus (the vocab is orders smaller);
- encoding applies rules to the vocab table only and joins counts
  back — corpus-size work is one tokenize + one word-keyed join.

Run:  python scripts/bpe_scale_experiment.py [n_docs] [rounds]
Writes one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from curation_scale_experiment import synth_docs  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    from pgvecto_rs_spark.operators.curation import bpe_encode_counts, bpe_train
    from pgvecto_rs_spark.session import get_spark

    spark = get_spark("bpe-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    docs = synth_docs(spark, n).localCheckpoint(eager=True)
    n_words = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .select("w")
        .distinct()
        .count()
    )

    t0 = time.perf_counter()
    merges = bpe_train(docs, rounds=rounds)
    t_train = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = bpe_encode_counts(docs, merges)
    agg = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_words").alias("words"),
        F.sum("n_bpe_tokens").alias("bpe_tokens"),
    ).collect()[0]
    t_encode = time.perf_counter() - t0

    result = {
        "n_docs": n,
        "rounds": rounds,
        "distinct_words": n_words,
        "train_sec": round(t_train, 2),
        "train_sec_per_round": round(t_train / max(1, len(merges)), 3),
        "encode_sec": round(t_encode, 2),
        "docs_per_sec_encode": round(int(agg["docs"]) / max(t_encode, 1e-9)),
        "corpus_words": int(agg["words"]),
        "bpe_tokens": int(agg["bpe_tokens"]),
        "compression": round(int(agg["bpe_tokens"]) / max(1, int(agg["words"])), 3),
        "first_merges": [(a, b) for _r, a, b, _c in merges[:5]],
    }
    print("BPE_SCALE_RESULT " + json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
