#!/usr/bin/env python
"""Scale experiment: 2M x 64-dim corpus, IVF at the reference's default
operating point (nlist=1000, nprobe=10).  Measures build time, exact-scan
latency, probe-pruned search latency, scan fraction, and recall@10.

Run:  python scripts/scale_experiment.py [n_rows]
Writes one JSON line; results recorded in BENCHNOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    quant = sys.argv[2] if len(sys.argv) > 2 else None  # e.g. "pq"
    from pgvecto_rs_spark.session import get_spark
    from pgvecto_rs_spark.indexes import IVFIndex
    from pgvecto_rs_spark.operators.search import arrow_distance

    spark = get_spark("scale-experiment", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="pgvrs_scale_")
    corpus_path = os.path.join(work, "corpus")

    # deterministic synthetic corpus: 16-cluster gaussian-ish mixture so
    # IVF has structure (FIXTURES.md embedding-generation recipe)
    t0 = time.perf_counter()
    center = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (F.hash((F.col("id") % 16) * 64 + i) % 1000).cast("double") / 1000.0,
    )
    noise = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (F.hash(F.col("id") * 64 + i) % 1000).cast("double") / 5000.0,
    )
    vec = F.zip_with(center, noise, lambda c, nz: (c + nz).cast("float"))
    (
        spark.range(n)
        .repartition(64)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        .write.mode("overwrite")
        .parquet(corpus_path)
    )
    t_gen = time.perf_counter() - t0
    corpus = spark.read.parquet(corpus_path)

    # ground truth queries: 5 perturbed members
    qrows = corpus.where(F.col("vec_id").isin([3, 70_001, 140_017, 900_007, 1_500_003])).collect()
    queries = [list(r["embedding"]) for r in qrows]

    # exact scan latency + ground truth
    truths, t_exact = [], 0.0
    for q in queries:
        t0 = time.perf_counter()
        rows = (
            corpus.select("vec_id", arrow_distance(q, "l2")(F.col("embedding")).alias("d"))
            .orderBy("d", "vec_id")
            .limit(10)
            .collect()
        )
        t_exact += time.perf_counter() - t0
        truths.append({r["vec_id"] for r in rows})

    # IVF build at reference defaults (+replicas=2, our storage-for-
    # recall extension)
    t0 = time.perf_counter()
    idx = IVFIndex.create(
        spark, corpus, os.path.join(work, "ivf"), metric="l2", nlist=1000, replicas=2,
        quantization=quant, pq_ratio=4,
    )
    t_build = time.perf_counter() - t0

    # warm the cached file index (one listing job), then measure
    idx.search(queries[0], k=1, nprobe=1).collect()

    points = [(10, 0), (20, 0), (50, 0)]
    if quant:  # quantized first pass: show the rerank-window knob too
        points += [(20, 200), (50, 200)]
    curve = {}
    for nprobe, rr in points:
        recalls, t_search = [], 0.0
        for q, truth in zip(queries, truths):
            t0 = time.perf_counter()
            got = {
                r["id"]
                for r in idx.search(q, k=10, nprobe=nprobe, rerank_size=rr).collect()
            }
            t_search += time.perf_counter() - t0
            recalls.append(len(got & truth) / 10)
        curve[f"nprobe={nprobe},rerank={rr}"] = {
            "recall_at_10": round(sum(recalls) / len(recalls), 3),
            "sec_per_query": round(t_search / len(queries), 3),
            "scan_fraction": round(nprobe / idx.meta["nlist"], 3),
        }

    out = {
        "n_rows": n,
        "dims": 64,
        "nlist": idx.meta["nlist"],
        "quantization": quant,
        "replicas": 2,
        "gen_sec": round(t_gen, 2),
        "build_sec": round(t_build, 2),
        "exact_scan_sec_per_query": round(t_exact / len(queries), 3),
        "nprobe_curve": curve,
    }
    print("SCALE_RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
