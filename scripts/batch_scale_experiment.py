#!/usr/bin/env python
"""Scale experiment for the distributed (over-cap) search_batch path:
2M x 64-dim IVF corpus, 200k-query batch — far past the 65k driver-
collect cap — answered via executor-assembled query blocks with
in-task centroid probing + pyarrow scans of only the probed list
partitions (indexes/batch.py).  Verifies a sampled subset against
per-query search and reports wall time + per-query throughput.

Run:  python scripts/batch_scale_experiment.py [n_rows] [n_queries]
Writes one JSON line; results recorded in BENCHNOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    from pgvecto_rs_spark.indexes import IVFIndex
    from pgvecto_rs_spark.session import get_spark

    spark = get_spark("batch-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="pgvrs_bscale_")

    center = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (F.hash((F.col("id") % 16) * 64 + i) % 1000).cast("double") / 1000.0,
    )
    noise = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (F.hash(F.col("id") * 64 + i) % 1000).cast("double") / 5000.0,
    )
    vec = F.zip_with(center, noise, lambda c, nz: (c + nz).cast("float"))
    corpus_path = os.path.join(work, "corpus")
    (
        spark.range(n)
        .repartition(64)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        .write.mode("overwrite")
        .parquet(corpus_path)
    )
    corpus = spark.read.parquet(corpus_path)

    t0 = time.perf_counter()
    idx = IVFIndex.create(
        spark, corpus, os.path.join(work, "ivf"), metric="l2", nlist=1000
    )
    t_build = time.perf_counter() - t0

    # 200k queries: perturbed corpus members, generated lazily — never
    # collected to the driver
    qvec = F.zip_with(
        vec,
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: (F.hash(F.col("id") * 131 + i) % 100).cast("double") / 10000.0,
        ),
        lambda v, p: (v + p).cast("float"),
    )
    queries = spark.range(n_q).select(
        F.col("id").alias("qid"), qvec.alias("qv")
    )

    t0 = time.perf_counter()
    out = idx.search_batch(queries, "qid", "qv", k=10, nprobe=10)
    out_path = os.path.join(work, "out")
    out.write.mode("overwrite").parquet(out_path)
    t_batch = time.perf_counter() - t0
    n_out = spark.read.parquet(out_path).count()

    # verify a sample against the per-query path (same nprobe)
    sample_ids = [0, n_q // 3, n_q // 2, n_q - 1]
    got = {
        qid: [
            (r["id"], round(r["distance"], 9))
            for r in spark.read.parquet(out_path)
            .where(F.col("query_id") == qid)
            .orderBy("distance", "id")
            .collect()
        ]
        for qid in sample_ids
    }
    sample_rows = queries.where(F.col("qid").isin(sample_ids)).collect()
    mismatches = 0
    for r in sample_rows:
        exact = [
            (x["id"], round(x["distance"], 9))
            for x in idx.search(list(r["qv"]), k=10, nprobe=10)
            .orderBy("distance", "id")
            .collect()
        ]
        if exact != got[int(r["qid"])]:
            mismatches += 1

    print(
        json.dumps(
            {
                "n_rows": n,
                "n_queries": n_q,
                "build_sec": round(t_build, 2),
                "batch_sec": round(t_batch, 2),
                "per_query_ms": round(1000.0 * t_batch / n_q, 3),
                "result_rows": n_out,
                "sample_mismatches": mismatches,
            }
        )
    )


if __name__ == "__main__":
    main()
