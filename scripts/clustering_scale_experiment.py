#!/usr/bin/env python
"""Clustering scale experiment: fixed-point k-means + SemDeDup over an
N-vector synthetic embedding table (default 1M x 64).

What it demonstrates (recorded in BENCHNOTES.md):
- the assignment pass is a pure native projection (k integer folds per
  row, no shuffle) whose cost is linear in N and independent of
  partition count;
- the centroid update reduces to k x dims rows via map-side partial
  aggregation — the only shuffle, constant-size output;
- SemDeDup's pairwise stage stays cluster-blocked (work ~ sum of
  cluster sizes squared / N for balanced clusters, never N^2).

Vectors are generated natively (xxhash64-seeded uniform in [-0.5, 0.5],
with every 100th vector a near-copy of its predecessor to give semdedup
real prey) — no driver loop.

Run:  python scripts/clustering_scale_experiment.py [n] [k]
Writes one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

DIMS = 64


def synth_vecs(spark, n: int):
    base = spark.range(n).select(F.col("id").alias("vec_id"))
    # every 100th row shadows row-1's coordinates with +1e-4 jitter
    src = F.when(F.col("vec_id") % 100 == 0, F.col("vec_id") - 1).otherwise(
        F.col("vec_id")
    )
    dims = F.sequence(F.lit(0), F.lit(DIMS - 1))
    vec = F.transform(
        dims,
        lambda i: (
            (F.pmod(F.xxhash64(src, i, F.lit("v")), 1000001) - 500000)
            / F.lit(1000000.0)
            + F.when(F.col("vec_id") % 100 == 0, F.lit(1e-4)).otherwise(F.lit(0.0))
        ).cast("float"),
    )
    return base.select("vec_id", vec.alias("embedding"))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    from pgvecto_rs_spark.session import get_spark
    from pgvecto_rs_spark.operators import clustering as CL

    spark = get_spark("clustering-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"n": n, "k": k, "dims": DIMS}
    t0 = time.perf_counter()
    vecs = synth_vecs(spark, n).repartition(
        spark.sparkContext.defaultParallelism
    ).cache()
    out["n_rows"] = vecs.count()
    out["gen_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    cents = CL.kmeans_fit(vecs, k=k, iters=2)
    out["fit_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    assigned = CL.kmeans_assign(vecs, cents)
    sizes = assigned.groupBy("cluster").count().collect()
    out["assign_s"] = round(time.perf_counter() - t0, 2)
    out["n_clusters"] = len(sizes)
    out["max_cluster"] = max(r["count"] for r in sizes)

    # semdedup's pairwise stage is ~ sum(cluster_size^2); with k fixed it
    # grows as N^2/k, so at large N you raise k (SemDeDup uses tens of
    # thousands of clusters) or cluster hierarchically.  The native-expr
    # assignment path is built for k up to ~128 (expression-tree size);
    # cap the pairwise demonstration at 200k vectors per run here.
    if n <= 200_000:
        t0 = time.perf_counter()
        sd = CL.semdedup(vecs, cents, threshold=0.999)
        n_dropped = sd.where(~F.col("kept")).count()
        out["semdedup_s"] = round(time.perf_counter() - t0, 2)
        out["n_dropped"] = n_dropped

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
