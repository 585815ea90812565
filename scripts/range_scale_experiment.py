#!/usr/bin/env python
"""Scale experiment for index-accelerated range search: 1M x 64-dim
clustered corpus, IVF nlist=1000.  For radii admitting ~0.1% / 1% / 10%
of the corpus, measures the triangle-inequality list pruning's surviving
scan fraction and latency vs the exact full-scan sphere, and asserts the
result sets are IDENTICAL (the operator's completeness guarantee).

Run:  python scripts/range_scale_experiment.py [n_rows]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from pgvecto_rs_spark.indexes import IVFIndex
    from pgvecto_rs_spark.operators.search import arrow_distance
    from pgvecto_rs_spark.session import get_spark

    spark = get_spark("range-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="pgvrs_range_scale_")

    # same 16-cluster generator as scale_experiment.py
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

    q = list(corpus.where(F.col("vec_id") == 140_017).collect()[0]["embedding"])

    # one exact pass: distance distribution -> radii at target densities
    t0 = time.perf_counter()
    scored = corpus.select(
        "vec_id", arrow_distance(q, "l2")(F.col("embedding")).alias("d")
    ).cache()
    fracs = {"0.1%": 0.001, "1%": 0.01, "10%": 0.10}
    radii = {
        lbl: float(scored.select(F.expr(f"percentile_approx(d, {f}, 10000)")).collect()[0][0])
        for lbl, f in fracs.items()
    }
    t_dist = time.perf_counter() - t0

    t0 = time.perf_counter()
    idx = IVFIndex.create(
        spark, corpus, os.path.join(work, "ivf"), metric="l2", nlist=1000
    )
    t_build = time.perf_counter() - t0
    idx.search(q, k=1, nprobe=1).collect()  # warm the file index
    idx.list_radii()

    results = {}
    for lbl, radius in radii.items():
        # brute sphere (exact full scan, cached corpus distances NOT
        # reused — timed as a cold full-scan filter)
        t0 = time.perf_counter()
        brute = {
            r["vec_id"]
            for r in corpus.select(
                "vec_id", arrow_distance(q, "l2")(F.col("embedding")).alias("d")
            )
            .where(F.col("d") < radius)
            .collect()
        }
        t_brute = time.perf_counter() - t0

        # surviving lists under the triangle-inequality bound
        rad = idx.list_radii()
        d_c = np.maximum(
            0.0,
            np.sqrt(
                np.maximum(
                    ((idx.centroids.astype(np.float64) - np.asarray(q)) ** 2).sum(axis=1),
                    0.0,
                )
            )
            - rad,
        ) ** 2
        surviving = int((d_c < radius + 1e-9 * max(1.0, radius)).sum())

        t0 = time.perf_counter()
        got = {r["id"] for r in idx.range_search(q, radius).collect()}
        t_idx = time.perf_counter() - t0
        assert got == brute, f"{lbl}: membership diverged ({len(got)} vs {len(brute)})"
        results[lbl] = {
            "radius": round(radius, 4),
            "n_hits": len(got),
            "surviving_lists": surviving,
            "scan_fraction": round(surviving / idx.meta["nlist"], 3),
            "brute_sec": round(t_brute, 3),
            "ivf_sec": round(t_idx, 3),
            "identical": True,
        }

    out = {
        "n_rows": n,
        "dims": 64,
        "nlist": idx.meta["nlist"],
        "dist_pass_sec": round(t_dist, 2),
        "build_sec": round(t_build, 2),
        "radii": results,
    }
    print("RANGE_SCALE_RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
