#!/usr/bin/env python
"""Freshness-under-compaction scale experiment: a 1M-row fresh index
serves top-k continuously while micro-batches stream in and the
background optimizer seals/compacts on an aggressive cadence.

What it proves (the generational-manifest design, streaming/freshness.py):

- ZERO search failures during live compaction — retired generations
  survive one full compaction cycle, so in-flight plans keep valid
  files (pre-generation code intermittently threw
  FileNotFoundException here);
- search latency during compaction stays within a small factor of the
  idle latency (compaction runs as ordinary Spark jobs; readers never
  block on the writer lock);
- the converged index equals the ingested live set exactly.

Run:  python scripts/freshness_scale_experiment.py [n_rows] [sealed_kind]
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
    kind = sys.argv[2] if len(sys.argv) > 2 else "flat"
    from pgvecto_rs_spark.session import get_spark
    from pgvecto_rs_spark.streaming import FreshVectorIndex, run_optimizer

    spark = get_spark("freshness-scale")
    spark.sparkContext.setLogLevel("ERROR")

    dims = 64
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                ((F.col("id") * (i * 2654435761 % 1000 + 7)) % 1000 / 500.0 - 1.0).cast(
                    "float"
                )
                for i in range(dims)
            ]
        ).alias("embedding"),
    )
    q = [float(((7 * (i * 2654435761 % 1000 + 7)) % 1000) / 500.0 - 1.0) for i in range(dims)]

    out: dict = {"n": n, "sealed_kind": kind}
    with tempfile.TemporaryDirectory() as d:
        t0 = time.perf_counter()
        idx = FreshVectorIndex.create(spark, base, d, sealed_kind=kind)
        out["build_s"] = round(time.perf_counter() - t0, 2)

        idx.search(q, k=10).collect()  # warm
        lat = []
        for _ in range(5):
            t0 = time.perf_counter()
            idx.search(q, k=10).collect()
            lat.append(time.perf_counter() - t0)
        out["idle_search_ms"] = round(1000 * min(lat), 1)

        # stream 20 batches of 5k rows while the optimizer compacts
        opt = run_optimizer(idx, sealing_secs=0.5, optimizing_secs=3600)
        failures, lat_live = 0, []
        try:
            for b in range(20):
                lo = n + b * 5000
                idx.insert(
                    spark.range(lo, lo + 5000).select(
                        F.col("id").alias("vec_id"),
                        F.array(
                            *[
                                (
                                    (F.col("id") * (i * 2654435761 % 1000 + 7)) % 1000
                                    / 500.0
                                    - 1.0
                                ).cast("float")
                                for i in range(dims)
                            ]
                        ).alias("embedding"),
                    )
                )
                for _ in range(3):
                    t0 = time.perf_counter()
                    try:
                        rows = idx.search(q, k=10).collect()
                        assert len(rows) == 10
                    except Exception:  # noqa: BLE001
                        failures += 1
                    lat_live.append(time.perf_counter() - t0)
            # drain: wait for convergence to fully sealed
            deadline = time.time() + 300
            while time.time() < deadline:
                if not idx.stat()["idx_growing"]:
                    break
                time.sleep(0.5)
        finally:
            opt.stop()
        st = idx.stat()
        out.update(
            {
                "search_failures_during_compaction": failures,
                "live_search_ms_p50": round(1000 * float(np.median(lat_live)), 1),
                "live_search_ms_max": round(1000 * float(np.max(lat_live)), 1),
                "compactions": None,
                "converged_sealed": st["idx_sealed"][0],
                "expected_rows": n + 20 * 5000,
                "converged_ok": st["idx_sealed"][0] == n + 20 * 5000
                and not st["idx_growing"],
                "generations_on_disk": len(
                    [g for g in os.listdir(d) if g.startswith("gen-")]
                ),
            }
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
