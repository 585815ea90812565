#!/usr/bin/env python
"""HNSW build-cost scaling (r10 verdict item 4): the 1M x 64 graph
build was the measured wall-clock bottleneck of a 100x-scale
deployment (514 s on 32 cores in r10 vs IVF's 39 s), with search-side
scaling proven but build-side scaling unmeasured.

Two axes, both over the FIXTURES.md F10 mixture recipe (the same
corpus builder as scripts/ann_quality_experiment.py):

- **segment count at fixed rows** — segments are the parallel axis
  (each segment graph builds inside one task, reference analogue:
  rayon-parallel insertion within a sealed segment,
  crates/hnsw/src/lib.rs:392-561).  Wall should FALL as segments
  approach core count, then flatten: beyond segments ~= executors the
  per-segment insertion rate is the only remaining lever.  On a real
  cluster the flat region extends with executor count — that is the
  100 TB story this table is evidence for.
- **rows at fixed segments-per-core** — the honest per-row cost curve:
  insertion cost grows ~log(segment_rows) per row (deeper frontier
  expansions on a denser graph), so rows/s decays slowly with segment
  size; wall should grow slightly super-linearly in rows at FIXED
  segment size but stay linear when segment size is held and segment
  count grows with rows.

Run:  python scripts/hnsw_build_scale_experiment.py [base_rows]
One JSON line per cell; results recorded in BENCHNOTES.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import ann_quality_experiment as AQ

    from pgvecto_rs_spark.indexes.hnsw import HNSWIndex
    from pgvecto_rs_spark.session import get_spark

    base = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("hnsw-build-scale", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="pgvrs_hnsw_build_")

    def corpus(n):
        path = os.path.join(work, f"corpus_{n}")
        if not os.path.exists(path):
            AQ.build_corpus(spark, n, path)
        return spark.read.parquet(path)

    def cell(tag, n, segment_rows):
        df = corpus(n)
        path = os.path.join(work, f"idx_{tag}")
        t0 = time.perf_counter()
        idx = HNSWIndex.create(spark, df, path, metric="l2",
                               segment_rows=segment_rows,
                               ef_construction=200)
        wall = time.perf_counter() - t0
        out = {"axis": tag.split(":")[0], "n_rows": n,
               "segment_rows": segment_rows,
               "n_segments": idx.meta["n_segments"],
               "build_sec": round(wall, 1),
               "rows_per_sec": round(n / wall, 0)}
        print("HNSW_BUILD " + json.dumps(out), flush=True)
        shutil.rmtree(path, ignore_errors=True)
        return out

    # axis 1: segment count at fixed rows (parallel-axis evidence)
    for segs in (2, 4, 8, 16, 32, 64):
        cell(f"segments:{segs}", base, -(-base // segs))
    # axis 2: rows at fixed segments ~= cores (per-row cost curve)
    for n in (base // 4, base // 2, base, base * 2):
        cell(f"rows:{n}", n, -(-n // cpus))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
