#!/usr/bin/env python
"""sf1 scaling experiment (r9 advice item 2): run the 10 most expensive
bench queries at sf0.1 (driver data) and sf1 (10x, built by
scripts/make_scale_data.py — distribution-identical key-shifted copies)
and record the scaling exponent of each.

The "100 TB shape" claims say these pipelines are near-linear in data;
this measures it.  A 10x data step on local[32] is expected to cost
slightly MORE than 10x wall for queries that were dispatch/stage-
constant-bound at sf0.1 (the constant amortizes, so ratio < 10 is also
fine) and slightly more for shuffle-bound ones; anything well beyond
~12x indicates a super-linear term that would sink a 1000-executor run.

Protocol: warm-up pass per sf (codegen/JIT + page cache), then
best-of-2 timed runs of DataFrame-construction + collect, matching
bench.py's measurement.

Run:  python scripts/sf1_scale_experiment.py [query ...]
Writes one JSON line; results recorded in BENCHNOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "doc_dedup_keep",
    "mm_video_idr_neardup",
    "doc_simhash_pairs",
    "mm_image_neardup",
    "mm_audio_neardup",
    "doc_minhash_pairs",
    "emb_semdedup",
    "mm_mp4_idr",
    "tpch_q8",
    "tpch_q20",
]


def main() -> None:
    from pgvecto_rs_spark.queries import _core as C
    from pgvecto_rs_spark.session import get_spark

    names = sys.argv[1:] or QUERIES
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR",
                         os.path.join(REPO, ".scale", "sf1"))
    if not os.path.isdir(sf1):
        sys.exit(f"sf1 dir {sf1} missing — run scripts/make_scale_data.py")
    spark = get_spark("sf1-scale",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    registry = {k: v[0] for k, v in C._REGISTRY.items()}

    def run(name: str, sf_dir: str) -> tuple[float, int]:
        fn = registry[name]
        nrows = fn(spark, sf_dir).count()  # warm: codegen + page cache
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        return best, nrows

    out = {}
    for name in names:
        t_small, n_small = run(name, sf01)
        t_big, n_big = run(name, sf1)
        ratio = t_big / t_small
        out[name] = {
            "sf0.1_sec": round(t_small, 2),
            "sf1_sec": round(t_big, 2),
            "ratio": round(ratio, 2),
            "rows_out": [n_small, n_big],
        }
        print(f"  {name}: {t_small:.2f}s -> {t_big:.2f}s  "
              f"ratio {ratio:.1f}x  rows {n_small}->{n_big}", flush=True)
    worst = max(out, key=lambda n: out[n]["ratio"])
    print("SF1_SCALE_RESULT " + json.dumps(
        {"queries": out, "worst": worst,
         "worst_ratio": out[worst]["ratio"]}))
    spark.stop()


if __name__ == "__main__":
    main()
