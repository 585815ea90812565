#!/usr/bin/env python
"""Targeted bench: times the named queries with bench.py's exact
protocol (get_spark session, warm-up pass, min-of-5 best-of-repeats,
storage release between queries).  For r14 before/after A/B on
individual queries without paying a full 104-query run.

Usage: python scripts/minibench_r14.py q1 q2 ...
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _release(spark):
    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001
        pass


def main() -> None:
    from pgvecto_rs_spark.session import get_spark
    from pgvecto_rs_spark import queries as Q

    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    spark = get_spark("pgvrs-minibench-r14", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    registry = Q.queries()

    for n in names:  # warm-up pass (builds, codegen) exactly like bench
        registry[n](spark, SF_DIR).limit(1).collect()
        registry[n](spark, SF_DIR).collect()
    _release(spark)

    timings = {}
    for n in names:
        best = float("inf")
        for rep in range(5):
            if rep >= 3 and best >= 1.0:
                break
            if rep >= 2 and best >= 5.0:
                break
            t0 = time.perf_counter()
            registry[n](spark, SF_DIR).collect()
            best = min(best, time.perf_counter() - t0)
        timings[n] = round(best, 4)
        _release(spark)
    print(json.dumps(timings))
    spark.stop()


if __name__ == "__main__":
    main()
