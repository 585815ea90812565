#!/usr/bin/env python
"""r14 optimization-round profiler (guide §1: measure first).

For every bench query: warm it, then time one steady-state run while
recording how many Spark jobs/stages it launches and how much executor
task time those stages consumed (UI REST API).  wall - tasktime/cores
approximates the dispatch/driver-bound share.  Also dumps
.explain('formatted') for every query to plans/r14/<q>_before.txt
(or _after.txt with --after).

Usage: python scripts/profile_r14.py [--after] [--sf DIR] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _release(spark):
    """bench.py's _release_storage: drop localCheckpoint debris between
    timings (in local mode driver==executor, so accumulated blocks GC-
    thrash the whole JVM and uniformly inflate later queries)."""
    import gc

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001
        pass


def _rest(spark, path):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}", timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    after = "--after" in sys.argv
    plans_only = "--plans-only" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    suffix = "after" if after else "before"

    from pyspark.sql import SparkSession
    from pgvecto_rs_spark import queries as Q

    # Same confs as session.get_spark, but with the UI ON so the REST
    # API can report per-stage task time (get_spark disables it).
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("pgvrs-profile-r14")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedJobs", "5000")
        .config("spark.ui.retainedStages", "5000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = Q.queries()
    names = args or list(registry)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plandir = os.path.join(here, "plans", "r14")
    os.makedirs(plandir, exist_ok=True)

    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    results = {}
    for n in names:
        fn = registry.get(n)
        if fn is None:
            print(f"skip {n} (not registered)", flush=True)
            continue
        spark.sparkContext.setJobDescription(f"profile:{n}")
        try:
            df = fn(spark, SF_DIR)  # may build index (warm-up)
            with open(os.path.join(plandir, f"{n}_{suffix}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(mode))
            if plans_only:
                print(f"{n}: plan written", flush=True)
                continue
            df.collect()            # warm: codegen, caches
            _release(spark)
            # Timed region matches bench.py exactly: fn() + collect()
            # (several queries do eager driver-coordinated work inside
            # fn() — checkpoints, iterative fits — that bench times).
            # min-of-3 like bench's min-of-repeats; job attribution from
            # the LAST (steady-state) repeat.
            wall = float("inf")
            for _ in range(3):
                before_jobs = {j["jobId"] for j in _rest(spark, "jobs")}
                t0 = time.perf_counter()
                fn(spark, SF_DIR).collect()
                wall = min(wall, time.perf_counter() - t0)
                _release(spark)
            jobs = [j for j in _rest(spark, "jobs") if j["jobId"] not in before_jobs]
            stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
            task_ms = 0
            ntasks = 0
            nstages = 0
            for sid in stage_ids:
                try:
                    for att in _rest(spark, f"stages/{sid}"):
                        if att.get("status") == "SKIPPED":
                            continue
                        task_ms += att.get("executorRunTime", 0)
                        ntasks += att.get("numCompleteTasks", 0)
                        nstages += 1
                except Exception:
                    pass
            results[n] = {
                "wall_s": round(wall, 4),
                "n_jobs": len(jobs),
                "n_stages": nstages,
                "n_tasks": ntasks,
                "task_time_s": round(task_ms / 1000.0, 3),
                "par_wall_s": round(task_ms / 1000.0 / CPUS, 4),
            }
            print(f"{n}: wall={wall:.3f}s jobs={len(jobs)} stages={nstages} "
                  f"tasks={ntasks} tasktime={task_ms/1000:.2f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            results[n] = {"err": f"{type(e).__name__}: {str(e)[:200]}"}
            print(f"{n}: ERR {e}", flush=True)
        spark.sparkContext.setJobDescription(None)

    out = os.path.join(here, "plans", "r14", f"_profile_{suffix}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
