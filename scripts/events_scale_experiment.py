#!/usr/bin/env python
"""Event-analytics scale experiment: N synthetic events (default 10M,
~250x the sf0.1 gate table) through the events operator suite —
sessionization, hourly rollup, funnel, retention, trailing-window
features, exact grouped quantiles.

What it demonstrates (recorded in BENCHNOTES.md):
- sessionization and rolling features are ONE user-keyed shuffle each
  (window functions over (user, time) — no self-joins);
- the hourly rollup is a single partial-aggregated shuffle at
  (hour, type) cardinality;
- funnel/retention work at USER cardinality, never event cardinality;
- exact per-type quantiles sort only within bounded-cardinality groups.

Corpus recipe: deterministic xxhash-driven events over U users and a
30-day window (native expressions, no driver loop).

Run:  python scripts/events_scale_experiment.py [n_events]
Writes one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

N_USERS = 100_000
SPAN_S = 30 * 24 * 3600
TYPES = ["view", "click", "purchase", "scroll", "share"]


def synth_events(spark, n):
    base = spark.range(n).select(F.col("id").alias("event_id"))
    user = F.pmod(F.xxhash64("event_id", F.lit("u")), N_USERS).alias("user_id")
    ts = (
        F.lit(1_700_000_000)
        + F.pmod(F.xxhash64("event_id", F.lit("t")), SPAN_S)
    ).alias("epoch_s")
    etype = F.element_at(
        F.array(*[F.lit(t) for t in TYPES]),
        (F.pmod(F.xxhash64("event_id", F.lit("e")), len(TYPES)) + 1).cast("int"),
    ).alias("event_type")
    value = (
        F.pmod(F.xxhash64("event_id", F.lit("v")), 100_000).cast("double") / 100.0
    ).alias("value")
    return base.select("event_id", user, ts, etype, value)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    from pgvecto_rs_spark.session import get_spark

    spark = get_spark("events-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"n_events": n, "n_users": N_USERS}
    t0 = time.perf_counter()
    ev = (
        synth_events(spark, n)
        .repartition(spark.sparkContext.defaultParallelism)
        .cache()
    )
    out["n_rows"] = ev.count()
    out["gen_s"] = round(time.perf_counter() - t0, 2)

    def timed(name, fn):
        t = time.perf_counter()
        r = fn()
        out[name + "_s"] = round(time.perf_counter() - t, 2)
        return r

    # sessionization: lag over (user, ts) -> 30-min-gap session starts
    def sessions():
        w = Window.partitionBy("user_id").orderBy("epoch_s", "event_id")
        gap = F.col("epoch_s") - F.lag("epoch_s").over(w)
        starts = ev.withColumn(
            "new_sess", (gap.isNull() | (gap > 1800)).cast("long")
        )
        return starts.agg(F.sum("new_sess")).collect()[0][0]

    out["n_sessions"] = timed("sessions", sessions)

    # hourly rollup: one partial-agg shuffle at (hour, type) cardinality
    def hourly():
        return (
            ev.groupBy(
                (F.col("epoch_s") / 3600).cast("long").alias("hour"), "event_type"
            )
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
            .count()
        )

    out["n_hourly_cells"] = timed("hourly", hourly)

    # funnel at user cardinality: first view -> first later click ->
    # first later purchase within 3 days
    def funnel():
        def firsts(t):
            return (
                ev.where(F.col("event_type") == t)
                .groupBy("user_id")
                .agg(F.min("epoch_s").alias(f"t_{t}"))
            )

        v, c, p = firsts("view"), firsts("click"), firsts("purchase")
        j = (
            v.join(c, "user_id", "left")
            .join(p, "user_id", "left")
            .agg(
                F.count(F.lit(1)).alias("step1"),
                F.sum(
                    (
                        (F.col("t_click") > F.col("t_view"))
                        & (F.col("t_click") <= F.col("t_view") + 259200)
                    ).cast("long")
                ).alias("step2"),
            )
            .collect()[0]
        )
        return int(j["step2"] or 0)

    out["funnel_step2_users"] = timed("funnel", funnel)

    # trailing-7-day per-user rolling sum (RANGE window over epoch days)
    def rolling():
        day = (F.col("epoch_s") / 86400).cast("long")
        per_day = ev.groupBy("user_id", day.alias("day")).agg(
            F.sum("value").alias("v")
        )
        w = Window.partitionBy("user_id").orderBy("day").rangeBetween(-6, 0)
        return per_day.select(F.sum("v").over(w).alias("r")).count()

    out["n_rolling_rows"] = timed("rolling", rolling)

    # exact grouped quantiles on micro-scaled ints
    def quantiles():
        vu = F.floor(F.col("value") * 1000000.0 + 0.5).cast("long")
        return (
            ev.select("event_type", vu.alias("v"))
            .groupBy("event_type")
            .agg(F.expr("percentile(v, array(0.5, 0.9, 0.99))"))
            .count()
        )

    out["n_quantile_groups"] = timed("quantiles", quantiles)

    print("EVENTS_SCALE_RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
