"""Event-stream-shaped queries with batch semantics: rollups,
sessionization, funnel/retention, rolling windows, quantiles, as-of."""

from __future__ import annotations

import math
import os
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgvecto_rs_spark.functions import binary as VB
from pgvecto_rs_spark.functions import dense as VD
from pgvecto_rs_spark.functions import sparse as VS
from pgvecto_rs_spark.operators import asof as OA
from pgvecto_rs_spark.operators import clustering as CL
from pgvecto_rs_spark.operators import curation as CU
from pgvecto_rs_spark.operators import dedup as DD
from pgvecto_rs_spark.operators import retrieval as RT
from pgvecto_rs_spark.operators import search as SR
from pgvecto_rs_spark.operators import textanalysis as TA

from pgvecto_rs_spark.queries._core import (  # noqa: F401
    DIMS,
    Q64,
    Q64_SQL,
    SPARSE_THRESHOLD,
    RANGE_RADIUS,
    STOPWORDS_SQL,
    QueryFn,
    register,
    _REGISTRY,
    _q_col,
    _tune,
    _emb,
    _docs,
    _events,
    _r4,
    _r4t,
    _scaled_sum,
    _SQL_L2,
    _SQL_DOT,
    _SQL_NORMSQ_E,
    _Q_NORM,
    _tmp_index_dir,
    _open_cached,
)




# ---------------------------------------------------------------------------
# 10. events: hourly rollup (streaming-shaped agg, batch semantics)
# ---------------------------------------------------------------------------

@register(
    "events_hourly",
    """
    SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour_bucket, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_u
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events(spark, sf_dir)
    # ts is int64 nanoseconds; integer `div` keeps the bucketing exact
    # (double division would lose precision above 2^53).  value sums are
    # micro-scaled integers (tie-free; see _scaled_sum).
    return df.groupBy(
        F.expr("ts div 3600000000000").cast("long").alias("hour_bucket"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        _scaled_sum(F.col("value"), 1000000.0).alias("sum_value_u"),
    )


@register(
    "events_quantiles",
    """
    SELECT event_type, COUNT(*) AS n,
           quantile_cont(v, 0.5) AS p50,
           quantile_cont(v, 0.9) AS p90,
           quantile_cont(v, 0.99) AS p99
    FROM (SELECT event_type, CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS v
          FROM events)
    GROUP BY event_type
    """,
)
def events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type value quantiles (p50/p90/p99) over micro-scaled
    integers.  Spark's `percentile` and DuckDB's `quantile_cont` share
    the (n-1)·q linear-interpolation definition, and on integer inputs
    the interpolation arithmetic is bit-identical (verified — including
    the float artifacts of 0.9·k).  Exact percentile sorts per group —
    right for bounded-cardinality groups like these; an unbounded-
    cardinality rollup would use approx_percentile (t-digest) instead,
    which no ANSI oracle can mirror."""
    ev = _events(spark, sf_dir)
    vu = F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return (
        ev.select("event_type", vu.alias("v"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("percentile(v, 0.5)").alias("p50"),
            F.expr("percentile(v, 0.9)").alias("p90"),
            F.expr("percentile(v, 0.99)").alias("p99"),
        )
    )





# ---------------------------------------------------------------------------
# 17. sessionization (streaming-shaped; windowed gap analysis)
# ---------------------------------------------------------------------------

@register(
    "events_sessions",
    """
    SELECT user_id, COUNT(*) AS n_sessions FROM (
      SELECT user_id,
             CASE WHEN prev_ts IS NULL OR ts - prev_ts > 1800000000000 THEN 1 ELSE 0 END AS new_s
      FROM (
        SELECT user_id, epoch_ns(ts) AS ts,
               LAG(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS prev_ts
        FROM events
      )
    ) WHERE new_s = 1 GROUP BY user_id
    """,
)
def events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessions per user with a 30-minute inactivity gap — lag + count
    of session starts; ts is int64 nanoseconds."""
    df = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    starts = df.withColumn("prev_ts", F.lag("ts").over(w)).where(
        F.col("prev_ts").isNull() | (F.col("ts") - F.col("prev_ts") > 1_800_000_000_000)
    )
    return starts.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_sessions"))


@register(
    "events_props_json",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           FLOOR(CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
                 / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS avg_k
    FROM events GROUP BY event_type
    """,
)
def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON props column: extract + aggregate.  Integer sums
    are exact on both engines; the average uses the tie-free _r4t formula
    (ROUND(double) is not engine-portable near decimal ties)."""
    df = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        _r4t(F.sum(k).cast("double") / F.count(F.lit(1))).alias("avg_k"),
    )


@register(
    "events_funnel",
    """
    WITH s1 AS (
      SELECT user_id, MIN(epoch_ns(ts)) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND epoch_ns(e.ts) > s1.t AND epoch_ns(e.ts) <= s1.t + 259200000000000
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(epoch_ns(e.ts)) AS t
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > s2.t AND epoch_ns(e.ts) <= s2.t + 259200000000000
      GROUP BY e.user_id
    )
    SELECT 'view' AS step, COUNT(*) AS n_users FROM s1
    UNION ALL SELECT 'click', COUNT(*) FROM s2
    UNION ALL SELECT 'purchase', COUNT(*) FROM s3
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (view -> click -> purchase): per step,
    how many users completed the sequence IN ORDER within a 3-day
    conversion window per step (each step strictly after the user's earliest qualifying previous step).

    Shape: three user_id-keyed min-aggregations, each joined to the
    previous step's (tiny) per-user frontier — the joins are
    user-cardinality, never event-cardinality, and every aggregation
    partially combines map-side."""
    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts")
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + F.lit(259200000000000)))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + F.lit(259200000000000)))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("view").alias("step"), "n_users")
        .unionByName(
            s2.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("click").alias("step"), "n_users")
        )
        .unionByName(
            s3.agg(F.count(F.lit(1)).alias("n_users")).select(F.lit("purchase").alias("step"), "n_users")
        )
    )


@register(
    "events_retention",
    """
    WITH firsts AS (
      SELECT user_id, MIN(CAST(FLOOR(epoch(ts) / 86400) AS BIGINT)) AS cohort_d
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_d,
             CAST(FLOOR(epoch(e.ts) / 86400) AS BIGINT) - f.cohort_d AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_d, day_offset, COUNT(*) AS n_users
    FROM activity GROUP BY 1, 2
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily retention cohorts: users grouped by the day of their
    first event; n_users active at each day offset since.  The firsts
    table is user-cardinality (joined back broadcast-small), activity
    dedups (user, week) before the final count — the standard cohort
    matrix at one shuffle per aggregation."""
    ev = _events(spark, sf_dir).select("user_id", "ts")
    day = F.expr("ts div 86400000000000").cast("long")
    firsts = ev.groupBy("user_id").agg(F.min(day).alias("cohort_d"))
    activity = (
        ev.join(firsts, "user_id")
        .select("user_id", "cohort_d", (day - F.col("cohort_d")).alias("day_offset"))
        .distinct()
    )
    return activity.groupBy("cohort_d", "day_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@register(
    "events_rolling",
    """
    WITH daily AS (
      SELECT user_id, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day,
             COUNT(*) AS n,
             CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS v_u
      FROM events
      GROUP BY 1, 2
    )
    SELECT user_id, day, n, v_u,
           CAST(SUM(n) OVER w AS BIGINT) AS roll_n,
           CAST(SUM(v_u) OVER w AS BIGINT) AS roll_v_u
    FROM daily
    WINDOW w AS (PARTITION BY user_id ORDER BY day
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def events_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day rolling aggregates per user: daily event count and
    micro-scaled value sum, plus their 7-day RANGE-window sums — the
    standard feature-engineering rollup.  One (user, day) aggregation
    (map-side partial) then one user-keyed range window; all sums are
    exact integers."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    day = F.expr("ts div 86400000000000").cast("long")
    daily = ev.groupBy(F.col("user_id"), day.alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        _scaled_sum(F.col("value"), 1000000.0).alias("v_u"),
    )
    w = Window.partitionBy("user_id").orderBy("day").rangeBetween(-6, 0)
    return daily.select(
        "user_id",
        "day",
        "n",
        "v_u",
        F.sum("n").over(w).alias("roll_n"),
        F.sum("v_u").over(w).alias("roll_v_u"),
    )


@register(
    "events_asof",
    """
    SELECT p.event_id, p.user_id, epoch_ns(p.ts) AS ts,
           COALESCE(MAX(epoch_ns(c.ts)), CAST(-1 AS BIGINT)) AS last_click_ts,
           COALESCE(epoch_ns(p.ts) - MAX(epoch_ns(c.ts)), CAST(-1 AS BIGINT)) AS gap_ns
    FROM events p
    LEFT JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts < p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id, p.ts
    """,
)
def events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every purchase annotated with the user's most recent
    strictly-prior click (-1 when none) and the gap in nanoseconds —
    the event-enrichment / feature-as-of-time operator.

    The Spark plan is operators/asof.py's union+window formulation (one
    user-keyed shuffle + sort, linear); the oracle spells the same
    semantics as the naive non-equi join + MAX aggregation, which is
    what the operator exists to avoid at scale."""
    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("click_ts")
    )
    out = OA.asof_join(
        purchases, clicks, on="user_id", ts_col="ts",
        value_cols=["click_ts"], strict=True,
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        # -1 = no prior click: NULL-free BIGINT output columns survive
        # the driver's pandas round-trip (nullable int64 -> float64
        # would hash-mismatch, e.g. 105820000.0 vs 105820000).
        F.coalesce(F.col("click_ts"), F.lit(-1).cast("long")).alias("last_click_ts"),
        F.coalesce(F.col("ts") - F.col("click_ts"), F.lit(-1).cast("long")).alias("gap_ns"),
    )
