"""SparkSession factory with the engine's recommended configs."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "pgvecto_rs_spark", cpus: int | None = None) -> SparkSession:
    """Local-mode session tuned for this engine.

    On a real cluster, only the sql.* configs matter; master/memory come
    from the deployment.

    Speculative execution (r12 straggler post-mortem): the one observed
    4x-slow segment build was a transient HOST artifact, and the ops
    answer at cluster scale is ``spark.speculation=true`` so a re-launch
    on a healthy executor bounds the stage wall.  It is OFF here by
    default because in local[n] every "re-launch" lands on the same
    machine — it cannot dodge a host-level transient, and it would
    double CPU on legitimately heavy one-task-per-segment index builds
    (hnsw.py _per_segment_apply).  Set SPARK_GRAFT_SPECULATION=true (or
    the conf directly in your deployment) on real clusters.
    """
    n = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    speculation = os.environ.get("SPARK_GRAFT_SPECULATION", "false")
    return (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.speculation", speculation)
        .config("spark.speculation.multiplier", "3")
        .config("spark.speculation.quantile", "0.9")
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
