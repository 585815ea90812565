"""SparkSession factory with the engine's recommended configs."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "pgvecto_rs_spark", cpus: int | None = None) -> SparkSession:
    """Local-mode session tuned for this engine.

    On a real cluster, only the sql.* configs matter; master/memory come
    from the deployment.
    """
    n = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    return (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
