"""Driver contract for the spark-graft builder (PySpark target).

Thin wiring over :mod:`pgvecto_rs_spark.queries`, which holds the
(spark_callable, oracle_sql) registry for every implemented operator
from SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pgvecto_rs_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query."""
    return _q.oracle_sql()
