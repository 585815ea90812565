"""Bucketed table storage: co-located joins and aggregations without
exchanges.

At 100 TB the dominant cost of a key-keyed join or aggregation is the
shuffle.  Spark's bucketed tables (`bucketBy` at write time) pin a
hash-partitioned layout on disk: two tables bucketed by the same key
into the same bucket count join with ZERO Exchange on either side, and
a groupBy on the bucket key aggregates without a shuffle — the layout
IS the shuffle, paid once at ingest instead of per query.

This is the Spark analogue of the reference keeping its index artifacts
partitioned by `list_id` (`indexes/ivf.py` prunes probes to partitions
the same way): organize the storage so queries stop moving data.

Helpers here wrap the (slightly awkward) `saveAsTable` surface so
pipeline code and tests can express the pattern in one call, and
:func:`assert_no_exchange` turns "this plan must not shuffle" into a
checkable contract (used by the tests; useful in CI for plan
regressions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_table", "assert_no_exchange"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str | list[str],
    num_buckets: int = 32,
    sort_col: str | list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) table.

    ``sort_col`` additionally sorts within buckets — joins on the
    bucket+sort key can then run as sort-merge joins with neither an
    Exchange NOR a Sort on either side.
    """
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    w = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *cols)
    if sort_col is not None:
        scols = [sort_col] if isinstance(sort_col, str) else list(sort_col)
        w = w.sortBy(*scols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the
    catalog, so the bucketed layout is visible to the planner)."""
    return spark.table(table)


def assert_no_exchange(df: DataFrame, allow_broadcast: bool = True) -> str:
    """Assert the physical plan moves no data: no shuffle Exchange (and
    optionally no BroadcastExchange).  Returns the plan string so
    callers can embed it in failure messages or goldens."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        ls = line.strip(" +-*(0123456789)")
        if ls.startswith("Exchange") or "ShuffleExchange" in ls:
            if allow_broadcast and "Broadcast" in ls:
                continue
            raise AssertionError(f"plan contains a shuffle exchange:\n{plan}")
        if not allow_broadcast and "BroadcastExchange" in ls:
            raise AssertionError(f"plan contains a broadcast exchange:\n{plan}")
    return plan
