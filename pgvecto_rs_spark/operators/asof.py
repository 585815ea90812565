"""As-of (temporal) join — each left row picks the most recent right row.

Spark has no native ASOF JOIN.  The naive encoding (a non-equi theta
join ``l.key = r.key AND r.ts <= l.ts`` + max-aggregation) degrades to
a per-key cross product — quadratic in events-per-key, hopeless at
100 TB.  This operator uses the union+window formulation instead:

1. tag left rows and right rows, union them into one relation;
2. one window over (key) ordered by (ts, tag): ``last(value,
   ignorenulls)`` over UNBOUNDED PRECEDING..CURRENT ROW carries the
   latest right-side value forward onto every left row;
3. keep the left rows.

Cost: ONE shuffle on the join keys + one sort — the same plan shape as
any windowed aggregation, linear in input size, skew-bounded by the
largest single key (same bound any per-key ordering has).  Strictness
(`right.ts < left.ts` vs ``<=``) is encoded purely in the tag's sort
position at equal timestamps, so both variants cost the same.

Reference analogue: none (pgvecto.rs is a vector engine); this is the
standard event-stream enrichment operator (feature lookup "as of" an
observation time) of training-data and timeseries pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    strict: bool = True,
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the right row with
    the greatest ``ts_col`` < left.ts (``strict=True``) or <= left.ts
    (``strict=False``) sharing the same ``on`` key(s); NULLs when no
    right row qualifies.

    ``value_cols`` defaults to every right column that is neither a key
    nor the timestamp.  Value column names must not collide with left
    column names (rename on the right side first).  If several right
    rows share one timestamp, the carried values come from one of them
    (ties are only observable when their value_cols differ — pre-reduce
    the right side per (key, ts) if that matters).
    """
    keys = [on] if isinstance(on, str) else list(on)
    vcols = value_cols or [c for c in right.columns if c not in {*keys, ts_col}]
    clash = set(vcols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")
    lcols = [c for c in left.columns if c not in {*keys, ts_col}]

    # at equal ts the right row must sort AFTER the left row to be
    # invisible (strict) or BEFORE it to be visible (inclusive)
    ltag, rtag = (0, 1) if strict else (1, 0)

    lhs = left.select(
        *keys,
        F.col(ts_col).alias("__ats"),
        F.lit(ltag).alias("__tag"),
        F.lit(True).alias("__is_left"),
        *[F.col(c) for c in lcols],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}")
            for c in vcols
        ],
    )
    rhs = right.select(
        *keys,
        F.col(ts_col).alias("__ats"),
        F.lit(rtag).alias("__tag"),
        F.lit(False).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__v_{c}") for c in vcols],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ats", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        "*",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in vcols
        ],
    )
    return carried.where(F.col("__is_left")).select(
        *keys,
        F.col("__ats").alias(ts_col),
        *[F.col(c) for c in lcols],
        *[F.col(f"__m_{c}").alias(c) for c in vcols],
    )
