"""Vector aggregates: sum/avg over dense and sparse vector columns.

Reference: src/datatype/aggregate_vecf32.rs:6-146 (dense sum/avg with
partial + combine functions — Spark's map-side partial aggregation is
the built-in analogue of sfunc/combinefunc) and
src/datatype/aggregate_svecf32.rs:6-120 (sparse merge accumulate) with
the svector.slt:22-80 semantics:

- NULL vectors are skipped;
- a group with no non-NULL vectors aggregates to NULL;
- dims must match within a group (error otherwise);
- sparse results drop entries that became exactly zero
  (``avg({0:1,1:2,2:3}, {0:-1,1:2,2:-3}) = {1:2}/3``).

Shape: these are DataFrame-level operators (df, group_cols) -> df
because Spark Python cannot define a native UDAF; the plan is
posexplode -> partial-aggregated groupBy -> array reassembly, which is
exactly the distributed partial/final split the reference implements by
hand.  Shuffle carries (group, dim) partial sums — map-side combine
keeps it at one row per (group × dims) regardless of input rows.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["avg_svector", "avg_vector", "sum_svector", "sum_vector"]


def _grouped_vector(df, group_cols, vector_col, avg):
    gc = list(group_cols)
    base = df.select(*gc, F.col(vector_col).alias("__v"))
    # ONE aggregate over all rows: count()/count_distinct() skip NULLs
    # natively, so every group (including all-NULL ones) gets a row here
    # and the old separate distinct + left join — two extra exchanges
    # per query — is folded away (r14)
    counts = base.groupBy(*gc).agg(
        F.count(F.col("__v")).alias("__n"),
        F.count_distinct(F.size("__v")).alias("__ndims"),
    )
    per_dim = (
        base.where(F.col("__v").isNotNull())
        .select(*gc, F.posexplode("__v").alias("__pos", "__x"))
        .groupBy(*gc, "__pos")
        .agg(F.sum(F.col("__x").cast("double")).alias("__s"))
    )
    packed = per_dim.groupBy(*gc).agg(
        F.array_sort(F.collect_list(F.struct("__pos", "__s"))).alias("__pairs")
    )
    joined = counts.join(packed, gc, "left")
    val = F.transform(
        F.col("__pairs"),
        lambda p: (p["__s"] / F.col("__n") if avg else p["__s"]).cast("float"),
    )
    # dims mismatch within a group errors (check_matched_dims analogue);
    # an all-NULL group has __ndims = 0 and a NULL __pairs, so the first
    # branch yields the NULL aggregate directly
    result = F.when(
        F.col("__ndims") <= 1, val
    ).otherwise(F.raise_error(F.lit("sum(vector): differently-dimensioned vectors in group")))
    return joined.select(*gc, result.alias("__agg"))


def sum_vector(df: DataFrame, group_cols: Sequence[str], vector_col: str, alias: str = "sum_vec") -> DataFrame:
    """Elementwise sum per group (finalize.sql:662-668)."""
    return _grouped_vector(df, group_cols, vector_col, avg=False).withColumnRenamed("__agg", alias)


def avg_vector(df: DataFrame, group_cols: Sequence[str], vector_col: str, alias: str = "avg_vec") -> DataFrame:
    """Elementwise avg = sum/count of non-NULL vectors (finalize.sql:654-660)."""
    return _grouped_vector(df, group_cols, vector_col, avg=True).withColumnRenamed("__agg", alias)


def _grouped_svector(df, group_cols, svec_col, avg):
    gc = list(group_cols)
    base = df.select(*gc, F.col(svec_col).alias("__v"))
    nn = base.where(F.col("__v").isNotNull())
    # ONE aggregate over all rows (NULL-skipping natively) — see
    # _grouped_vector: folds the old distinct + left join away (r14)
    counts = base.groupBy(*gc).agg(
        F.count(F.col("__v")).alias("__n"),
        F.count_distinct(F.col("__v")["dims"]).alias("__ndims"),
        F.first(F.col("__v")["dims"], ignorenulls=True).alias("__dims"),
    )
    entries = nn.select(
        *gc,
        F.explode(F.arrays_zip(F.col("__v")["indexes"], F.col("__v")["values"])).alias("__e"),
    ).select(*gc, F.col("__e.indexes").alias("__i"), F.col("__e.values").alias("__x"))
    per_idx = entries.groupBy(*gc, "__i").agg(F.sum(F.col("__x").cast("double")).alias("__s"))
    packed = per_idx.groupBy(*gc).agg(
        F.array_sort(F.collect_list(F.struct("__i", "__s"))).alias("__pairs")
    )
    joined = counts.join(packed, gc, "left")
    scaled = F.transform(
        F.col("__pairs"),
        lambda p: F.struct(
            p["__i"].alias("i"),
            (p["__s"] / F.col("__n") if avg else p["__s"]).cast("float").alias("v"),
        ),
    )
    # zero-cancellation: entries summing (or rounding in f32) to exactly
    # zero are dropped (aggregate_svecf32.rs finalize; svector.slt:66-68)
    kept = F.filter(scaled, lambda p: p["v"] != 0.0)
    sv = F.struct(
        F.col("__dims").cast("int").alias("dims"),
        F.transform(kept, lambda p: p["i"]).cast("array<int>").alias("indexes"),
        F.transform(kept, lambda p: p["v"]).alias("values"),
    )
    # an all-NULL group has __ndims = 0: return a NULL aggregate (the
    # old shape realized this via the left-join miss), never the struct
    result = (
        F.when(F.col("__ndims") == 0, F.lit(None))
        .when(F.col("__ndims") == 1, sv)
        .otherwise(
            F.raise_error(F.lit("sum(svector): differently-dimensioned vectors in group"))
        )
    )
    return joined.select(*gc, result.alias("__agg"))


def sum_svector(df: DataFrame, group_cols: Sequence[str], svec_col: str, alias: str = "sum_svec") -> DataFrame:
    """Sparse elementwise sum per group (finalize.sql:670-676,
    aggregate_svecf32.rs merge semantics)."""
    return _grouped_svector(df, group_cols, svec_col, avg=False).withColumnRenamed("__agg", alias)


def avg_svector(df: DataFrame, group_cols: Sequence[str], svec_col: str, alias: str = "avg_svec") -> DataFrame:
    """Sparse elementwise avg (finalize.sql:678-684; svector.slt:62-80
    incl. the exact zero-cancellation case)."""
    return _grouped_svector(df, group_cols, svec_col, avg=True).withColumnRenamed("__agg", alias)
