"""Dense-vector kernels as native Spark Column expressions.

Parity targets (reference, Rust):
- distances:  crates/base/src/vector/vect.rs:108-147
  (``operator_dot`` :113-116, ``operator_l2`` :118-121 — squared L2,
  NOT rooted; ``operator_cos`` :123-129; ``norm`` :108-111;
  ``normalize`` :141-147)
- arithmetic: vect.rs:149-171 via src/datatype/operators_vecf32.rs:6-59
  (dim mismatch errors through ``check_matched_dims``,
  operators_vecf32.rs:8)
- slicing:    vect.rs:173-182 + src/datatype/subscript_vecf32.rs
  (0-based [start, end); NULL on out-of-range / empty / negative /
  NULL bounds — tests/sqllogictest/vector_subscript.slt)
- f16 grid:   crates/base/src/scalar/f16.rs — the reference computes
  f16 kernels by converting to f32; we mirror with ``to_f16_grid``.

Everything here is a pure Column expression built from
``zip_with``/``aggregate``/``transform``/``slice`` — evaluated inside
whole-stage codegen on the JVM, vectorizable by Catalyst, and usable in
filters that Parquet scans can prune around.  Accumulation is done in
DOUBLE left-to-right, which also makes results bit-reproducible against
the DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "vecf16_lt",
    "vecf16_le",
    "vecf16_gt",
    "vecf16_ge",
    "cosine_distance",
    "dot_product",
    "l2sq_distance",
    "neg_dot_product",
    "to_f16_grid",
    "vector_add",
    "vector_dims",
    "vector_eq",
    "vector_mul",
    "vector_norm",
    "vector_normalize",
    "vector_slice",
    "vector_sub",
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _dbl(c: Column | str) -> Column:
    """Cast array<float> -> array<double> so accumulation is in f64."""
    return _col(c).cast("array<double>")


def _checked(a: Column, b: Column, result: Column) -> Column:
    """Dim-mismatch -> runtime error, mirroring ``check_matched_dims``
    (src/datatype/operators_vecf32.rs:8)."""
    return F.when(
        F.size(a) == F.size(b), result
    ).otherwise(
        F.raise_error(
            F.format_string(
                "differently-dimensioned vectors: %d and %d", F.size(a), F.size(b)
            )
        )
    )


def _sum(arr: Column) -> Column:
    """Left-to-right double summation of an array<double>."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


# ---------------------------------------------------------------------------
# distances (operators `<->`, `<#>`, `<=>` — src/sql/finalize.sql:408-470)
# ---------------------------------------------------------------------------

def l2sq_distance(a: Column | str, b: Column | str, check: bool = True) -> Column:
    """``a <-> b``: squared L2 distance Σ(x−y)² (vect.rs:118-121 — the
    reference does NOT take the square root)."""
    a, b = _col(a), _col(b)
    d = _sum(F.zip_with(_dbl(a), _dbl(b), lambda x, y: (x - y) * (x - y)))
    return _checked(a, b, d) if check else d


def dot_product(a: Column | str, b: Column | str, check: bool = True) -> Column:
    """Σ x·y (building block; the SQL operator is the negative form)."""
    a, b = _col(a), _col(b)
    d = _sum(F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y))
    return _checked(a, b, d) if check else d


def neg_dot_product(a: Column | str, b: Column | str, check: bool = True) -> Column:
    """``a <#> b``: negative dot product −Σ x·y (vect.rs:113-116)."""
    return -dot_product(a, b, check=check)


def cosine_distance(a: Column | str, b: Column | str, check: bool = True) -> Column:
    """``a <=> b``: 1 − Σxy / √(Σx²·Σy²) (vect.rs:123-129).

    Computed in one pass over the pair with a struct accumulator."""
    a, b = _col(a), _col(b)
    pairs = F.zip_with(_dbl(a), _dbl(b), lambda x, y: F.struct(x.alias("x"), y.alias("y")))
    zero = F.struct(
        F.lit(0.0).alias("xy"), F.lit(0.0).alias("xx"), F.lit(0.0).alias("yy")
    )
    acc = F.aggregate(
        pairs,
        zero,
        lambda s, p: F.struct(
            (s["xy"] + p["x"] * p["y"]).alias("xy"),
            (s["xx"] + p["x"] * p["x"]).alias("xx"),
            (s["yy"] + p["y"] * p["y"]).alias("yy"),
        ),
        lambda s: F.lit(1.0) - s["xy"] / F.sqrt(s["xx"] * s["yy"]),
    )
    return _checked(a, b, acc) if check else acc


# ---------------------------------------------------------------------------
# scalar functions (src/sql/finalize.sql:601-632)
# ---------------------------------------------------------------------------

def vector_dims(v: Column | str) -> Column:
    """``vector_dims(v)`` (src/datatype/functions_vecf32.rs:5-9)."""
    return F.size(_col(v))


def vector_norm(v: Column | str) -> Column:
    """``vector_norm(v)``: L2 norm √Σx² (vect.rs:108-111)."""
    return F.sqrt(_sum(F.transform(_dbl(v), lambda x: x * x)))


def vector_normalize(v: Column | str) -> Column:
    """``vector_normalize(v)``: v / ‖v‖ (vect.rs:141-147).

    Stays float32 like the reference output type."""
    v = _col(v)
    n = vector_norm(v)
    return F.transform(_dbl(v), lambda x: (x / n)).cast("array<float>")


def vector_add(a: Column | str, b: Column | str, check: bool = True) -> Column:
    """``a + b`` elementwise (vect.rs:149-151); dims must match."""
    a, b = _col(a), _col(b)
    r = F.zip_with(a, b, lambda x, y: x + y)
    return _checked(a, b, r) if check else r


def vector_sub(a: Column | str, b: Column | str, check: bool = True) -> Column:
    """``a - b`` elementwise (vect.rs:153-159)."""
    a, b = _col(a), _col(b)
    r = F.zip_with(a, b, lambda x, y: x - y)
    return _checked(a, b, r) if check else r


def vector_mul(a: Column | str, b: Column | str, check: bool = True) -> Column:
    """``a * b`` elementwise (vect.rs:161-167)."""
    a, b = _col(a), _col(b)
    r = F.zip_with(a, b, lambda x, y: x * y)
    return _checked(a, b, r) if check else r


def vector_eq(a: Column | str, b: Column | str) -> Column:
    """``a = b``: dims equal and all elements equal (vect.rs:185-198)."""
    a, b = _col(a), _col(b)
    return (F.size(a) == F.size(b)) & (a == b)


def _lex_cmp(a: Column, b: Column) -> Column:
    """-1/0/1 lexicographic comparison (elementwise first difference).

    Differently-dimensioned operands ERROR, matching the SQL comparison
    operators' check_matched_dims (src/datatype/operators_vecf32.rs:37-44)
    — the in-memory PartialOrd (vect.rs) returns None on mismatch but the
    SQL surface rejects it, and the SQL surface is what this mirrors."""
    # r13: one aggregate() pass with a sticky accumulator (same cure as
    # _sv_cmp/_bvec_cmp — the filter + multi-referenced try_element_at
    # form re-ran the zip/filter per reference, HOFs being interpreted
    # without subexpression reuse).  First element where exactly one of
    # </> holds == first element where x != y under Spark's total order.
    cmp = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.struct(x.alias("x"), y.alias("y"))),
        F.lit(0),
        lambda acc, p: F.when(acc != 0, acc)
        .when(p["x"] < p["y"], F.lit(-1))
        .when(p["x"] > p["y"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    return _checked(a, b, cmp)


def vector_lt(a: Column | str, b: Column | str) -> Column:
    """``a < b`` lexicographic (finalize.sql:248-406)."""
    return _lex_cmp(_col(a), _col(b)) < 0


def vector_le(a: Column | str, b: Column | str) -> Column:
    return _lex_cmp(_col(a), _col(b)) <= 0


def vector_gt(a: Column | str, b: Column | str) -> Column:
    return _lex_cmp(_col(a), _col(b)) > 0


def vector_ge(a: Column | str, b: Column | str) -> Column:
    return _lex_cmp(_col(a), _col(b)) >= 0


def vector_slice(v: Column | str, start: Column | int | None, end: Column | int | None) -> Column:
    """``v[start:end]`` — 0-based, end-exclusive slice fetch
    (src/datatype/subscript_vecf32.rs, vect.rs:173-182).

    Returns NULL when: either provided bound is NULL or negative, the
    range is out of the vector's bounds, or the slice is empty — exactly
    the sqllogictest behavior (vector_subscript.slt:29-80).
    """
    v = _col(v)
    lo = F.lit(0) if start is None else (F.lit(start) if isinstance(start, int) else start)
    hi = F.size(v) if end is None else (F.lit(end) if isinstance(end, int) else end)
    valid = (
        lo.isNotNull()
        & hi.isNotNull()
        & (lo >= 0)
        & (hi >= 0)
        & (lo < hi)
        & (hi <= F.size(v))
    )
    # Spark's F.slice is 1-based with a length argument.
    return F.when(valid, F.slice(v, lo + 1, hi - lo))


def to_f16_grid(v: Column | str) -> Column:
    """Round each f32 element to the nearest IEEE binary16 value, keeping
    f32 storage — the ``vecf16`` fidelity model (the reference stores f16
    and computes via f32: crates/base/src/scalar/f16.rs).

    Spark has no f16 column type, so the grid snap runs as an
    Arrow-batched pandas UDF over numpy's exact IEEE float16 conversion
    (round-to-nearest-even, subnormals, ±inf saturation all correct).
    This is a store-time operation, not a hot-path kernel.
    """
    @F.pandas_udf("array<float>")
    def _f16_grid(s: pd.Series) -> pd.Series:
        import numpy as np

        return s.map(
            lambda v: None
            if v is None
            else np.asarray(v, dtype=np.float32).astype(np.float16).astype(np.float32).tolist()
        )

    return _f16_grid(_col(v))


def vecf16_lt(a: Column | str, b: Column | str) -> Column:
    """``a < b`` on the vecf16 grid: snap both operands to IEEE binary16
    then lexicographic compare — the reference's vecf16 operators compare
    stored f16 values (crates/base/src/vector/vect.rs PartialOrd over
    F16, declared in src/sql/finalize.sql:248-406)."""
    return _lex_cmp(to_f16_grid(_col(a)), to_f16_grid(_col(b))) < 0


def vecf16_le(a: Column | str, b: Column | str) -> Column:
    return _lex_cmp(to_f16_grid(_col(a)), to_f16_grid(_col(b))) <= 0


def vecf16_gt(a: Column | str, b: Column | str) -> Column:
    return _lex_cmp(to_f16_grid(_col(a)), to_f16_grid(_col(b))) > 0


def vecf16_ge(a: Column | str, b: Column | str) -> Column:
    return _lex_cmp(to_f16_grid(_col(a)), to_f16_grid(_col(b))) >= 0
