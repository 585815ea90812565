"""Type conversions between the four vector types + SQL arrays.

Reference: src/datatype/casts.rs:10-120 and tests/sqllogictest/cast.slt:
- ``real[] -> vector``: NULL elements become NaN (cast.slt:44-46)
- ``vector -> real[]``: identity values
- ``vector <-> vecf16``: f16 grid round-trip (f32 storage here)
- ``vector <-> svector``: zero-drop / zero-fill
- ``vector <-> bvector``: values must be exactly 0 or 1, else error
  (casts.rs:89-106)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pgvecto_rs_spark.functions.binary import binarize, bvector_to_dense
from pgvecto_rs_spark.functions.dense import to_f16_grid
from pgvecto_rs_spark.functions.sparse import dense_to_svector, svector_to_dense

__all__ = [
    "array_to_vector",
    "vector_to_array",
    "vector_to_vecf16",
    "vector_to_svector",
    "svector_to_vector",
    "vector_to_bvector",
    "bvector_to_vector",
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def array_to_vector(arr: Column | str) -> Column:
    """``real[]::vector``: NULL elements -> NaN (cast.slt:44-46:
    ``'{NULL}'::real[]::vector = [NaN]``)."""
    return F.transform(
        _col(arr), lambda x: F.coalesce(x.cast("float"), F.lit(float("nan")).cast("float"))
    )


def vector_to_array(vec: Column | str) -> Column:
    return _col(vec).cast("array<float>")


def vector_to_vecf16(vec: Column | str) -> Column:
    """f32 -> f16 grid (casts.rs vector<->vecf16; values quantized like
    vecf16 storage, fidelity model per SURVEY §7)."""
    return to_f16_grid(vec)


def vector_to_svector(vec: Column | str) -> Column:
    return dense_to_svector(vec)


def svector_to_vector(sv: Column | str) -> Column:
    return svector_to_dense(sv)


def vector_to_bvector(vec: Column | str) -> Column:
    """vector -> bvector; errors unless every element is exactly 0 or 1
    (casts.rs:89-106)."""
    v = _col(vec)
    ok = F.forall(v, lambda x: (x == 0.0) | (x == 1.0))
    return F.when(ok, binarize(v)).otherwise(
        F.raise_error(F.lit("cannot cast vector to bvector: values must be 0 or 1"))
    )


def bvector_to_vector(bv: Column | str) -> Column:
    return bvector_to_dense(bv)
