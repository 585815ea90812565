"""Vector type conventions (reference: crates/base/src/vector/*).

The reference defines four vector types (crates/base/src/vector/mod.rs:16-21):

- ``vector(n)``  dense f32, 1 <= n <= 65535   (vect.rs:7-31)
- ``vecf16(n)``  dense f16, 1 <= n <= 65535   (vect.rs:9, scalar/f16.rs)
- ``svector(n)`` sparse f32, 1 <= n <= 1048575 (svect.rs:7-56)
- ``bvector(n)`` bit vector, 1 <= n <= 65535  (bvect.rs:11-45)

Spark mapping (SURVEY.md §1.1):

- dense   -> ``array<float>`` with column metadata ``{"dims": n}``
- f16     -> same logical type; values live on the IEEE-f16 grid
             (compute in f32 like the reference's emulated f16 kernels)
- sparse  -> ``struct<dims:int, indexes:array<int>, values:array<float>>``
             with invariants: indexes strictly increasing, in [0, dims),
             no zero values (svect.rs:21-41)
- binary  -> ``struct<dims:int, data:array<bigint>>`` bit-packed u64
             little-endian words, padding bits zero (bvect.rs:11-45)

All are plain Spark SQL types so Parquet round-trips, predicate pushdown
and whole-stage codegen work unchanged.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- dims limits (crates/base/src/vector/vect.rs:19, svect.rs:22, bvect.rs:25)
MAX_DENSE_DIMS = 65_535
MAX_SPARSE_DIMS = 1_048_575
MAX_BINARY_DIMS = 65_535

DIMS_METADATA_KEY = "dims"

# Dense vector: array<float> (f32, matching the reference's element type).
VECTOR_TYPE = T.ArrayType(T.FloatType(), containsNull=False)

# Sparse vector struct (svect.rs:7-20).
SVECTOR_TYPE = T.StructType(
    [
        T.StructField("dims", T.IntegerType(), nullable=False),
        T.StructField("indexes", T.ArrayType(T.IntegerType(), False), nullable=False),
        T.StructField("values", T.ArrayType(T.FloatType(), False), nullable=False),
    ]
)

# Binary vector struct: dims + packed 64-bit words (bvect.rs:11-45).
BVECTOR_TYPE = T.StructType(
    [
        T.StructField("dims", T.IntegerType(), nullable=False),
        T.StructField("data", T.ArrayType(T.LongType(), False), nullable=False),
    ]
)


def vector_field(name: str, dims: int | None = None, nullable: bool = True) -> T.StructField:
    """A dense-vector StructField carrying ``{"dims": n}`` metadata.

    The reference requires declared dims for indexing
    (src/index/am_options.rs:151-153 ``check_column_dims``); we carry the
    same contract in column metadata so index builders can validate.
    """
    metadata = {DIMS_METADATA_KEY: dims} if dims is not None else {}
    return T.StructField(name, VECTOR_TYPE, nullable, metadata=metadata)


def declared_dims(schema: T.StructType, column: str) -> int | None:
    """Return the declared dims for ``column`` or None (typmod -1 analogue,
    src/datatype/typmod.rs:7-44)."""
    for f in schema.fields:
        if f.name == column:
            md = f.metadata or {}
            return md.get(DIMS_METADATA_KEY)
    return None


def check_dims(n: int, kind: str = "vector") -> int:
    """Validate a dims declaration like the reference's typmod parser
    (src/datatype/typmod.rs:46-89)."""
    limit = MAX_SPARSE_DIMS if kind == "svector" else MAX_DENSE_DIMS
    if not (1 <= n <= limit):
        raise ValueError(f"{kind} dims must be in [1, {limit}], got {n}")
    return n
