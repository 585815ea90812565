"""Column-expression kernels for all four vector types.

Module map (reference file each mirrors):

- ``dense``       crates/base/src/vector/vect.rs (f32/f16 dense kernels)
- ``sparse``      crates/base/src/vector/svect.rs (sparse f32 kernels)
- ``binary``      crates/base/src/vector/bvect.rs (bit-vector kernels)
- ``text_format`` src/datatype/text_*.rs (text parse/format round-trip)
- ``casts``       src/datatype/casts.rs (type conversions)
- ``aggregates``  src/datatype/aggregate_*.rs (sum/avg over vectors)

All hot-path kernels are native Spark SQL higher-order-function
expressions (zip_with/aggregate/transform/filter) so they run inside
whole-stage codegen on the JVM — no Python in the inner loop.
"""

from pgvecto_rs_spark.functions.dense import (  # noqa: F401
    cosine_distance,
    dot_product,
    l2sq_distance,
    neg_dot_product,
    to_f16_grid,
    vector_add,
    vector_dims,
    vector_eq,
    vector_mul,
    vector_norm,
    vector_normalize,
    vector_slice,
    vector_sub,
)
from pgvecto_rs_spark.functions.sparse import (  # noqa: F401
    svector_add,
    svector_cosine_distance,
    svector_dims,
    svector_dot,
    svector_l2sq_distance,
    svector_mul,
    svector_neg_dot,
    svector_norm,
    svector_normalize,
    svector_sub,
    svector_to_dense,
    to_svector,
)
from pgvecto_rs_spark.functions.binary import (  # noqa: F401
    binarize,
    bvector_and,
    bvector_dims,
    bvector_hamming_distance,
    bvector_jaccard_distance,
    bvector_neg_dot,
    bvector_norm,
    bvector_or,
    bvector_to_dense,
    bvector_xor,
)
