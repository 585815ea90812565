"""ANN index implementations (reference: crates/{flat,ivf,hnsw,
sparse_inverted_index}/ + crates/indexing/src/sealed.rs:16-30).

All indexes share the same surface, mirroring the reference's sealed
dispatch:

- ``create(spark, df, ...) -> Index``  (build; reference ``create``)
- ``open(spark, path) -> Index``       (load persisted artifacts)
- ``search(query, k, ...) -> DataFrame[id, distance]``  (reference
  ``vbase`` ordered stream; we return the exact-k result, with an
  over-fetch knob standing in for the unbounded stream)
- ``stat() -> dict``                   (reference ``vector_index_stat``)

Physical layout: every index is Parquet + a small JSON meta file —
columnar, partition-prunable, executor-cacheable; the Spark analogue of
the reference's mmap'd columnar segments (common/src/mmap_array.rs).
"""

from pgvecto_rs_spark.indexes.flat import FlatIndex  # noqa: F401
from pgvecto_rs_spark.indexes.ivf import IVFIndex  # noqa: F401
from pgvecto_rs_spark.indexes.sparse_inverted import SparseInvertedIndex  # noqa: F401
