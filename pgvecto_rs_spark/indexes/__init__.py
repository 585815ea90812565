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

# Lazy class loading (PEP 562) — same worker-import-cost rationale as
# the package root: `pgvecto_rs_spark.indexes.segment_worker` must be
# importable without touching the pyspark/pandas-heavy index modules.
_EXPORTS = {
    "FlatIndex": "pgvecto_rs_spark.indexes.flat",
    "IVFIndex": "pgvecto_rs_spark.indexes.ivf",
    "SparseInvertedIndex": "pgvecto_rs_spark.indexes.sparse_inverted",
    "HNSWIndex": "pgvecto_rs_spark.indexes.hnsw",
}


def __getattr__(name: str):
    mod = _EXPORTS.get(name)
    if mod is not None:
        import importlib

        return getattr(importlib.import_module(mod), name)
    raise AttributeError(
        f"module 'pgvecto_rs_spark.indexes' has no attribute {name!r}"
    )


def __dir__():
    return sorted(list(globals()) + list(_EXPORTS))
