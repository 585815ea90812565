"""pgvecto_rs_spark — a PySpark-native vector analytics engine.

Re-implements the query surface of tensorchord/pgvecto.rs (a Postgres
vector-search extension) as idiomatic Spark DataFrame/SQL constructs:

- vector types: dense f32 (`array<float>`), f16-gridded dense, sparse
  (`struct<dims:int, indexes:array<int>, values:array<float>>`), binary
  (packed `array<bigint>` words) — see ``pgvecto_rs_spark.types``
- distance / arithmetic operators `<->  <#>  <=>  <~>  + - * & | ^`
  as native Column expressions — see ``pgvecto_rs_spark.functions``
- exact top-k / range search, knn-join — ``pgvecto_rs_spark.operators.search``
- ANN indexes (IVF, HNSW, sparse inverted, flat+quantization) —
  ``pgvecto_rs_spark.indexes``
- LLM-data-pipeline operators (dedup, text analysis, multimodal) —
  ``pgvecto_rs_spark.operators``

Everything is built on public Apache Spark APIs only.  The reference's
relational substrate (Postgres planner/executor) maps onto Spark
SQL/Catalyst; the extension surface maps onto the modules above.
"""

__version__ = "0.1.0"

# Lazy submodule loading (PEP 562): importing the bare package must stay
# cheap because Spark python workers import it transitively when they
# unpickle task closures (e.g. the HNSW segment runners, whose only
# heavy dependency is numpy).  Eagerly importing `functions` here would
# drag pandas + pyspark.sql (~700 ms) into every cold worker.
_SUBMODULES = ("ddl", "evaluate", "functions", "indexes", "maintenance",
               "operators", "plans", "queries", "session", "sources",
               "sql", "streaming", "types")


def __getattr__(name: str):
    if name in _SUBMODULES:
        import importlib

        return importlib.import_module(f"pgvecto_rs_spark.{name}")
    raise AttributeError(f"module 'pgvecto_rs_spark' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_SUBMODULES))
