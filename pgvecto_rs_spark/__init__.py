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

from pgvecto_rs_spark import functions, operators, types  # noqa: F401

__version__ = "0.1.0"
