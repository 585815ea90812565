from pgvecto_rs_spark.streaming.freshness import FreshVectorIndex  # noqa: F401
