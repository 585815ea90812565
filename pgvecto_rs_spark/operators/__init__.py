"""Query-level operators: exact/ANN search, knn-join, dedup, text analysis."""

from pgvecto_rs_spark.operators.search import (  # noqa: F401
    distance,
    knn_join,
    range_search,
    top_k,
)
