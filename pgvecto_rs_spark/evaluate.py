"""Recall/QPS evaluation harness — the reference CLI's ``query``
protocol (crates/cli/src/main.rs:20-32, 121-160):

- precision (recall@k) = |result ∩ ground-truth| / k, ground truth from
  an exact scan;
- QPS = #queries / Σ per-query search wall time (build and ground-truth
  time excluded), averaged over ``epochs`` repeats.
"""

from __future__ import annotations

import time
from typing import Sequence

from pyspark.sql import DataFrame

from pgvecto_rs_spark.operators.search import top_k

__all__ = ["evaluate_index"]


def evaluate_index(
    index,
    corpus: DataFrame,
    queries: Sequence[Sequence[float]],
    k: int = 10,
    metric: str = "l2",
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    epochs: int = 1,
    **search_opts,
) -> dict:
    """Returns {"recall_at_k", "qps", "k", "n_queries", "per_query"}."""
    truths = []
    for q in queries:
        rows = top_k(corpus, vector_col, list(q), k, metric=metric, tiebreaker=id_col).collect()
        truths.append({r[id_col] for r in rows})

    recalls, total_time = [], 0.0
    for _ in range(max(1, epochs)):
        for q, truth in zip(queries, truths):
            t0 = time.perf_counter()
            got = {r["id"] for r in index.search(list(q), k=k, **search_opts).collect()}
            total_time += time.perf_counter() - t0
            recalls.append(len(got & truth) / k)

    n = len(queries) * max(1, epochs)
    return {
        "recall_at_k": sum(recalls) / len(recalls),
        "qps": n / total_time if total_time > 0 else float("inf"),
        "k": k,
        "n_queries": n,
        "per_query": recalls,
    }
