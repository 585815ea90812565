#!/usr/bin/env python
"""HNSW scale experiment: warm query latency must stay ~flat as the
corpus grows (executor-resident segment graphs: per query only ef
candidates per segment cross the wire, and warm workers keep segments
in the process-global cache).

Run:  python scripts/hnsw_scale_experiment.py [sizes...]
Writes one JSON line per corpus size; results recorded in BENCHNOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 100_000, 200_000]
    from pgvecto_rs_spark.indexes.hnsw import HNSWIndex
    from pgvecto_rs_spark.operators.search import arrow_distance
    from pgvecto_rs_spark.session import get_spark

    spark = get_spark("hnsw-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    for n in sizes:
        work = tempfile.mkdtemp(prefix=f"pgvrs_hnsw_scale_{n}_")
        center = F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: (F.hash((F.col("id") % 16) * 64 + i) % 1000).cast("double") / 1000.0,
        )
        noise = F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: (F.hash(F.col("id") * 64 + i) % 1000).cast("double") / 5000.0,
        )
        vec = F.zip_with(center, noise, lambda c, nz: (c + nz).cast("float"))
        corpus_path = os.path.join(work, "corpus")
        (
            spark.range(n)
            .repartition(64)
            .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
            .write.mode("overwrite")
            .parquet(corpus_path)
        )
        corpus = spark.read.parquet(corpus_path)
        qrows = corpus.where(F.col("vec_id").isin([3, n // 3, n // 2, (2 * n) // 3, n - 7])).collect()
        queries = [list(r["embedding"]) for r in qrows]
        truths = []
        for q in queries:
            rows = (
                corpus.select("vec_id", arrow_distance(q, "l2")(F.col("embedding")).alias("d"))
                .orderBy("d", "vec_id").limit(10).collect()
            )
            truths.append({r["vec_id"] for r in rows})

        ef_c = int(os.environ.get("HNSW_SCALE_EFC", "200"))
        t0 = time.perf_counter()
        idx = HNSWIndex.create(
            spark, corpus, os.path.join(work, "hnsw"),
            metric="l2", segment_rows=20_000, ef_construction=ef_c,
        )
        t_build = time.perf_counter() - t0

        idx.search(queries[0], k=10).collect()  # warm the segment caches

        curve = {}
        for ef in (100, 400):
            recalls, lat = [], []
            for rep in range(3):
                for q, truth in zip(queries, truths):
                    t0 = time.perf_counter()
                    got = {r["id"] for r in idx.search(q, k=10, ef_search=ef).collect()}
                    lat.append(time.perf_counter() - t0)
                    if rep == 0:
                        recalls.append(len(got & truth) / 10)
            curve[ef] = {
                "warm_sec_per_query": round(sum(lat) / len(lat), 4),
                "warm_sec_min": round(min(lat), 4),
                "recall_at_10": round(sum(recalls) / len(recalls), 3),
            }

        out = {
            "n_rows": n,
            "n_segments": idx.meta["n_segments"],
            "ef_construction": ef_c,
            "build_sec": round(t_build, 2),
            "ef_curve": curve,
        }
        print("HNSW_SCALE_RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
