#!/usr/bin/env python
"""HNSW build-straggler hunt + build-concurrency sweep (r11 verdict
items 1 and 4).

BENCHNOTES r11 recorded ONE hnsw_pq segment at 1M x 256 dims building
in ~2990 s while its 19 siblings took ~700 s (box idle, one core
pinned).  The build is fully deterministic — seeded mixture corpus,
pmod(xxhash64(id)) segmenting, RNG-free insertion loop — so a
data-dependent blow-up MUST reproduce on the same segment in
isolation, and a transient machine artifact must NOT.  This script
separates the two:

1. regenerates the exact ann_quality_experiment corpus (same seeds,
   same partition-seeded generator, --dims to match the cell) and the
   exact segment split (Spark's xxhash64 — one small job, then Spark
   stops so measurements are Spark-free);
2. rebuilds every segment through the SAME numpy build path the index
   uses (`hnsw._build_graph` + `_quant_columns`), at a chosen
   process concurrency, timing graph and quantizer phases separately
   and collecting `_build_graph`'s per-phase counters (dist batches /
   rows, prune calls / rows, reverse-edge overflows, per-decile wall);
3. prints one JSON line per segment plus a summary with max/median
   segment wall.

Straggler replicate:  hnsw_straggler_experiment.py 1000000 --dims=256 --concurrency=20
Straggler isolate:    ... --dims=256 --concurrency=1 --segs=<worst>,<siblings>
DRAM-bandwidth sweep: ... --dims=64 --concurrency={4,8,16,20} (fixed
total work = all 20 segments; if per-segment wall falls as concurrency
falls, the flat-1M "concurrent builds thrash shared DRAM" explanation
from BENCHNOTES r11 stands).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 42
N_CLUSTERS = 16
SEGMENT_ROWS = 50_000
M = 12
EFC = 200


def corpus_dir(n_rows: int, dims: int) -> str:
    return f"/tmp/pgvrs_straggler_{n_rows}_{dims}"


def prepare(n_rows: int, dims: int) -> str:
    """Corpus + segment split on disk, partitioned by seg.  Identical
    recipe to scripts/ann_quality_experiment.py (same seeds) and the
    index's own split (HNSWIndex.create's pmod(xxhash64(cast long)))."""
    out = corpus_dir(n_rows, dims)
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    import pandas as pd
    from pyspark.sql import functions as F

    from pgvecto_rs_spark.session import get_spark

    spark = get_spark("straggler-prep",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(SEED)
    centers = rng.standard_normal((N_CLUSTERS, dims)) * 4.0
    scales = 0.8 + rng.random(N_CLUSTERS) * 0.8
    n_parts = 64
    per = -(-n_rows // n_parts)

    def gen(it):
        for pdf in it:
            for pid in pdf["id"]:
                pid = int(pid)
                lo, hi = pid * per, min(n_rows, (pid + 1) * per)
                if lo >= hi:
                    continue
                r = np.random.default_rng(SEED * 1_000_003 + pid)
                comp = r.integers(0, N_CLUSTERS, hi - lo)
                v = centers[comp] + r.standard_normal(
                    (hi - lo, dims)) * scales[comp, None]
                yield pd.DataFrame({
                    "vec_id": np.arange(lo, hi, dtype=np.int64),
                    "embedding": list(v.astype(np.float32)),
                })

    n_segments = max(1, -(-n_rows // SEGMENT_ROWS))
    (
        spark.range(n_parts).repartition(n_parts, "id")
        .mapInPandas(gen, "vec_id bigint, embedding array<float>")
        .withColumn(
            "seg",
            F.pmod(F.xxhash64(F.col("vec_id").cast("long")),
                   F.lit(n_segments)).cast("int"),
        )
        .repartition(n_segments, "seg")
        .write.mode("overwrite").partitionBy("seg").parquet(out)
    )
    spark.stop()
    return out


def _build_one(args) -> dict:
    """One segment build in a child process — the same code path as the
    index's applyInPandas task (sort by id, float64 in, _build_graph,
    _quant_columns)."""
    seg_dir, seg, quant, pq_ratio = args
    import pyarrow.parquet as pq

    from pgvecto_rs_spark.indexes.hnsw import _build_graph, _quant_columns

    tbl = pq.read_table(seg_dir, columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_numpy()
    order = np.argsort(ids)
    flat = tbl.column("embedding").combine_chunks().flatten().to_numpy()
    vecs = flat.astype(np.float64).reshape(len(ids), -1)[order]
    stats: dict = {}
    t0 = time.perf_counter()
    _build_graph(vecs, "l2", M, EFC, stats=stats)
    graph_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _quant_columns(vecs, quant, pq_ratio, 8, SEED)
    quant_s = time.perf_counter() - t0
    return {
        "seg": seg,
        "rows": len(ids),
        "graph_s": round(graph_s, 1),
        "quant_s": round(quant_s, 1),
        **{k: v for k, v in stats.items()},
    }


def main() -> None:
    argv = sys.argv[1:]
    dims, conc, segs_only, quant = 64, 20, None, "pq"
    for a in list(argv):
        if a.startswith("--dims="):
            dims = int(a.split("=")[1]); argv.remove(a)
        elif a.startswith("--concurrency="):
            conc = int(a.split("=")[1]); argv.remove(a)
        elif a.startswith("--segs="):
            segs_only = [int(s) for s in a.split("=")[1].split(",")]
            argv.remove(a)
        elif a.startswith("--quant="):
            quant = a.split("=")[1] or None
            if quant == "none":
                quant = None
            argv.remove(a)
    n_rows = int(argv[0]) if argv else 1_000_000

    path = prepare(n_rows, dims)
    seg_dirs = sorted(
        (int(d.split("=")[1]), os.path.join(path, d))
        for d in os.listdir(path) if d.startswith("seg=")
    )
    if segs_only is not None:
        seg_dirs = [(s, d) for s, d in seg_dirs if s in segs_only]
    work = [(d, s, quant, 4) for s, d in seg_dirs]
    print(json.dumps({"n_rows": n_rows, "dims": dims, "concurrency": conc,
                      "quant": quant, "segments": len(work)}), flush=True)
    t0 = time.perf_counter()
    results: list[dict] = []
    if conc <= 1:
        for w in work:
            r = _build_one(w)
            results.append(r)
            print(json.dumps(r), flush=True)
    else:
        with mp.Pool(conc) as pool:
            for r in pool.imap_unordered(_build_one, work):
                results.append(r)
                print(json.dumps(r), flush=True)
    total = time.perf_counter() - t0
    walls = sorted(r["graph_s"] + r["quant_s"] for r in results)
    med = walls[len(walls) // 2] if walls else 0.0
    print(json.dumps({
        "total_wall_s": round(total, 1),
        "median_segment_s": round(med, 1),
        "max_segment_s": round(walls[-1], 1) if walls else 0.0,
        "max_over_median": round(walls[-1] / med, 2) if med else None,
    }), flush=True)


if __name__ == "__main__":
    main()
