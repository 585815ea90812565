#!/usr/bin/env python
"""Single-query HNSW latency floor at 256 dims (r11 verdict #8).

BENCHNOTES r11: default per-query QPS is 29 at 1M x 64 but 7 at
1M x 256.  Hypothesis: the resident-graph traversal cost (f64 gathers
over a 100 MB/segment matrix) — not task dispatch — is the floor.
This isolates the two WITHOUT Spark:

1. builds one 50k-row segment graph per dims in {64, 256} (same
   mixture recipe and build path as the index);
2. times `segment_worker._search_graph` per query over 100 held-out
   queries at the index's default ef, with the vector matrix resident
   as (a) float64 — today's `_load_segment` layout, (b) float32 —
   half the gather traffic, same visit order in practice;
3. reports per-query per-segment wall and the implied 20-segment
   all-core lower bound, next to the measured end-to-end per-query
   latency from BENCHNOTES (which includes dispatch + merge).

If (a) explains the 7 QPS and (b) roughly halves it, the fix is to
keep the resident working set in f32 (traversal only — exact f64
rescoring stays in the rerank/fetch step).

Run: python scripts/hnsw_qps_floor_experiment.py [seg_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

N_CLUSTERS = 16
SEED = 42
M = 12
EFC = 200
EF_SEARCH = 100  # HNSWIndex default ef resolve for k=10
N_QUERIES = 100


def mixture(n: int, dims: int, seed: int) -> np.ndarray:
    srng = np.random.default_rng(SEED)
    centers = srng.standard_normal((N_CLUSTERS, dims)) * 4.0
    scales = 0.8 + srng.random(N_CLUSTERS) * 0.8
    r = np.random.default_rng(seed)
    comp = r.integers(0, N_CLUSTERS, n)
    return (centers[comp] + r.standard_normal((n, dims)) * scales[comp, None]
            ).astype(np.float32)


def main() -> None:
    from pgvecto_rs_spark.indexes.hnsw import _build_graph
    from pgvecto_rs_spark.indexes.segment_worker import _search_graph

    seg_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    for dims in (64, 256):
        vecs = mixture(seg_rows, dims, SEED * 7 + dims).astype(np.float64)
        qs = mixture(N_QUERIES, dims, 4242).astype(np.float64)
        t0 = time.perf_counter()
        neighbors, levels = _build_graph(vecs, "l2", M, EFC)
        build_s = time.perf_counter() - t0
        entry = int(np.argmax(levels))
        # flatten neighbors to the search-time layout (list of arrays)
        for label, mat in (("f64", vecs), ("f32", vecs.astype(np.float32))):
            # warm
            _search_graph(mat, neighbors, levels, entry, qs[0], "l2", EF_SEARCH)
            t0 = time.perf_counter()
            for q in qs:
                _search_graph(mat, neighbors, levels, entry, q, "l2", EF_SEARCH)
            per_q = (time.perf_counter() - t0) / N_QUERIES
            print(json.dumps({
                "dims": dims, "resident": label, "seg_rows": seg_rows,
                "build_s": round(build_s, 1),
                "per_query_per_segment_ms": round(per_q * 1e3, 2),
                # 20 segments, all parallel on idle cores -> the graph
                # term of a 1M-row query is ~one segment's wall
                "implied_graph_floor_ms": round(per_q * 1e3, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
