"""alter/fence/stat + pgvector-compat mapping (compatibility.rs)."""

from __future__ import annotations

import tempfile

import pytest

from pgvecto_rs_spark import maintenance as M
from pgvecto_rs_spark.indexes import FlatIndex, IVFIndex


def test_alter_and_fence(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with tempfile.TemporaryDirectory() as d:
        idx = IVFIndex.create(spark, emb, d, metric="l2", nlist=4)
        M.alter_index(idx, "default_nprobe", 7)
        assert IVFIndex.open(spark, d).meta["default_nprobe"] == 7
        with pytest.raises(ValueError):
            M.alter_index(idx, "nlist", 99)  # build-time option: not alterable
        st = M.fence_index(idx)
        assert st["idx_indexing"] is False


def test_pgvector_compat_defaults():
    hnsw = M.pgvector_compat_options("hnsw")
    assert hnsw == {"kind": "hnsw", "m": 16, "ef_construction": 64}
    ivf = M.pgvector_compat_options("ivfflat", lists=200)
    assert ivf == {"kind": "ivf", "nlist": 200}
    with pytest.raises(ValueError):
        M.pgvector_compat_options("hnsw", ef=10)
    with pytest.raises(ValueError):
        M.pgvector_compat_options("gin")


def test_evaluate_harness(spark, sf_dir):
    """CLI `query` protocol: recall@k + QPS over a query set."""
    from pgvecto_rs_spark.evaluate import evaluate_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = [list(r["embedding"]) for r in emb.orderBy("vec_id").limit(5).collect()]
    with tempfile.TemporaryDirectory() as d:
        idx = IVFIndex.create(spark, emb, d, metric="l2", nlist=8)
        rep = evaluate_index(idx, emb, qs, k=10, nprobe=8)
    assert rep["recall_at_k"] == 1.0  # full probe is exact
    assert rep["qps"] > 0 and rep["n_queries"] == 5
