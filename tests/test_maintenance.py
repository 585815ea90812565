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


class TestAlterableOptionTree:
    """index_edit.slt goldens over the reference's alterable option
    tree (segment + optimizing, index.rs:158-167/201-246)."""

    def _idx(self, spark, sf_dir, tmp_path):
        from pgvecto_rs_spark.indexes import FlatIndex

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return FlatIndex.create(spark, emb.limit(50), str(tmp_path / "alt"), metric="l2")

    def test_unknown_key_not_found(self, spark, sf_dir, tmp_path):
        import pytest as _pt

        from pgvecto_rs_spark.maintenance import alter_index

        idx = self._idx(spark, sf_dir, tmp_path)
        with _pt.raises(ValueError, match="not found"):
            alter_index(idx, "unknown_key", "1")

    def test_unparsable_and_out_of_range_invalid(self, spark, sf_dir, tmp_path):
        import pytest as _pt

        from pgvecto_rs_spark.maintenance import alter_index

        idx = self._idx(spark, sf_dir, tmp_path)
        with _pt.raises(ValueError, match="Invalid index options"):
            alter_index(idx, "optimizing.optimizing_threads", "unknown_value")
        with _pt.raises(ValueError, match="Invalid index options"):
            alter_index(idx, "optimizing.optimizing_threads", "0")
        with _pt.raises(ValueError, match="Invalid index options"):
            alter_index(idx, "optimizing.delete_threshold", "1.5")

    def test_valid_alter_persists_and_feeds_optimizer(self, spark, sf_dir, tmp_path):
        from pgvecto_rs_spark.indexes import base as IB
        from pgvecto_rs_spark.maintenance import alter_index
        from pgvecto_rs_spark.streaming.optimizer import IndexOptimizer

        idx = self._idx(spark, sf_dir, tmp_path)
        alter_index(idx, "optimizing.optimizing_threads", "1")
        alter_index(idx, "optimizing.sealing_secs", "120")
        alter_index(idx, "segment.max_growing_segment_size", "5000")
        alter_index(idx, "optimizing.delete_threshold", "0.5")
        # persisted
        meta = IB.read_meta(idx.path)
        assert meta["optimizing.sealing_secs"] == 120
        assert meta["segment.max_growing_segment_size"] == 5000
        # optimizer attach honors the altered cadence/thresholds
        opt = IndexOptimizer(idx)
        assert opt.sealing_secs == 120.0
        assert opt.max_growing_rows == 5000
        assert opt.delete_threshold == 0.5


class TestAlteredSearchKnobsConsumed:
    """r11: the per-kind default_* options were persisted by alter but
    never read back at search time — these pin that they now ARE the
    search-time defaults (and that explicit per-call args still win)."""

    def test_ivf_default_nprobe_consumed(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        with tempfile.TemporaryDirectory() as d:
            idx = IVFIndex.create(spark, emb, d, metric="l2", nlist=8)
            q = [float(v) for v in emb.select("embedding").first()[0]]
            # full-probe via the altered default == explicit full-probe
            M.alter_index(idx, "default_nprobe", 8)
            want = [(r["id"], round(r["distance"], 9))
                    for r in idx.search(q, k=5, nprobe=8).collect()]
            got = [(r["id"], round(r["distance"], 9))
                   for r in idx.search(q, k=5).collect()]
            assert got == want
            # explicit nprobe still wins over the altered default
            M.alter_index(idx, "default_nprobe", 1)
            got2 = [(r["id"], round(r["distance"], 9))
                    for r in idx.search(q, k=5, nprobe=8).collect()]
            assert got2 == want

    def test_hnsw_default_ef_and_quant_factor(self, spark, sf_dir):
        from pgvecto_rs_spark.indexes.hnsw import (
            DEFAULT_EF_SEARCH, QUANT_EF_FACTOR, HNSWIndex,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(64)
        with tempfile.TemporaryDirectory() as d:
            idx = HNSWIndex.create(spark, emb, d, metric="l2", segment_rows=64)
            assert idx._resolve_ef(None) == DEFAULT_EF_SEARCH
            assert idx._resolve_ef(17) == 17
            # coded graphs widen the default traversal
            idx.meta["quantization"] = "pq"
            assert idx._resolve_ef(None) == DEFAULT_EF_SEARCH * QUANT_EF_FACTOR["pq"]
            idx.meta["quantization"] = "rabitq"
            assert idx._resolve_ef(None) == DEFAULT_EF_SEARCH * QUANT_EF_FACTOR["rabitq"]
            # an altered default overrides the factor entirely
            del idx.meta["quantization"]
            M.alter_index(idx, "default_ef_search", 33)
            assert idx._resolve_ef(None) == 33
            assert idx._resolve_ef(80) == 80

    def test_flat_default_rerank_size_consumed(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        with tempfile.TemporaryDirectory() as d:
            idx = FlatIndex.create(spark, emb, d, metric="l2", quantization="sq8")
            q = [float(v) for v in emb.select("embedding").first()[0]]
            # altered window default == explicitly passing the window
            M.alter_index(idx, "default_rerank_size", 64)
            want = [(r["id"], round(r["distance"], 9))
                    for r in idx.search(q, k=5, rerank_size=64).collect()]
            got = [(r["id"], round(r["distance"], 9))
                   for r in idx.search(q, k=5).collect()]
            assert got == want
