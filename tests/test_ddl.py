"""CREATE INDEX DDL surface — the reference's opclass + TOML options
grammar (index.slt / quantization.slt / index_edit.slt spellings)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgvecto_rs_spark.ddl import create_index, parse_options
from pgvecto_rs_spark.queries import Q64


@pytest.fixture()
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


class TestParse:
    def test_defaults_to_hnsw(self):
        spec = parse_options("")
        assert spec["kind"] == "hnsw"
        assert spec["params"] == {"m": 12, "ef_construction": 300}

    def test_reference_spellings(self):
        assert parse_options("[indexing.flat]")["kind"] == "flat"
        spec = parse_options("[indexing.ivf]\nnlist = 8\nspherical_centroids = true")
        assert spec["params"]["nlist"] == 8 and spec["params"]["spherical"]
        spec = parse_options("[indexing.hnsw.quantization.product]\nratio = 4")
        assert spec["quantization"] == ("product", {"ratio": 4, "bits": 8})
        spec = parse_options("[indexing.flat.quantization.scalar]\nbits = 4")
        assert spec["quantization"] == ("scalar", {"bits": 4})
        spec = parse_options("[indexing.hnsw]\nm = 16\n[optimizing]\nsealing_secs = 5")
        assert spec["alterable"] == {"optimizing.sealing_secs": 5}

    def test_deny_unknown_fields(self):
        with pytest.raises(ValueError, match="Invalid index options"):
            parse_options("[indexing.hnsw]\nunknown_key = 1")
        with pytest.raises(ValueError, match="Invalid index options"):
            parse_options("[indexing.zzz]")
        with pytest.raises(ValueError, match="Invalid index options"):
            parse_options("[wat]")
        with pytest.raises(ValueError, match="Invalid index options"):
            parse_options("[indexing.flat]\n[indexing.hnsw]")

    def test_validation_ranges(self):
        # validate(range) mirrors: m in 4..128, ef_construction 10..2000,
        # nlist 1..1e6, bits in {1,2,4,8}
        with pytest.raises(ValueError, match="Invalid index options"):
            parse_options("[indexing.hnsw]\nm = 2")
        with pytest.raises(ValueError, match="Invalid index options"):
            parse_options("[indexing.hnsw]\nef_construction = 5")
        with pytest.raises(ValueError, match="Invalid index options"):
            parse_options("[indexing.ivf]\nnlist = 0")
        with pytest.raises(ValueError, match="quantization bits"):
            parse_options("[indexing.flat.quantization.scalar]\nbits = 3")


class TestCreate:
    def test_default_hnsw_dense(self, spark, emb, tmp_path):
        idx = create_index(spark, emb, str(tmp_path / "d"))
        assert idx.meta["kind"] == "hnsw"
        assert len(idx.search(Q64, k=10, ef_search=100).collect()) == 10

    def test_ivf_cos_with_options(self, spark, emb, tmp_path):
        idx = create_index(
            spark, emb, str(tmp_path / "i"),
            opclass="vector_cos_ops",
            options="[indexing.ivf]\nnlist = 8",
        )
        assert idx.meta["kind"] == "ivf" and idx.meta["metric"] == "cos"
        assert len(idx.search(Q64, k=5, nprobe=8).collect()) == 5

    def test_flat_scalar_quantization(self, spark, emb, tmp_path):
        idx = create_index(
            spark, emb, str(tmp_path / "q"),
            options="[indexing.flat.quantization.scalar]\nbits = 4",
        )
        assert idx.meta["quantization"] == "sq4"
        assert len(idx.search(Q64, k=5).collect()) == 5

    def test_vecf16_storage(self, spark, emb, tmp_path):
        idx = create_index(
            spark, emb, str(tmp_path / "h16"),
            opclass="vecf16_l2_ops", options="[indexing.flat]",
        )
        assert idx.meta["storage"] == "f16"
        assert len(idx.search(Q64, k=5).collect()) == 5

    def test_alterable_tree_persisted(self, spark, emb, tmp_path):
        from pgvecto_rs_spark.streaming.optimizer import IndexOptimizer

        idx = create_index(
            spark, emb, str(tmp_path / "a"),
            options="[indexing.flat]\n[optimizing]\nsealing_secs = 120\n"
                    "[segment]\nmax_growing_segment_size = 5000",
        )
        assert idx.meta["optimizing.sealing_secs"] == 120
        opt = IndexOptimizer(idx)
        assert opt.sealing_secs == 120.0 and opt.max_growing_rows == 5000

    def test_sparse_opclass(self, spark, sf_dir, tmp_path):
        from pgvecto_rs_spark.functions import sparse as VS

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
            F.col("embedding").isNotNull()
        )
        sv = emb.select(
            F.col("vec_id").alias("doc_id"),
            VS.dense_to_svector(F.col("embedding")).alias("svec"),
        )
        idx = create_index(
            spark, sv, str(tmp_path / "s"),
            vector_col="svec", id_col="doc_id",
            opclass="svector_dot_ops",
            options="[indexing.sparse_inverted_index]",
        )
        q = {i: 0.5 for i in range(0, 8)}
        assert len(idx.search(q, k=5).collect()) == 5
        with pytest.raises(ValueError, match="dot metric only"):
            create_index(
                spark, sv, str(tmp_path / "s2"),
                vector_col="svec", id_col="doc_id",
                opclass="svector_l2_ops",
                options="[indexing.sparse_inverted_index]",
            )

    def test_bvector_hamming_matches_exact(self, spark, emb, tmp_path):
        from pgvecto_rs_spark.functions import binary as VB

        bv = emb.where(F.col("embedding").isNotNull()).select(
            "vec_id", VB.binarize("embedding").alias("bv")
        )
        idx = create_index(
            spark, bv, str(tmp_path / "b"),
            vector_col="bv", id_col="vec_id",
            opclass="bvector_hamming_ops",
            options="[indexing.ivf]\nnlist = 4",
        )
        qbits = [1.0 if x > 0 else 0.0 for x in Q64]
        got = [
            (r["id"], int(round(r["distance"])))
            for r in idx.search(qbits, k=5, nprobe=4).collect()
        ]
        # exact Hamming oracle via the bvector kernel
        qb = VB.from_bits(F.array(*[F.lit(int(b)) for b in qbits]))
        exact = [
            (r["vec_id"], r["d"])
            for r in bv.select(
                "vec_id", VB.bvector_hamming_distance(F.col("bv"), qb).alias("d")
            )
            .orderBy("d", "vec_id")
            .limit(5)
            .collect()
        ]
        assert got == exact

    def test_jaccard_not_indexable(self, spark, emb, tmp_path):
        from pgvecto_rs_spark.functions import binary as VB

        bv = emb.select("vec_id", VB.binarize("embedding").alias("bv"))
        with pytest.raises(NotImplementedError, match="jaccard|Jaccard"):
            create_index(
                spark, bv, str(tmp_path / "j"),
                vector_col="bv", id_col="vec_id",
                opclass="bvector_jaccard_ops",
            )


def test_pgvector_compat_ddl(spark, sf_dir, tmp_path):
    """compatibility.rs:86-100 defaults: USING hnsw -> m=16/efc=64,
    USING ivfflat -> lists=100 (capped by corpus here via nlist)."""
    from pgvecto_rs_spark.ddl import create_index_pgvector

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = create_index_pgvector(spark, emb, str(tmp_path / "pgv"))
    assert idx.meta["kind"] == "hnsw" and idx.meta["m"] == 16
    assert len(idx.search(Q64, k=5, ef_search=100).collect()) == 5

    ivf = create_index_pgvector(
        spark, emb, str(tmp_path / "pgvi"), using="ivfflat", lists=8
    )
    assert ivf.meta["kind"] == "ivf" and ivf.meta["nlist"] == 8
    with pytest.raises(ValueError, match="unknown hnsw options"):
        create_index_pgvector(spark, emb, str(tmp_path / "x"), wat=1)
