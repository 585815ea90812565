"""F4 (null.slt) + F6 (partition.slt) fixtures: NULL/NaN handling and
partitioned/partial indexes."""

from __future__ import annotations

import math
import tempfile

import pytest
from pyspark.sql import functions as F

from pgvecto_rs_spark.indexes import FlatIndex, IVFIndex
from pgvecto_rs_spark.operators.search import top_k
from pgvecto_rs_spark.queries import Q64


@pytest.fixture(scope="module")
def nully(spark, sf_dir):
    """embeddings + NULL rows + NaN/Inf rows (null.slt:1-38 shape)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    nan_row = F.array(
        *[F.lit(float("nan")), F.lit(float("inf")), F.lit(float("-inf"))]
        + [F.lit(0.0)] * 61
    ).cast("array<float>")
    weird = spark.range(10).select(
        (F.col("id") + 10_000).alias("vec_id"),
        nan_row.alias("embedding"),
        F.lit(99).alias("label"),
    )
    nulls = spark.range(10).select(
        (F.col("id") + 20_000).alias("vec_id"),
        F.lit(None).cast("array<float>").alias("embedding"),
        F.lit(99).alias("label"),
    )
    df = emb.unionByName(weird).unionByName(nulls)
    df.cache().count()
    return df


class TestNullNaN:
    def test_topk_skips_nulls_and_still_returns_k(self, spark, nully):
        rows = top_k(nully, "embedding", Q64, 10, metric="l2", tiebreaker="vec_id").collect()
        assert len(rows) == 10
        assert all(r["vec_id"] < 10_000 for r in rows)  # NaN rows sort last

    def test_nan_rows_are_legal_and_sort_last(self, spark, nully):
        # null.slt: NaN values are indexable; Spark sorts NaN greatest,
        # matching the reference's order-preserving i32 mapping
        # (distance.rs:17-44 places NaN at the +inf end).
        rows = top_k(nully, "embedding", Q64, 10_000, metric="l2", tiebreaker="vec_id").collect()
        n_data = nully.where(F.col("embedding").isNotNull()).count()
        assert len(rows) == n_data
        tail = rows[-10:]
        assert all(r["vec_id"] >= 10_000 for r in tail)
        assert all(math.isnan(r["distance"]) for r in tail)

    def test_index_build_skips_nulls(self, spark, nully):
        with tempfile.TemporaryDirectory() as d:
            idx = FlatIndex.create(spark, nully, d, metric="l2")
            assert idx.meta["n_rows"] == nully.where(F.col("embedding").isNotNull()).count()
            assert idx.search(Q64, k=10).count() == 10


class TestPartitionedPartial:
    def test_partial_index(self, spark, sf_dir):
        """partition.slt: a partial index (WHERE label = 2) answers the
        filtered top-k exactly."""
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        with tempfile.TemporaryDirectory() as d:
            idx = IVFIndex.create(
                spark, emb, d, metric="l2", nlist=4, where=F.col("label") == 2
            )
            got = [r["id"] for r in idx.search(Q64, k=5, nprobe=4).collect()]
            truth = [
                r["vec_id"]
                for r in top_k(
                    emb, "embedding", Q64, 5, metric="l2",
                    filter=F.col("label") == 2, tiebreaker="vec_id",
                ).collect()
            ]
            assert got == truth
            assert idx.meta["n_rows"] == emb.where(F.col("label") == 2).count()

    def test_per_partition_indexes_merge(self, spark, sf_dir):
        """partition.slt partitioned-table shape: one index per category
        partition; global top-k = merge of per-partition searches."""
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        labels = [r["label"] for r in emb.select("label").distinct().collect()]
        results = []
        with tempfile.TemporaryDirectory() as d:
            for lbl in labels:
                idx = FlatIndex.create(
                    spark, emb, f"{d}/p{lbl}", metric="l2", where=F.col("label") == lbl
                )
                results.extend(idx.search(Q64, k=5).collect())
        merged = sorted(results, key=lambda r: (r["distance"], r["id"]))[:5]
        truth = top_k(emb, "embedding", Q64, 5, metric="l2", tiebreaker="vec_id").collect()
        assert [r["id"] for r in merged] == [r["vec_id"] for r in truth]


def test_issue_427_all_null_column_index(spark, tmp_path):
    """issue_427.slt: building any index over an ALL-NULL vector column
    must succeed (empty index) and searching it must run, returning the
    empty set."""
    from pgvecto_rs_spark.indexes import FlatIndex, IVFIndex
    from pgvecto_rs_spark.indexes.hnsw import HNSWIndex
    from pgvecto_rs_spark.queries import Q64

    nulls = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.lit(None).cast("array<float>").alias("embedding"),
    )
    for name, builder, kw in [
        ("flat", FlatIndex, {}),
        ("ivf", IVFIndex, {"nlist": 4}),
        ("hnsw", HNSWIndex, {"segment_rows": 64}),
    ]:
        idx = builder.create(
            spark, nulls, str(tmp_path / f"n_{name}"), metric="l2", **kw
        )
        assert idx.search(Q64, k=10).collect() == [], name
