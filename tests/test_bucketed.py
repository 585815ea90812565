"""Bucketed-table storage (sources/bucketed.py): co-located joins and
aggregations must run with ZERO shuffle exchanges — the layout-is-the-
shuffle contract that matters at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgvecto_rs_spark.sources.bucketed import (
    assert_no_exchange,
    read_table,
    write_bucketed,
)


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    labels = emb.select("vec_id", "label")
    vecs = emb.select("vec_id", "embedding")
    write_bucketed(labels, "t_labels_b", "vec_id", 8, sort_col="vec_id")
    write_bucketed(vecs, "t_vecs_b", "vec_id", 8, sort_col="vec_id")
    yield "t_labels_b", "t_vecs_b"
    spark.sql("DROP TABLE IF EXISTS t_labels_b")
    spark.sql("DROP TABLE IF EXISTS t_vecs_b")


@pytest.fixture()
def no_broadcast(spark):
    """Force the non-broadcast path: a test corpus is always under the
    broadcast threshold, but the bucketed layout targets the 100 TB
    regime where neither side broadcasts."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


class TestBucketedJoins:
    def test_cocolated_join_has_no_exchange(self, spark, tables, no_broadcast):
        ta, tb = tables
        j = read_table(spark, ta).join(read_table(spark, tb), "vec_id")
        n = j.count()
        assert n == spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").count()
        assert_no_exchange(j, allow_broadcast=False)

    def test_bucket_key_aggregation_has_no_exchange(self, spark, tables, no_broadcast):
        ta, _ = tables
        agg = read_table(spark, ta).groupBy("vec_id").agg(F.count("*").alias("n"))
        assert agg.where(F.col("n") != 1).count() == 0
        assert_no_exchange(agg, allow_broadcast=False)

    def test_unbucketed_join_does_exchange(self, spark, sf_dir, tables):
        """Sanity: the detector actually detects — the same join against
        a plain parquet side must contain an exchange."""
        ta, _ = tables
        plain = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = read_table(spark, ta).join(plain, "vec_id")
            j.count()
            with pytest.raises(AssertionError):
                assert_no_exchange(j, allow_broadcast=False)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    def test_values_roundtrip(self, spark, sf_dir, tables):
        _, tb = tables
        got = {
            r["vec_id"]: r["embedding"] for r in read_table(spark, tb).collect()
        }
        want = {
            r["vec_id"]: r["embedding"]
            for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
        }
        assert got == want
