"""Salted-join skew remedy (operators/skew.py): result parity with the
plain join and the documented key-spreading behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgvecto_rs_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows, 90% on one key — the head-key shape
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(1, "head"), (19, "tail_a"), (29, "tail_b")], "k long, name string"
    )
    return big.cache(), small


class TestSaltedJoin:
    def test_inner_matches_plain_join(self, skewed):
        big, small = skewed
        plain = big.join(small, "k").groupBy("k", "name").count()
        salted = salted_join(big, small, "k", salt=8).groupBy("k", "name").count()
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    def test_left_keeps_unmatched(self, skewed):
        big, small = skewed
        plain = big.join(small, "k", "left")
        salted = salted_join(big, small, "k", salt=8, how="left")
        assert plain.count() == salted.count() == 10_000
        assert (
            salted.where(F.col("name").isNull()).count()
            == plain.where(F.col("name").isNull()).count()
        )

    def test_salt_actually_spreads_the_head_key(self, spark, skewed):
        big, small = skewed
        b = big.withColumn(
            "__salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8)).cast("int"),
        )
        spread = (
            b.where(F.col("k") == 1).groupBy("__salt").count().collect()
        )
        assert len(spread) == 8  # head key occupies all 8 sub-keys
        counts = [r["count"] for r in spread]
        assert max(counts) < 2 * min(counts)  # roughly balanced

    def test_unsupported_how_rejected(self, skewed):
        big, small = skewed
        with pytest.raises(ValueError):
            salted_join(big, small, "k", how="full")
