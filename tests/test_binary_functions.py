"""Golden tests for bvector kernels — mirrors tests/sqllogictest/bvector.slt."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pgvecto_rs_spark.functions import binary as B


def _one(spark, col):
    return spark.range(1).select(col.alias("r")).first()["r"]


def bv(*bits):
    return B.from_bits(F.array(*[F.lit(int(b)) for b in bits]))


class TestConstruction:
    def test_from_bits_rejects_non_binary(self, spark):
        with pytest.raises(Exception):
            _one(spark, B.from_bits(F.array(F.lit(0), F.lit(2))))

    def test_round_trip_wide(self, spark):
        # 70 bits crosses a word boundary (32-bit words)
        bits = [(i * 7) % 3 == 0 for i in range(70)]
        got = _one(spark, B.bvector_to_dense(bv(*[1 if b else 0 for b in bits])))
        assert got == [1.0 if b else 0.0 for b in bits]

    def test_binarize(self, spark):
        v = F.array(*[F.lit(x) for x in [-1.0, 0.0, 0.5, 2.0]]).cast("array<float>")
        got = _one(spark, B.bvector_to_dense(B.binarize(v)))
        assert got == [0.0, 0.0, 1.0, 1.0]


class TestDistances:
    def test_hamming(self, spark):
        # [0,1,1] <-> [1,1,0] = 2
        assert _one(spark, B.bvector_hamming_distance(bv(0, 1, 1), bv(1, 1, 0))) == 2.0

    def test_neg_dot(self, spark):
        assert _one(spark, B.bvector_neg_dot(bv(1, 1, 0), bv(1, 1, 1))) == -2.0

    def test_jaccard(self, spark):
        # AND=1 bit, OR=3 bits -> 1 - 1/3
        got = _one(spark, B.bvector_jaccard_distance(bv(1, 1, 0), bv(0, 1, 1)))
        assert got == pytest.approx(1 - 1 / 3)

    def test_dim_mismatch(self, spark):
        with pytest.raises(Exception):
            _one(spark, B.bvector_hamming_distance(bv(1, 0), bv(1, 0, 1)))


class TestBitwise:
    def test_and_is_correct_not_self_and_self(self, spark):
        # the reference's operator_and computes self&self (bvect.rs:194);
        # we implement real AND: [1,1,0] & [0,1,1] = [0,1,0]
        got = _one(spark, B.bvector_to_dense(B.bvector_and(bv(1, 1, 0), bv(0, 1, 1))))
        assert got == [0.0, 1.0, 0.0]

    def test_or_xor(self, spark):
        assert _one(spark, B.bvector_to_dense(B.bvector_or(bv(1, 0, 0), bv(0, 0, 1)))) == [1.0, 0.0, 1.0]
        assert _one(spark, B.bvector_to_dense(B.bvector_xor(bv(1, 1, 0), bv(0, 1, 1)))) == [1.0, 0.0, 1.0]


class TestScalar:
    def test_norm_is_sqrt_popcount(self, spark):
        assert _one(spark, B.bvector_norm(bv(1, 1, 1, 1))) == 2.0
        assert _one(spark, B.bvector_norm(bv(1, 1, 0))) == pytest.approx(math.sqrt(2))

    def test_dims(self, spark):
        assert _one(spark, B.bvector_dims(bv(1, 0, 1))) == 3


class TestSlice:
    """bvector subscript (bvect.rs:210-241): bits re-packed, NULL on
    invalid bounds; cross word boundaries."""

    def test_slice_across_words(self, spark):
        bits = [1 if i % 3 == 0 else 0 for i in range(40)]
        got = _one(spark, B.bvector_to_dense(B.bvector_slice(bv(*bits), 5, 38)))
        assert got == [float(b) for b in bits[5:38]]

    def test_slice_invalid_is_null(self, spark):
        assert _one(spark, B.bvector_slice(bv(1, 0, 1), 2, 1)) is None
        assert _one(spark, B.bvector_slice(bv(1, 0, 1), 0, 4)) is None


class TestOrdering:
    """reverse_bits word compare (bvect.rs:260-276): lexicographic over
    bits in DIMENSION order — the first differing bit decides, set > clear."""

    def _cmp4(self, spark, ba, bb):
        row = spark.range(1).select(
            B.bvector_lt(ba, bb).alias("lt"),
            B.bvector_le(ba, bb).alias("le"),
            B.bvector_gt(ba, bb).alias("gt"),
            B.bvector_ge(ba, bb).alias("ge"),
        ).first()
        return row

    def test_matches_bit_lexicographic(self, spark):
        import itertools

        cases = [
            (0, 0, 0, 0),
            (1, 0, 0, 0),
            (0, 1, 0, 0),
            (1, 1, 0, 0),
            (0, 0, 0, 1),
            (1, 0, 1, 1),
        ]
        for xa, xb in itertools.product(cases, repeat=2):
            row = self._cmp4(spark, bv(*xa), bv(*xb))
            assert row["lt"] == (xa < xb), (xa, xb)
            assert row["le"] == (xa <= xb), (xa, xb)
            assert row["gt"] == (xa > xb), (xa, xb)
            assert row["ge"] == (xa >= xb), (xa, xb)

    def test_cross_word_boundary(self, spark):
        # identical first word (32 bits), difference only in word 2:
        # the word-walk must reach it
        a = [0] * 40
        b = [0] * 40
        a[35] = 1
        row = self._cmp4(spark, bv(*a), bv(*b))
        assert row["gt"] and not row["lt"]
        # difference in word 1 dominates any later difference
        a2 = [0] * 40
        b2 = [0] * 40
        a2[3] = 1   # a2 > b2 at dim 3
        b2[35] = 1  # later difference ignored
        row = self._cmp4(spark, bv(*a2), bv(*b2))
        assert row["gt"] and not row["lt"]

    def test_dim_mismatch_errors(self, spark):
        with pytest.raises(Exception, match="differently-dimensioned"):
            _one(spark, B.bvector_lt(bv(1, 0), bv(1, 0, 1)))
