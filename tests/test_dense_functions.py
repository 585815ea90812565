"""Golden tests for dense kernels — mirrors tests/sqllogictest/
{vector.slt, operator.slt, cos.slt, vector_subscript.slt} of the
reference."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pgvecto_rs_spark.functions import dense as D


def _one(spark, col):
    return spark.range(1).select(col.alias("r")).first()["r"]


def _vec(*xs):
    return F.array(*[F.lit(float(x)) for x in xs]).cast("array<float>")


A = [1.0, 2.0, 3.0]
B = [4.0, 5.0, 6.0]


class TestDistances:
    # reference README.md:100-116 operator examples
    def test_l2sq(self, spark):
        # [1,2,3] <-> [3,2,1] = 8 (squared, not rooted)
        assert _one(spark, D.l2sq_distance(_vec(1, 2, 3), _vec(3, 2, 1))) == 8.0

    def test_neg_dot(self, spark):
        assert _one(spark, D.neg_dot_product(_vec(*A), _vec(*B))) == -32.0

    def test_cosine(self, spark):
        got = _one(spark, D.cosine_distance(_vec(*A), _vec(*B)))
        expect = 1 - 32.0 / math.sqrt(14.0 * 77.0)
        assert got == pytest.approx(expect, rel=1e-12)

    def test_dim_mismatch_errors(self, spark):
        from py4j.protocol import Py4JJavaError

        with pytest.raises(Exception) as ei:
            _one(spark, D.l2sq_distance(_vec(1, 2), _vec(1, 2, 3)))
        assert "differently-dimensioned" in str(ei.value)


class TestScalarFunctions:
    def test_norm(self, spark):
        assert _one(spark, D.vector_norm(_vec(3, 4))) == 5.0

    def test_dims(self, spark):
        assert _one(spark, D.vector_dims(_vec(*A))) == 3

    def test_normalize(self, spark):
        got = _one(spark, D.vector_normalize(_vec(3, 4)))
        assert got == pytest.approx([0.6, 0.8])

    def test_arith(self, spark):
        assert _one(spark, D.vector_add(_vec(*A), _vec(*B))) == [5.0, 7.0, 9.0]
        assert _one(spark, D.vector_sub(_vec(*B), _vec(*A))) == [3.0, 3.0, 3.0]
        assert _one(spark, D.vector_mul(_vec(*A), _vec(*B))) == [4.0, 10.0, 18.0]


class TestSlice:
    """vector_subscript.slt:1-80 goldens: 0-based [start, end)."""

    V = list(range(8))  # [0..7]

    def s(self, spark, lo, hi):
        return _one(spark, D.vector_slice(_vec(*self.V), lo, hi))

    def test_goldens(self, spark):
        assert self.s(spark, 3, 6) == [3.0, 4.0, 5.0]
        assert self.s(spark, None, 4) == [0.0, 1.0, 2.0, 3.0]
        assert self.s(spark, 5, None) == [5.0, 6.0, 7.0]
        assert self.s(spark, 1, 8) == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]

    def test_null_cases(self, spark):
        assert self.s(spark, 5, 4) is None  # reversed
        assert self.s(spark, 9, None) is None  # out of range
        assert self.s(spark, None, 0) is None  # empty
        assert self.s(spark, None, -1) is None  # negative
        assert self.s(spark, F.lit(None).cast("int"), F.lit(8)) is None  # NULL bound


class TestF16Grid:
    def test_snaps_to_f16(self, spark):
        import numpy as np

        xs = [0.1, -0.2, 65503.9, 1e-5, 0.3333333]
        got = _one(spark, D.to_f16_grid(_vec(*xs)))
        expect = np.array(xs, dtype=np.float32).astype(np.float16).astype(np.float32)
        assert got == pytest.approx(expect.tolist(), abs=0)


class TestLexicographic:
    """operator.slt comparison goldens: elementwise-first; the SQL
    comparison operators reject differing dimensions
    (operators_vecf32.rs:37-44 check_matched_dims)."""

    def test_compare(self, spark):
        from pgvecto_rs_spark.functions.dense import vector_ge, vector_gt, vector_le, vector_lt

        assert _one(spark, vector_lt(_vec(1, 2, 3), _vec(1, 2, 4)))
        assert not _one(spark, vector_lt(_vec(1, 2, 4), _vec(1, 2, 3)))
        assert _one(spark, vector_gt(_vec(2, 1), _vec(1, 9)))
        assert _one(spark, vector_le(_vec(1, 2), _vec(1, 2)))
        assert _one(spark, vector_ge(_vec(1, 2), _vec(1, 2)))

    def test_dim_mismatch_errors(self, spark):
        from pgvecto_rs_spark.functions.dense import vector_lt

        with pytest.raises(Exception, match="dimension"):
            _one(spark, vector_lt(_vec(1, 2), _vec(1, 2, 0)))


class TestVecf16Ordering:
    """vecf16 comparisons run on the IEEE binary16 grid: two f32 values
    that collapse to the same f16 compare EQUAL (the reference compares
    stored f16: scalar/f16.rs + finalize.sql vecf16 operator family)."""

    def test_grid_collapse_equal(self, spark):
        from pgvecto_rs_spark.functions import dense as D

        # 1.0 and 1.0 + 2^-13 round to the same binary16 value
        a = F.array(F.lit(1.0), F.lit(2.0)).cast("array<float>")
        b = F.array(F.lit(1.0 + 2.0**-13), F.lit(2.0)).cast("array<float>")
        row = spark.range(1).select(
            D.vecf16_le(a, b).alias("le"),
            D.vecf16_ge(a, b).alias("ge"),
            D.vecf16_lt(a, b).alias("lt"),
            D.vecf16_gt(a, b).alias("gt"),
        ).first()
        assert (row["le"], row["ge"], row["lt"], row["gt"]) == (
            True, True, False, False,
        )

    def test_matches_numpy_f16_tuples(self, spark):
        import itertools

        import numpy as np

        from pgvecto_rs_spark.functions import dense as D

        vecs = [
            [1.0, 2.0],
            [1.0, 2.0001],
            [0.5, -3.0],
            [-0.0, 0.0],
            [65504.0, 1.0],   # f16 max
            [1e-8, 0.0],      # subnormal grid
        ]
        for va, vb in itertools.product(vecs, repeat=2):
            fa = tuple(np.float32(np.float16(np.float32(x))) for x in va)
            fb = tuple(np.float32(np.float16(np.float32(x))) for x in vb)
            a = F.array(*[F.lit(float(x)) for x in va]).cast("array<float>")
            b = F.array(*[F.lit(float(x)) for x in vb]).cast("array<float>")
            row = spark.range(1).select(
                D.vecf16_lt(a, b).alias("lt"),
                D.vecf16_gt(a, b).alias("gt"),
            ).first()
            assert row["lt"] == (fa < fb), (va, vb)
            assert row["gt"] == (fa > fb), (va, vb)
