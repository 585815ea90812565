"""Golden tests for sparse kernels — mirrors tests/sqllogictest/svector.slt."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pgvecto_rs_spark.functions import sparse as S


def _one(spark, col):
    return spark.range(1).select(col.alias("r")).first()["r"]


def sv(spark_unused, dims, pairs):
    """Build an svector literal column from {idx: val} pairs."""
    idx = F.array(*[F.lit(i) for i, _ in pairs]).cast("array<int>")
    val = F.array(*[F.lit(float(v)) for _, v in pairs]).cast("array<float>")
    return S.to_svector(dims, idx, val)


class TestConstructor:
    def test_sorts_and_drops_zeros(self, spark):
        # to_svector sorts by index and drops zeros (functions_svecf32.rs:21-59)
        got = _one(spark, sv(spark, 5, [(3, 4.0), (0, 1.0), (2, 0.0)]))
        assert got["dims"] == 5
        assert list(got["indexes"]) == [0, 3]
        assert list(got["values"]) == [1.0, 4.0]

    def test_duplicate_index_errors(self, spark):
        with pytest.raises(Exception) as ei:
            _one(spark, sv(spark, 5, [(1, 1.0), (1, 2.0)]))
        assert "to_svector" in str(ei.value)

    def test_out_of_range_errors(self, spark):
        with pytest.raises(Exception):
            _one(spark, sv(spark, 3, [(5, 1.0)]))


class TestDistances:
    # svector.slt uses {0:1,1:2,2:3}/3 and {0:4,1:5,2:6}/3
    def A(self, spark):
        return sv(spark, 3, [(0, 1.0), (1, 2.0), (2, 3.0)])

    def B(self, spark):
        return sv(spark, 3, [(0, 4.0), (1, 5.0), (2, 6.0)])

    def test_dot(self, spark):
        assert _one(spark, S.svector_neg_dot(self.A(spark), self.B(spark))) == -32.0

    def test_l2sq(self, spark):
        assert _one(spark, S.svector_l2sq_distance(self.A(spark), self.B(spark))) == 27.0

    def test_cos(self, spark):
        got = _one(spark, S.svector_cosine_distance(self.A(spark), self.B(spark)))
        assert got == pytest.approx(1 - 32 / math.sqrt(14 * 77), rel=1e-12)

    def test_disjoint_dot_is_zero(self, spark):
        a = sv(spark, 4, [(0, 1.0)])
        b = sv(spark, 4, [(3, 2.0)])
        assert _one(spark, S.svector_dot(a, b)) == 0.0


class TestScalarFunctions:
    def test_norm(self, spark):
        # vector_norm('{0:3,1:4}/2') = 5 (svector.slt)
        v = sv(spark, 2, [(0, 3.0), (1, 4.0)])
        assert _one(spark, S.svector_norm(v)) == 5.0

    def test_dims_is_declared_dims(self, spark):
        v = sv(spark, 100, [(3, 1.0)])
        assert _one(spark, S.svector_dims(v)) == 100

    def test_normalize(self, spark):
        v = sv(spark, 2, [(0, 3.0), (1, 4.0)])
        got = _one(spark, S.svector_normalize(v))
        assert list(got["values"]) == pytest.approx([0.6, 0.8])


class TestArithmetic:
    def test_add_cancellation_drops_zero(self, spark):
        # {0:1,1:2,2:3} + {0:-1,1:2,2:-3} = {1:4}/3  (zero-drop semantics)
        a = sv(spark, 3, [(0, 1.0), (1, 2.0), (2, 3.0)])
        b = sv(spark, 3, [(0, -1.0), (1, 2.0), (2, -3.0)])
        got = _one(spark, S.svector_add(a, b))
        assert list(got["indexes"]) == [1]
        assert list(got["values"]) == [4.0]

    def test_sub(self, spark):
        a = sv(spark, 3, [(0, 1.0), (2, 3.0)])
        b = sv(spark, 3, [(0, 1.0), (1, 5.0)])
        got = _one(spark, S.svector_sub(a, b))
        assert list(got["indexes"]) == [1, 2]
        assert list(got["values"]) == [-5.0, 3.0]

    def test_mul_is_intersection(self, spark):
        a = sv(spark, 4, [(0, 2.0), (1, 3.0)])
        b = sv(spark, 4, [(1, 4.0), (3, 9.0)])
        got = _one(spark, S.svector_mul(a, b))
        assert list(got["indexes"]) == [1]
        assert list(got["values"]) == [12.0]

    def test_dim_mismatch_errors(self, spark):
        a = sv(spark, 3, [(0, 1.0)])
        b = sv(spark, 4, [(0, 1.0)])
        with pytest.raises(Exception):
            _one(spark, S.svector_add(a, b))


class TestConversions:
    def test_round_trip(self, spark):
        v = sv(spark, 4, [(1, 2.0), (3, -1.5)])
        dense = _one(spark, S.svector_to_dense(v))
        assert dense == [0.0, 2.0, 0.0, -1.5]
        back = _one(spark, S.dense_to_svector(S.svector_to_dense(v)))
        assert list(back["indexes"]) == [1, 3]
        assert list(back["values"]) == [2.0, -1.5]


class TestSlice:
    """svector subscript goldens (svector_subscript.slt semantics,
    svect.rs:353-379: reindexed entries, NULL-on-invalid)."""

    def test_slice_reindexes(self, spark):
        v = sv(spark, 8, [(1, 1.0), (3, 3.0), (6, 6.0)])
        got = _one(spark, S.svector_slice(v, 2, 7))
        assert got["dims"] == 5
        assert list(got["indexes"]) == [1, 4]  # 3-2, 6-2
        assert list(got["values"]) == [3.0, 6.0]

    def test_slice_empty_is_valid(self, spark):
        v = sv(spark, 8, [(0, 1.0)])
        got = _one(spark, S.svector_slice(v, 2, 5))
        assert got["dims"] == 3 and list(got["indexes"]) == []

    def test_slice_invalid_is_null(self, spark):
        from pyspark.sql import functions as F

        v = sv(spark, 8, [(1, 1.0)])
        assert _one(spark, S.svector_slice(v, 5, 5)) is None
        assert _one(spark, S.svector_slice(v, 0, 9)) is None
        assert _one(spark, S.svector_slice(v, F.lit(None).cast("int"), 3)) is None
