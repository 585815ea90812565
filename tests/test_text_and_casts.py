"""F7 golden set: text round-trips (text_*.rs) and casts (cast.slt)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pgvecto_rs_spark.functions import casts as C
from pgvecto_rs_spark.functions import text_format as TF


def _one(spark, col):
    return spark.range(1).select(col.alias("r")).first()["r"]


class TestDenseText:
    def test_parse(self, spark):
        assert _one(spark, TF.parse_vector(F.lit("[1, 2, 3]"))) == [1.0, 2.0, 3.0]
        assert _one(spark, TF.parse_vector(F.lit(" [0.5,-2.25] "))) == [0.5, -2.25]

    def test_format_integral_without_dot(self, spark):
        # slt goldens print '[1, 2, 3]' not '[1.0, 2.0, 3.0]'
        v = F.array(F.lit(1.0), F.lit(2.0), F.lit(3.0)).cast("array<float>")
        assert _one(spark, TF.format_vector(v)) == "[1, 2, 3]"

    def test_round_trip(self, spark):
        s = "[0.5, -2.25, 7]"
        assert _one(spark, TF.format_vector(TF.parse_vector(F.lit(s)))) == s

    def test_malformed_errors(self, spark):
        for bad in ["1, 2, 3", "[]", "[1, x]"]:
            with pytest.raises(Exception):
                _one(spark, TF.parse_vector(F.lit(bad)))

    def test_format_nan_inf_no_ansi_crash(self, spark):
        """cast.slt: '{NULL}'::real[]::vector prints [NaN]; formatting
        NaN/±Inf must not hit ANSI CAST_OVERFLOW (try_cast in _fmt_f32)."""
        arr = F.array(F.lit(None).cast("float"), F.lit(1.0)).cast("array<float>")
        got = _one(spark, TF.format_vector(C.array_to_vector(arr)))
        assert got == "[NaN, 1]"
        inf = F.array(
            F.lit(float("inf")).cast("float"),
            F.lit(float("-inf")).cast("float"),
            F.lit(2.0).cast("float"),
        )
        assert _one(spark, TF.format_vector(inf)) == "[Infinity, -Infinity, 2]"


class TestSparseText:
    def test_parse_sorts_and_drops_zeros(self, spark):
        got = _one(spark, TF.parse_svector(F.lit("{2:3, 0:1, 1:0}/4")))
        assert got["dims"] == 4
        assert list(got["indexes"]) == [0, 2]
        assert list(got["values"]) == [1.0, 3.0]

    def test_duplicate_index_errors(self, spark):
        with pytest.raises(Exception):
            _one(spark, TF.parse_svector(F.lit("{1:1, 1:2}/3")))

    def test_round_trip(self, spark):
        s = "{0:1, 1:2, 2:3}/3"
        assert _one(spark, TF.format_svector(TF.parse_svector(F.lit(s)))) == s

    def test_empty(self, spark):
        got = _one(spark, TF.parse_svector(F.lit("{}/5")))
        assert got["dims"] == 5 and list(got["indexes"]) == []


class TestBinaryText:
    def test_parse_and_format(self, spark):
        s = "[0, 1, 1]"
        assert _one(spark, TF.format_bvector(TF.parse_bvector(F.lit(s)))) == s

    def test_non_binary_errors(self, spark):
        with pytest.raises(Exception):
            _one(spark, TF.parse_bvector(F.lit("[0, 2]")))


class TestCasts:
    def test_array_null_to_nan(self, spark):
        # cast.slt:44-46: '{NULL}'::real[]::vector = [NaN]
        arr = F.array(F.lit(None).cast("float"), F.lit(1.0))
        got = _one(spark, C.array_to_vector(arr))
        assert math.isnan(got[0]) and got[1] == 1.0

    def test_vector_svector_round_trip(self, spark):
        v = F.array(F.lit(0.0), F.lit(2.0), F.lit(0.0), F.lit(-1.0)).cast("array<float>")
        back = _one(spark, C.svector_to_vector(C.vector_to_svector(v)))
        assert back == [0.0, 2.0, 0.0, -1.0]

    def test_vector_bvector_requires_binary_values(self, spark):
        ok = F.array(F.lit(0.0), F.lit(1.0), F.lit(1.0)).cast("array<float>")
        got = _one(spark, C.bvector_to_vector(C.vector_to_bvector(ok)))
        assert got == [0.0, 1.0, 1.0]
        bad = F.array(F.lit(0.5)).cast("array<float>")
        with pytest.raises(Exception):
            _one(spark, C.vector_to_bvector(bad))

    def test_vecf16_grid(self, spark):
        import numpy as np

        v = F.array(F.lit(0.1), F.lit(0.3333333)).cast("array<float>")
        got = _one(spark, C.vector_to_vecf16(v))
        expect = np.array([0.1, 0.3333333], np.float32).astype(np.float16).astype(np.float32)
        assert got == pytest.approx(expect.tolist(), abs=0)
