"""Aggregate semantics — svector.slt:22-80 goldens."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgvecto_rs_spark.functions import aggregates as AG


def sv(dims, pairs):
    return {
        "dims": dims,
        "indexes": [i for i, _ in pairs],
        "values": [float(v) for _, v in pairs],
    }


SV_SCHEMA = "g int, v struct<dims:int, indexes:array<int>, values:array<float>>"


class TestDense:
    def test_sum_avg(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 2.0]), (1, [3.0, 4.0]), (1, None), (2, None)],
            "g int, v array<float>",
        )
        s = {r["g"]: r["sum_vec"] for r in AG.sum_vector(df, ["g"], "v").collect()}
        assert s[1] == [4.0, 6.0]
        assert s[2] is None  # all-NULL group -> NULL (svector.slt empty case)
        a = {r["g"]: r["avg_vec"] for r in AG.avg_vector(df, ["g"], "v").collect()}
        assert a[1] == [2.0, 3.0]  # NULL row skipped in the divisor

    def test_dim_mismatch_errors(self, spark):
        df = spark.createDataFrame([(1, [1.0]), (1, [1.0, 2.0])], "g int, v array<float>")
        with pytest.raises(Exception):
            AG.sum_vector(df, ["g"], "v").collect()


class TestSparse:
    def test_avg_zero_cancellation(self, spark):
        # svector.slt:66-68: avg({0:1,1:2,2:3}/3, {0:-1,1:2,2:-3}/3) = {1:2}/3
        df = spark.createDataFrame(
            [
                (1, sv(3, [(0, 1.0), (1, 2.0), (2, 3.0)])),
                (1, sv(3, [(0, -1.0), (1, 2.0), (2, -3.0)])),
            ],
            SV_SCHEMA,
        )
        got = AG.avg_svector(df, ["g"], "v").first()["avg_svec"]
        assert got["dims"] == 3
        assert list(got["indexes"]) == [1]
        assert list(got["values"]) == [2.0]

    def test_sum_null_skip_and_empty(self, spark):
        df = spark.createDataFrame(
            [(1, sv(3, [(0, 1.0)])), (1, None), (2, None)], SV_SCHEMA
        )
        got = {r["g"]: r["sum_svec"] for r in AG.sum_svector(df, ["g"], "v").collect()}
        assert list(got[1]["indexes"]) == [0] and list(got[1]["values"]) == [1.0]
        assert got[2] is None

    def test_sum_merges_disjoint_indexes(self, spark):
        df = spark.createDataFrame(
            [(1, sv(4, [(0, 1.0), (2, 5.0)])), (1, sv(4, [(1, 2.0), (2, -5.0)]))],
            SV_SCHEMA,
        )
        got = AG.sum_svector(df, ["g"], "v").first()["sum_svec"]
        assert list(got["indexes"]) == [0, 1]  # index 2 cancelled to zero
        assert list(got["values"]) == [1.0, 2.0]
