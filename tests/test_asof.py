"""As-of join operator (operators/asof.py): union+window formulation."""

from __future__ import annotations

import pytest

from pgvecto_rs_spark.operators.asof import asof_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


class TestAsofJoin:
    def test_strict_backward(self, spark):
        left = _df(spark, [(1, 10, "p1"), (1, 20, "p2"), (2, 5, "p3")],
                   "k long, ts long, name string")
        right = _df(spark, [(1, 10, 100.0), (1, 15, 150.0), (2, 7, 700.0)],
                    "k long, ts long, v double")
        got = {r["name"]: r for r in asof_join(left, right, on="k").collect()}
        # strict: the right row AT ts=10 is not visible to the left row at 10
        assert got["p1"]["v"] is None
        assert got["p2"]["v"] == 150.0
        # k=2: only right ts=7 > left ts=5 -> no match
        assert got["p3"]["v"] is None

    def test_inclusive_backward(self, spark):
        left = _df(spark, [(1, 10, "p1")], "k long, ts long, name string")
        right = _df(spark, [(1, 10, 100.0), (1, 9, 90.0)],
                    "k long, ts long, v double")
        got = asof_join(left, right, on="k", strict=False).collect()[0]
        assert got["v"] == 100.0

    def test_multiple_value_cols_and_row_count(self, spark):
        left = _df(spark, [(1, 10), (1, 20), (1, 30)], "k long, ts long")
        right = _df(spark, [(1, 5, 1.0, "a"), (1, 25, 2.0, "b")],
                    "k long, ts long, v double, s string")
        out = asof_join(left, right, on="k").collect()
        assert len(out) == 3  # exactly one output row per left row
        by_ts = {r["ts"]: (r["v"], r["s"]) for r in out}
        assert by_ts[10] == (1.0, "a")
        assert by_ts[20] == (1.0, "a")
        assert by_ts[30] == (2.0, "b")

    def test_value_col_clash_raises(self, spark):
        left = _df(spark, [(1, 10, 0.0)], "k long, ts long, v double")
        right = _df(spark, [(1, 5, 1.0)], "k long, ts long, v double")
        with pytest.raises(ValueError, match="collide"):
            asof_join(left, right, on="k")
