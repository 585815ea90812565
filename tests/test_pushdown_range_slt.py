"""Mirror of tests/sqllogictest/pushdown_range.slt: range (sphere)
predicates + ORDER BY distance across all four vector types, including
the multi-sphere AND and the order-by-a-different-column cases — the
reference's end-to-end range-pushdown semantics, plus the planner's
index-range routing for the exact-range index kinds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgvecto_rs_spark.functions.binary import bvector_jaccard_distance
from pgvecto_rs_spark.functions.dense import (
    l2sq_distance,
    neg_dot_product,
    to_f16_grid,
)
from pgvecto_rs_spark.functions.sparse import svector_cosine_distance

# the slt's 4-row table: val0 vector, val1 vecf16, val2 svector, val3 bvector
_ROWS = [
    (0, [0.1, 0.1, 0.1], [0.1, 0.1, 0.1], ([0, 1, 2], [-0.1, 0.1, 0.1]), [0, 0, 0]),
    (1, [0.2, 0.2, 0.2], [-0.2, 0.2, 0.2], ([0, 1, 2], [0.2, -0.2, 0.2]), [0, 0, 1]),
    (2, [0.3, 0.3, 0.3], [0.3, 0.3, -0.3], ([0, 1, 2], [-0.3, 0.3, -0.3]), [1, 1, 0]),
    (3, [0.4, 0.4, 0.4], [0.4, -0.4, 0.4], ([0, 1, 2], [-0.4, -0.4, -0.4]), [1, 1, 1]),
]


@pytest.fixture(scope="module")
def t(spark):
    df = spark.createDataFrame(
        [
            (i, v0, v1, {"dims": 3, "indexes": s[0], "values": s[1]}, v3)
            for i, v0, v1, s, v3 in _ROWS
        ],
        "id long, val0 array<float>, val1 array<float>, "
        "val2 struct<dims:int, indexes:array<int>, values:array<float>>, "
        "val3 array<int>",
    )
    df.cache().count()
    return df


def _vals(df, col, dist):
    return [r[col] for r in df.where(dist.isNotNull()).orderBy(dist, "id").collect()]


class TestPushdownRangeSlt:
    def test_vector_l2_range(self, t):
        """val0 <-> q < 0.012 ORDER BY -> [0.2...], [0.3...]"""
        d = l2sq_distance("val0", F.array([F.lit(v) for v in [0.24, 0.24, 0.24]]))
        got = [r["id"] for r in t.where(d < 0.012).orderBy(d, "id").collect()]
        assert got == [1, 2]

    def test_vecf16_dot_range(self, t):
        """val1 (f16 grid) <#> q < 0 -> [0.4,-0.4,0.4], [0.1,0.1,0.1]"""
        g = to_f16_grid(F.col("val1"))
        q = F.array([F.lit(v) for v in [0.24, -0.24, 0.24]])
        d = neg_dot_product(g, q)
        got = [r["id"] for r in t.where(d < 0).orderBy(d, "id").collect()]
        assert got == [3, 0]

    def test_svector_cos_range(self, t):
        """val2 <=> {0:0.12,1:0.24,2:0.36} < 1 -> rows 0 and 1"""
        q = F.struct(
            F.lit(3).alias("dims"),
            F.array(F.lit(0), F.lit(1), F.lit(2)).alias("indexes"),
            F.array(F.lit(0.12), F.lit(0.24), F.lit(0.36))
            .cast("array<float>")
            .alias("values"),
        )
        d = svector_cosine_distance(F.col("val2"), q, check=False)
        got = [r["id"] for r in t.where(d < 1).orderBy(d, "id").collect()]
        assert got == [0, 1]

    def test_bvector_jaccard_range(self, t):
        """val3 <~> [1,1,1] <= 0.4 -> [1,1,1], [1,1,0]"""
        from pgvecto_rs_spark.functions.binary import from_bits

        q = from_bits(F.array(F.lit(1), F.lit(1), F.lit(1)))
        d = bvector_jaccard_distance(from_bits(F.col("val3")), q)
        got = [r["id"] for r in t.where(d <= 0.4).orderBy(d, "id").collect()]
        assert got == [3, 2]

    def test_multi_sphere_and_no_orderby_key(self, t):
        """two spheres ANDed, order by the first's distance -> [0.2...]"""
        d0 = l2sq_distance("val0", F.array([F.lit(v) for v in [0.24, 0.24, 0.24]]))
        d1 = neg_dot_product(
            to_f16_grid(F.col("val1")),
            F.array([F.lit(v) for v in [0.24, -0.24, 0.24]]),
        )
        got = [
            r["id"]
            for r in t.where((d0 < 0.012) & (d1 < 0.05)).orderBy(d0, "id").collect()
        ]
        assert got == [1]

    def test_sphere_key_differs_from_orderby_key(self, t):
        """filter on val0's sphere, order by val1's dot -> 0.3 then 0.2"""
        d0 = l2sq_distance("val0", F.array([F.lit(v) for v in [0.24, 0.24, 0.24]]))
        d1 = neg_dot_product(
            to_f16_grid(F.col("val1")),
            F.array([F.lit(v) for v in [1.0, 1.0, -1.0]]),
        )
        got = [r["id"] for r in t.where(d0 < 0.012).orderBy(d1, "id").collect()]
        assert got == [2, 1]

    def test_planner_routes_exact_index_range(self, spark, t):
        """the dense sphere through Planner.range_search against a flat
        index takes the index-range path and returns the same set."""
        from pgvecto_rs_spark.indexes.flat import FlatIndex
        from pgvecto_rs_spark.plans.rewrite import IndexCatalog, Planner, Sphere

        import tempfile

        with tempfile.TemporaryDirectory() as d:
            idx = FlatIndex.create(
                spark,
                t.select(F.col("id").alias("vec_id"), F.col("val0").alias("embedding")),
                path=d,
                metric="l2",
            )
            cat = IndexCatalog()
            cat.register("t", "embedding", "l2", idx)
            planner = Planner(cat)
            out = planner.range_search(
                "t",
                t.select(F.col("id").alias("vec_id"), F.col("val0").alias("embedding")),
                Sphere("embedding", [0.24, 0.24, 0.24], 0.012),
            )
            assert planner.last_decision["path"] == "index-range"
            assert sorted(r[0] for r in out.collect()) == [1, 2]
