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


class TestOrdering:
    """As-if-densified comparison (svect.rs:404-444): mismatched index
    compares the present value against 0; first difference decides."""

    def _cmp(self, spark, dims, pa, pb):
        a, b = sv(spark, dims, pa), sv(spark, dims, pb)
        row = spark.range(1).select(
            S.svector_lt(a, b).alias("lt"),
            S.svector_le(a, b).alias("le"),
            S.svector_gt(a, b).alias("gt"),
            S.svector_ge(a, b).alias("ge"),
        ).first()
        return row

    @staticmethod
    def _dense(dims, pairs):
        out = [0.0] * dims
        for i, v in pairs:
            if v != 0.0:
                out[i] = float(v)
        return tuple(out)

    def test_matches_densified_order(self, spark):
        import itertools

        cases = [
            [(0, 1.0), (2, 3.0)],
            [(0, 1.0), (1, 2.0)],
            [(1, 2.0), (2, 3.0)],
            [(0, -1.0), (4, 5.0)],
            [(2, -3.0)],
            [],
            [(0, 1.0), (2, 3.0)],  # duplicate of first: equality case
            [(4, 0.5)],
            [(0, 1.0), (1, -2.0), (3, 4.0)],
        ]
        for pa, pb in itertools.combinations(cases, 2):
            da, db = self._dense(5, pa), self._dense(5, pb)
            row = self._cmp(spark, 5, pa, pb)
            assert row["lt"] == (da < db), (pa, pb)
            assert row["le"] == (da <= db), (pa, pb)
            assert row["gt"] == (da > db), (pa, pb)
            assert row["ge"] == (da >= db), (pa, pb)

    def test_equal_and_absent_vs_zero(self, spark):
        row = self._cmp(spark, 4, [(1, 2.0)], [(1, 2.0)])
        assert (row["le"], row["ge"], row["lt"], row["gt"]) == (
            True, True, False, False,
        )
        # absent index 0 (=0) vs present negative at 0: {} > {0:-1}
        row = self._cmp(spark, 4, [], [(0, -1.0)])
        assert row["gt"] and not row["lt"]

    def test_dim_mismatch_errors(self, spark):
        import pytest as _pt

        a, b = sv(spark, 3, [(0, 1.0)]), sv(spark, 4, [(0, 1.0)])
        with _pt.raises(Exception, match="differently-dimensioned"):
            spark.range(1).select(S.svector_lt(a, b)).collect()

    def test_order_by_sorts_rows(self, spark):
        """ORDER BY a svector column via the comparator key (BTree
        ordering use-case, finalize.sql svector operator CLASS)."""
        rows = [
            (0, 5, [0], [1.0]),
            (1, 5, [1], [9.0]),
            (2, 5, [0, 1], [1.0, -1.0]),
            (3, 5, [], []),
        ]
        df = spark.createDataFrame(
            rows, "id int, dims int, idx array<int>, val array<float>"
        ).select("id", S.to_svector(F.col("dims"), "idx", "val").alias("v"))
        ref = sorted(
            rows, key=lambda r: self._dense(5, list(zip(r[2], r[3])))
        )
        anchor = sv(spark, 5, [])
        key = S._sv_cmp(F.col("v"), anchor)
        # pairwise-consistent: id ordering by pairwise comparator equals
        # ordering by densified tuples
        got = [
            r["id"]
            for r in df.withColumn("k", key).collect()
        ]
        # verify with an explicit pairwise sort on the driver
        import functools

        def pair(x, y):
            rowx = spark.range(1).select(
                S._sv_cmp(
                    sv(spark, 5, list(zip(x[2], x[3]))),
                    sv(spark, 5, list(zip(y[2], y[3]))),
                ).alias("c")
            ).first()
            return rowx["c"]

        got_sorted = sorted(rows, key=functools.cmp_to_key(pair))
        assert [r[0] for r in got_sorted] == [r[0] for r in ref]


class TestNearLimitDims:
    """svector dims limit is 1,048,575 (svect.rs:22); a near-limit
    vector must flow through to_svector -> inverted index -> top-k
    exactly (r6 verdict gap #3)."""

    def test_to_svector_and_inverted_index_at_max_dims(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from pgvecto_rs_spark.functions.sparse import to_svector
        from pgvecto_rs_spark.indexes.sparse_inverted import SparseInvertedIndex
        from pgvecto_rs_spark.types import MAX_SPARSE_DIMS

        dims = MAX_SPARSE_DIMS  # 1_048_575
        hi = dims - 1            # the last legal index
        rows = [
            (1, [0, hi], [1.0, 2.0]),
            (2, [hi], [3.0]),
            (3, [0, 5, hi - 1], [1.0, 1.0, 1.0]),
            (4, [7], [9.0]),          # no overlap with the query
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, idx array<int>, val array<float>"
        ).select(
            "doc_id", to_svector(dims, "idx", "val").alias("svec")
        )
        got = {r["doc_id"]: r["svec"] for r in df.collect()}
        assert got[1]["dims"] == dims
        assert list(got[1]["indexes"]) == [0, hi]
        # an index AT dims must be rejected (0-based bound, svect.rs:33)
        bad = spark.createDataFrame(
            [(9, [dims], [1.0])], "doc_id long, idx array<int>, val array<float>"
        ).select(to_svector(dims, "idx", "val").alias("svec"))
        with pytest.raises(Exception):
            bad.collect()

        idx = SparseInvertedIndex.create(
            spark, df, str(tmp_path / "nearlimit"), svector_col="svec",
            id_col="doc_id",
        )
        # query touches the extreme term ids; expected neg-dot by hand
        q = {0: 1.0, hi: 1.0}
        out = {r["id"]: r["distance"] for r in idx.search(q, k=4).collect()}
        assert out == {1: -3.0, 2: -3.0, 3: -1.0}
        rng = {r["id"] for r in idx.range_search(q, radius=-2.0).collect()}
        assert rng == {1, 2}


class TestOrderAnchorLiterals:
    """vec_order_ops builds its comparison anchors as PURE LITERAL
    structs (r13 — interpreted HOF lambdas re-evaluate captured
    conversion subtrees per element, so the operator-built anchors were
    reconverted for every union index of every row).  Pins literal ==
    operator output so the literals can never drift from
    dense_to_svector / binarize semantics."""

    def test_literal_anchors_equal_operator_anchors(self, spark):
        import numpy as np

        from pgvecto_rs_spark.functions import binary as VB
        from pgvecto_rs_spark.queries.ann import ORDER_ANCHOR

        anchor_f = F.array(
            *[F.lit(float(x)) for x in ORDER_ANCHOR]
        ).cast("array<float>")
        a32 = [float(np.float32(x)) for x in ORDER_ANCHOR]
        asv = S.svector(
            len(a32),
            F.array(*[F.lit(i) for i, x in enumerate(a32) if x != 0.0]),
            F.array(*[F.lit(x) for x in a32 if x != 0.0]),
        )
        words = []
        for j in range((len(a32) + VB.BITS_PER_WORD - 1) // VB.BITS_PER_WORD):
            w = 0
            for k in range(VB.BITS_PER_WORD):
                i = j * VB.BITS_PER_WORD + k
                if i < len(a32) and a32[i] > 0.0:
                    w |= 1 << k
            words.append(w)
        abv = VB.bvector(len(a32), F.array(*[F.lit(w) for w in words]))
        row = spark.range(1).select(
            S.dense_to_svector(anchor_f).alias("sv_op"),
            asv.alias("sv_lit"),
            VB.binarize(anchor_f).alias("bv_op"),
            abv.alias("bv_lit"),
        ).first()
        assert row["sv_op"] == row["sv_lit"]
        assert row["bv_op"] == row["bv_lit"]
