"""Deterministic fixed-point k-means + SemDeDup (operators/clustering.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pgvecto_rs_spark.operators.clustering import (
    kdist_outliers,
    kmeans_assign,
    kmeans_fit,
    semdedup,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestKMeans:
    def test_two_obvious_clusters(self, spark):
        left = [[0.1, 0.0], [0.11, 0.01], [0.09, -0.01]]
        right = [[0.9, 1.0], [0.91, 0.99], [0.89, 1.01]]
        df = _vecs(spark, [(i, v) for i, v in enumerate(left + right)])
        cents = kmeans_fit(df, k=2, iters=3)
        got = {r["vec_id"]: r["cluster"] for r in kmeans_assign(df, cents).collect()}
        assert got[0] == got[1] == got[2]
        assert got[3] == got[4] == got[5]
        assert got[0] != got[3]

    def test_partitioning_invariance(self, spark):
        """The fixed-point protocol must give bit-identical centroids for
        any partitioning — the property float k-means lacks."""
        import random

        rng = random.Random(7)
        rows = [
            (i, [rng.uniform(-0.5, 0.5) for _ in range(8)]) for i in range(120)
        ]
        df1 = _vecs(spark, rows).repartition(1)
        df2 = _vecs(spark, rows).repartition(13, "vec_id")
        assert kmeans_fit(df1, k=4, iters=2) == kmeans_fit(df2, k=4, iters=2)

    def test_assignment_tie_breaks_to_lowest_index(self, spark):
        # a point equidistant from both centroids must land in cluster 0
        df = _vecs(spark, [(0, [0.5, 0.5])])
        cents = [[0, 0], [1000000, 1000000]]
        got = kmeans_assign(df, cents).collect()[0]
        assert got["cluster"] == 0

    def test_empty_cluster_keeps_old_centroid(self, spark):
        # k=3 over 2 distinct points: one centroid gets no members and
        # must survive the update untouched
        df = _vecs(spark, [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [1.0, 1.0])])
        cents = kmeans_fit(df, k=3, iters=2)
        assert len(cents) == 3

    def test_plan_size_bounded_at_large_k(self, spark):
        """k=64, dims=64: auto routes to the Arrow path, so the
        physical plan must NOT embed the 4096 centroid literals — plan
        size stays within a small constant factor of the k=2 plan (a
        literal tree would be ~1000x bigger and hit the Catalyst
        analyzer wall at k=1024)."""
        import random

        rng = random.Random(3)
        rows = [
            (i, [rng.uniform(-0.5, 0.5) for _ in range(64)])
            for i in range(200)
        ]
        df = _vecs(spark, rows)
        big = kmeans_fit(df, k=64, iters=1)
        assert len(big) == 64
        plan_big = kmeans_assign(df, big)._jdf.queryExecution().toString()
        plan_small = kmeans_assign(
            df, [[0] * 64, [1] * 64]
        )._jdf.queryExecution().toString()
        # 64x the centroids, ~same plan text (no k*dims literal growth)
        assert len(plan_big) < 4 * len(plan_small)
        got = kmeans_assign(df, big).limit(5).collect()
        assert len(got) == 5

    def test_expr_literal_cap_raises(self, spark):
        import pytest

        from pgvecto_rs_spark.operators import clustering as CL

        df = _vecs(spark, [(0, [0.0] * 4)])
        too_many = [[0] * 4 for _ in range(CL.MAX_EXPR_LITERAL_CELLS // 4 + 1)]
        with pytest.raises(ValueError, match="impl='numpy'"):
            kmeans_assign(df, too_many, impl="expr")


class TestSemDedup:
    def test_drops_planted_near_duplicate(self, spark):
        base = [0.3, -0.2, 0.5, 0.1]
        dup = [0.3001, -0.2001, 0.5001, 0.1001]  # cosine ~ 1.0
        far = [-0.5, 0.4, -0.1, 0.3]
        df = _vecs(spark, [(10, base), (20, dup), (30, far)])
        cents = kmeans_fit(df, k=2, iters=2)
        got = {r["vec_id"]: r["kept"] for r in semdedup(df, cents, threshold=0.99).collect()}
        assert got[10] is True  # lowest id of the dup pair is the keeper
        assert got[20] is False
        assert got[30] is True

    def test_row_count_preserved(self, spark):
        df = _vecs(spark, [(i, [float(i) / 10, 0.1]) for i in range(20)])
        cents = kmeans_fit(df, k=2, iters=1)
        assert semdedup(df, cents).count() == 20


class TestNumpyAssignParity:
    def test_numpy_path_bit_identical_to_expr(self, spark):
        """The BLAS assignment path must produce byte-identical
        (cluster, dist_u) to the Catalyst fold path — exactness argument
        in _assign_numpy's docstring."""
        import random

        rng = random.Random(11)
        rows = [
            (i, [rng.uniform(-0.6, 0.6) for _ in range(16)]) for i in range(300)
        ]
        df = _vecs(spark, rows)
        cents = kmeans_fit(df, k=5, iters=2, impl="expr")
        a = sorted(
            tuple(r) for r in kmeans_assign(df, cents, impl="expr").collect()
        )
        b = sorted(
            tuple(r) for r in kmeans_assign(df, cents, impl="numpy").collect()
        )
        assert a == b

    def test_fit_same_centroids_both_impls(self, spark):
        import random

        rng = random.Random(3)
        rows = [
            (i, [rng.uniform(-0.5, 0.5) for _ in range(8)]) for i in range(200)
        ]
        df = _vecs(spark, rows)
        assert kmeans_fit(df, k=4, iters=2, impl="expr") == kmeans_fit(
            df, k=4, iters=2, impl="numpy"
        )

    def test_semdedup_numpy_matches_expr(self, spark):
        import random

        rng = random.Random(23)
        rows = []
        for i in range(200):
            v = [rng.uniform(-0.5, 0.5) for _ in range(8)]
            rows.append((2 * i, v))
            if i % 10 == 0:  # planted near-dup with a higher id
                rows.append((2 * i + 1, [x + 1e-5 for x in v]))
        df = _vecs(spark, rows)
        cents = kmeans_fit(df, k=4, iters=2, impl="expr")
        a = sorted(tuple(r) for r in semdedup(df, cents, threshold=0.98, impl="expr").collect())
        b = sorted(tuple(r) for r in semdedup(df, cents, threshold=0.98, impl="numpy").collect())
        assert a == b
        assert any(not r[2] for r in a)  # the planted dups actually drop


class TestKdistOutliers:
    def test_planted_outlier_ranks_first(self, spark):
        # tight cluster at the origin + one far point: the far point's
        # 2nd-NN distance dwarfs everyone else's
        rows = [
            (1, [0.0, 0.0]),
            (2, [0.1, 0.0]),
            (3, [0.0, 0.1]),
            (4, [0.1, 0.1]),
            (5, [10.0, 10.0]),
        ]
        out = kdist_outliers(_vecs(spark, rows), k=2, top=5).collect()
        assert out[0]["vec_id"] == 5
        assert out[0]["kdist"] > 100
        # cluster members' 2nd-NN distance is ~0.01-0.02
        assert all(r["kdist"] < 1 for r in out[1:])

    def test_exact_duplicates_rank_k_stable(self, spark):
        # 3 exact copies of the same point: each copy's 2nd-NN distance
        # is 0 (two zero-distance neighbors exist even when SELF may be
        # displaced from the top-k+1 by lower-id duplicates)
        rows = [
            (1, [1.0, 1.0]),
            (2, [1.0, 1.0]),
            (3, [1.0, 1.0]),
            (4, [2.0, 2.0]),
        ]
        got = {r["vec_id"]: r["kdist"] for r in kdist_outliers(_vecs(spark, rows), k=2, top=4).collect()}
        assert got[1] == 0.0 and got[2] == 0.0 and got[3] == 0.0
        assert got[4] == 2.0  # (1+1) squared L2 to any duplicate


class TestParquetRows:
    """_parquet_rows footer-metadata counter (queries/embedding.py)."""

    def test_empty_dataset_dir_returns_zero(self, tmp_path):
        """r12 advice: a directory that exists but holds no part files
        (an empty Spark write leaving only _SUCCESS) is a legitimate
        0-row dataset — callers tolerating n=0 must not get an
        exception."""
        from pgvecto_rs_spark.queries.embedding import _parquet_rows

        d = tmp_path / "empty_ds"
        d.mkdir()
        (d / "_SUCCESS").write_text("")
        assert _parquet_rows(str(d)) == 0

    def test_missing_path_still_raises(self, tmp_path):
        import pytest

        from pgvecto_rs_spark.queries.embedding import _parquet_rows

        with pytest.raises(FileNotFoundError):
            _parquet_rows(str(tmp_path / "nope.parquet"))

    def test_partitioned_dataset_counts_recursively(self, tmp_path, spark):
        from pgvecto_rs_spark.queries.embedding import _parquet_rows

        df = spark.createDataFrame([(i, i % 2) for i in range(10)], "id long, p int")
        out = str(tmp_path / "part_ds")
        df.write.partitionBy("p").parquet(out)
        assert _parquet_rows(out) == 10
