"""Property check: sparse kernels agree with their dense equivalents on
randomized batches (seeded) — the unit-test analogue of the reference's
SIMD-vs-scalar cross-checks (crates/base/src/scalar/f32.rs #[cfg(test)])."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pgvecto_rs_spark.functions import sparse as S


def _make_batch(n=200, dims=16, density=0.4, seed=7):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, dims)) * (rng.random((n, dims)) < density)
    b = rng.normal(size=(n, dims)) * (rng.random((n, dims)) < density)
    return a.astype(np.float32), b.astype(np.float32)


@pytest.fixture(scope="module")
def pairs(spark):
    a, b = _make_batch()
    rows = [(i, av.tolist(), bv.tolist()) for i, (av, bv) in enumerate(zip(a, b))]
    df = spark.createDataFrame(rows, "i int, da array<float>, db array<float>")
    return df.withColumn("sa", S.dense_to_svector("da")).withColumn(
        "sb", S.dense_to_svector("db")
    )


def test_sparse_dot_equals_dense(pairs):
    from pgvecto_rs_spark.functions import dense as D

    out = pairs.select(
        "i",
        S.svector_dot("sa", "sb", check=False).alias("sd"),
        D.dot_product("da", "db", check=False).alias("dd"),
    ).collect()
    for r in out:
        assert r["sd"] == pytest.approx(r["dd"], rel=1e-6, abs=1e-9), r["i"]


def test_sparse_arith_equals_dense(pairs):
    for op, npop in [(S.svector_add, np.add), (S.svector_sub, np.subtract), (S.svector_mul, np.multiply)]:
        out = pairs.select(
            "i", "da", "db", S.svector_to_dense(op("sa", "sb", check=False)).alias("res")
        ).collect()
        for r in out:
            expect = npop(
                np.array(r["da"], np.float32), np.array(r["db"], np.float32)
            )
            got = np.array(r["res"], np.float32)
            assert np.allclose(got, expect, rtol=1e-6, atol=1e-9), r["i"]


def test_sparse_l2_equals_dense(pairs):
    from pgvecto_rs_spark.functions import dense as D

    out = pairs.select(
        "i",
        S.svector_l2sq_distance("sa", "sb", check=False).alias("sl"),
        D.l2sq_distance("da", "db", check=False).alias("dl"),
    ).collect()
    for r in out:
        assert r["sl"] == pytest.approx(r["dl"], rel=1e-5, abs=1e-8), r["i"]
