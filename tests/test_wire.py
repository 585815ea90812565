"""Binary send/recv wire-format round-trips, mirroring the reference's
COPY BINARY tests (tests/sqllogictest/{vector,svector,bvector}_binary.slt:
dump a table with NULLs and varied dims, reload, every row equal)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgvecto_rs_spark.functions import wire as W


def _roundtrip(spark, df, send, recv, col):
    out = df.withColumn("b", send(col)).withColumn("back", recv("b"))
    rows = out.collect()
    for r in rows:
        assert r["back"] == r[col], r
    return rows


def test_vector_roundtrip_with_nulls(spark):
    rows = [(1, [0.25, -1.5, 3.0]), (2, None), (3, [7.0]), (4, [0.1] * 33)]
    df = spark.createDataFrame(rows, "id long, v array<float>")
    _roundtrip(spark, df, W.vector_send, W.vector_recv, "v")


def test_vector_recv_rejects_corruption(spark):
    # truncated payload: dims says 3 but only one float follows
    import numpy as np

    bad = np.uint16(3).astype("<u2").tobytes() + np.float32(1.0).astype("<f4").tobytes()
    df = spark.createDataFrame([(bad,)], "b binary")
    with pytest.raises(Exception, match="corruption"):
        df.select(W.vector_recv("b").alias("v")).collect()


def test_svector_roundtrip(spark):
    from pgvecto_rs_spark.functions.sparse import to_svector

    df = spark.createDataFrame(
        [(1, [0, 3, 7], [1.0, -2.0, 0.5]), (2, [2], [4.0])],
        "id long, idx array<int>, val array<float>",
    ).select("id", to_svector(10, "idx", "val").alias("s"))
    _roundtrip(spark, df, W.svector_send, W.svector_recv, "s")


def test_svector_recv_rejects_unsorted_and_zero(spark):
    import numpy as np

    def payload(dims, idx, val):
        return (
            np.uint32(dims).astype("<u4").tobytes()
            + np.uint32(len(idx)).astype("<u4").tobytes()
            + np.asarray(idx, dtype="<u4").tobytes()
            + np.asarray(val, dtype="<f4").tobytes()
        )

    for bad in [
        payload(10, [3, 1], [1.0, 2.0]),  # not strictly increasing
        payload(10, [1, 3], [1.0, 0.0]),  # explicit zero value
        payload(2, [5], [1.0]),  # index beyond dims
    ]:
        df = spark.createDataFrame([(bad,)], "b binary")
        with pytest.raises(Exception, match="corruption"):
            df.select(W.svector_recv("b").alias("s")).collect()


def test_bvector_roundtrip(spark):
    from pgvecto_rs_spark.functions.binary import from_bits

    bits = [1, 0, 1, 1] * 20  # 80 dims: crosses the 64-bit word boundary
    df = spark.createDataFrame([(1, bits)], "id long, bits array<int>").select(
        "id", from_bits(F.col("bits").cast("array<boolean>")).alias("bv")
    )
    _roundtrip(spark, df, W.bvector_send, W.bvector_recv, "bv")


def test_bvector_recv_rejects_padding_garbage(spark):
    import numpy as np

    # dims=4 but a bit set beyond dims in the single 64-bit word
    raw = np.uint16(4).astype("<u2").tobytes() + np.uint64(1 << 40).astype("<u8").tobytes()
    df = spark.createDataFrame([(raw,)], "b binary")
    with pytest.raises(Exception, match="corruption"):
        df.select(W.bvector_recv("b").alias("v")).collect()
