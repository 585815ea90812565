"""Binary send/recv wire codecs for the three vector types.

Reference formats (little-endian, as pq_sendbytes copies raw memory):

- vector  (src/datatype/binary_vecf32.rs:10-22):  u16 dims, f32[dims]
- svector (src/datatype/binary_svecf32.rs:10-27): u32 dims, u32 len,
  u32 indexes[len], f32 values[len]
- bvector (src/datatype/binary_bvector.rs:10-24): u16 dims,
  u64 words[ceil(dims/64)]

recv validates like the reference's ``new_checked`` and raises
"detect data corruption" otherwise (binary_vecf32.rs:44).  In Spark the
wire format matters for interchange with reference deployments (COPY
BINARY dumps — tests/sqllogictest/*_binary.slt round-trips), not for
storage: Parquet is the storage wire.  Codecs are Arrow-batched pandas
UDFs built lazily (pandas_udf parses its DDL schema and needs an active
session); our bvector packs 32-bit words internally (ANSI long-overflow
guard), so the codec re-packs to the reference's 64-bit words at the
boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "vector_send",
    "vector_recv",
    "svector_send",
    "svector_recv",
    "bvector_send",
    "bvector_recv",
]

_CORRUPT = "detect data corruption"
_UDFS: dict = {}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _udf(name: str, maker):
    if name not in _UDFS:
        _UDFS[name] = maker()
    return _UDFS[name]


# ---------------------------------------------------------------------------
# vector
# ---------------------------------------------------------------------------

def _make_vector_send():
    @F.pandas_udf("binary")
    def send(v: pd.Series) -> pd.Series:
        def enc(x):
            if x is None:
                return None
            arr = np.asarray(x, dtype="<f4")
            if not 1 <= len(arr) <= 65535:
                raise ValueError(_CORRUPT)
            return np.uint16(len(arr)).astype("<u2").tobytes() + arr.tobytes()

        return v.map(enc)

    return send


def _make_vector_recv():
    @F.pandas_udf("array<float>")
    def recv(b: pd.Series) -> pd.Series:
        def dec(raw):
            if raw is None:
                return None
            if len(raw) < 2:
                raise ValueError(_CORRUPT)
            dims = int(np.frombuffer(raw[:2], dtype="<u2")[0])
            if not 1 <= dims <= 65535 or len(raw) != 2 + 4 * dims:
                raise ValueError(_CORRUPT)
            return np.frombuffer(raw[2:], dtype="<f4").tolist()

        return b.map(dec)

    return recv


def vector_send(v: Column | str) -> Column:
    return _udf("vector_send", _make_vector_send)(_col(v))


def vector_recv(b: Column | str) -> Column:
    return _udf("vector_recv", _make_vector_recv)(_col(b))


# ---------------------------------------------------------------------------
# svector
# ---------------------------------------------------------------------------

def _make_svector_send():
    @F.pandas_udf("binary")
    def send(s: pd.DataFrame) -> pd.Series:
        out = []
        for dims, idx, val in zip(s["dims"], s["indexes"], s["values"]):
            if dims is None or (isinstance(dims, float) and pd.isna(dims)):
                out.append(None)
                continue
            ia = np.asarray(idx, dtype="<u4")
            va = np.asarray(val, dtype="<f4")
            out.append(
                np.uint32(dims).astype("<u4").tobytes()
                + np.uint32(len(ia)).astype("<u4").tobytes()
                + ia.tobytes()
                + va.tobytes()
            )
        return pd.Series(out, dtype=object)

    return send


def _make_svector_recv():
    @F.pandas_udf("struct<dims:int, indexes:array<int>, values:array<float>>")
    def recv(b: pd.Series) -> pd.DataFrame:
        dims_out, idx_out, val_out = [], [], []
        for raw in b:
            if raw is None:
                dims_out.append(None)
                idx_out.append(None)
                val_out.append(None)
                continue
            if len(raw) < 8:
                raise ValueError(_CORRUPT)
            dims = int(np.frombuffer(raw[0:4], dtype="<u4")[0])
            ln = int(np.frombuffer(raw[4:8], dtype="<u4")[0])
            if len(raw) != 8 + 8 * ln or not 1 <= dims <= 1_048_575 or ln > dims:
                raise ValueError(_CORRUPT)
            idx = np.frombuffer(raw[8 : 8 + 4 * ln], dtype="<u4").astype(np.int64)
            val = np.frombuffer(raw[8 + 4 * ln :], dtype="<f4")
            # new_checked (svect.rs): indexes strictly increasing, < dims,
            # values nonzero
            if len(idx) and (
                (idx[-1] >= dims) or np.any(np.diff(idx) <= 0) or np.any(val == 0.0)
            ):
                raise ValueError(_CORRUPT)
            dims_out.append(dims)
            idx_out.append(idx.astype(np.int32).tolist())
            val_out.append(val.tolist())
        return pd.DataFrame({"dims": dims_out, "indexes": idx_out, "values": val_out})

    return recv


def svector_send(s: Column | str) -> Column:
    return _udf("svector_send", _make_svector_send)(_col(s))


def svector_recv(b: Column | str) -> Column:
    return _udf("svector_recv", _make_svector_recv)(_col(b))


# ---------------------------------------------------------------------------
# bvector
# ---------------------------------------------------------------------------

def _repack_32_to_64(words32: np.ndarray, dims: int) -> np.ndarray:
    n64 = (dims + 63) // 64
    out = np.zeros(n64, dtype=np.uint64)
    for i, word in enumerate(words32):
        out[i // 2] |= np.uint64(int(word) & 0xFFFFFFFF) << np.uint64(32 * (i % 2))
    return out


def _repack_64_to_32(words64: np.ndarray, dims: int) -> list[int]:
    n32 = (dims + 31) // 32
    return [
        (int(words64[i // 2]) >> (32 * (i % 2))) & 0xFFFFFFFF for i in range(n32)
    ]


def _make_bvector_send():
    @F.pandas_udf("binary")
    def send(s: pd.DataFrame) -> pd.Series:
        out = []
        for dims, data in zip(s["dims"], s["data"]):
            if dims is None or (isinstance(dims, float) and pd.isna(dims)):
                out.append(None)
                continue
            dims = int(dims)
            if not 1 <= dims <= 65535:
                raise ValueError(_CORRUPT)
            w64 = _repack_32_to_64(np.asarray(data, dtype=np.int64), dims)
            out.append(
                np.uint16(dims).astype("<u2").tobytes() + w64.astype("<u8").tobytes()
            )
        return pd.Series(out, dtype=object)

    return send


def _make_bvector_recv():
    @F.pandas_udf("struct<dims:int, data:array<bigint>>")
    def recv(b: pd.Series) -> pd.DataFrame:
        dims_out, data_out = [], []
        for raw in b:
            if raw is None:
                dims_out.append(None)
                data_out.append(None)
                continue
            if len(raw) < 2:
                raise ValueError(_CORRUPT)
            dims = int(np.frombuffer(raw[:2], dtype="<u2")[0])
            n64 = (dims + 63) // 64
            if not 1 <= dims <= 65535 or len(raw) != 2 + 8 * n64:
                raise ValueError(_CORRUPT)
            w64 = np.frombuffer(raw[2:], dtype="<u8")
            # new_checked (bvect.rs): padding bits beyond dims must be zero
            pad = n64 * 64 - dims
            if pad and (int(w64[-1]) >> (64 - pad)) != 0:
                raise ValueError(_CORRUPT)
            dims_out.append(dims)
            data_out.append(_repack_64_to_32(w64, dims))
        return pd.DataFrame({"dims": dims_out, "data": data_out})

    return recv


def bvector_send(s: Column | str) -> Column:
    return _udf("bvector_send", _make_bvector_send)(_col(s))


def bvector_recv(b: Column | str) -> Column:
    return _udf("bvector_recv", _make_bvector_recv)(_col(b))
