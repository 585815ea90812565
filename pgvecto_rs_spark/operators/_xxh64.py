"""Vectorized XXH64 — bit-identical to Spark SQL's ``xxhash64`` over
string/binary values (seed 42), evaluated in numpy over many inputs at
once.

Why this exists (r14 optimization round): the shingle pipelines
(`shingles` -> `xxhash64` per shingle) run as Catalyst *higher-order
functions*, which are CodegenFallback — every lambda element evaluates
interpreted at ~10 us per shingle (measured r13).  A 5 kdoc corpus at
sf0.1 produces ~1.5 M shingles, i.e. ~15 s of executor task time for
what is arithmetically a few ms of hashing.  Moving the hash into an
Arrow batch UDF needs a numpy XXH64 that matches the JVM bit for bit;
this module provides it.

Scope: inputs up to any length via the stripe loop; the hot path is a
2-D ``(n_windows, k)`` uint8 matrix of fixed-width byte windows (ASCII
character shingles), hashed in one vectorized pass with no Python loop
over rows.

Algorithm: canonical XXH64 (Yann Collet, public spec, BSD) — the same
spec Spark's ``XXH64`` implements; Spark hashes a string's UTF-8 bytes
with the column seed (42 for the SQL function's default).
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_M = (1 << 64) - 1


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def xxh64_windows(mat: np.ndarray, seed: int = 42) -> np.ndarray:
    """XXH64 of every row of a ``(n, L)`` uint8 matrix -> uint64[n].

    Bit-identical to Spark's ``xxhash64(s)`` where each row holds the
    UTF-8 bytes of ``s``.  L is a compile-time constant per call so the
    stripe/tail loops below unroll in Python (3 iterations max for the
    shingle case) while every operation inside is a whole-column numpy
    kernel.
    """
    if mat.ndim != 2 or mat.dtype != np.uint8:
        raise ValueError("xxh64_windows needs a 2-D uint8 matrix")
    n, length = mat.shape
    total = np.uint64(length)
    i = 0
    if length >= 32:
        v1 = np.full(n, np.uint64((seed + int(_P1) + int(_P2)) & _M), dtype=np.uint64)
        v2 = np.full(n, np.uint64((seed + int(_P2)) & _M), dtype=np.uint64)
        v3 = np.full(n, np.uint64(seed & _M), dtype=np.uint64)
        v4 = np.full(n, np.uint64((seed - int(_P1)) & _M), dtype=np.uint64)
        while i + 32 <= length:
            for v, off in ((v1, 0), (v2, 8), (v3, 16), (v4, 24)):
                lane = _le64(mat[:, i + off : i + off + 8])
                v += lane * _P2  # noqa: PLW2901 - in-place on the named buffer
                v[:] = _rotl(v, 31)
                v *= _P1
            i += 32
        h = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            h ^= _rotl(v * _P2, 31) * _P1
            h = h * _P1 + _P4
    else:
        h = np.full(n, np.uint64(seed) + _P5, dtype=np.uint64)
    h = h + total
    while i + 8 <= length:
        k1 = _le64(mat[:, i : i + 8])
        h ^= _rotl(k1 * _P2, 31) * _P1
        h = _rotl(h, 27) * _P1 + _P4
        i += 8
    if i + 4 <= length:
        k = _le32(mat[:, i : i + 4])
        h ^= k * _P1
        h = _rotl(h, 23) * _P2 + _P3
        i += 4
    while i < length:
        h ^= mat[:, i].astype(np.uint64) * _P5
        h = _rotl(h, 11) * _P1
        i += 1
    h ^= h >> np.uint64(33)
    h *= _P2
    h ^= h >> np.uint64(29)
    h *= _P3
    h ^= h >> np.uint64(32)
    return h


def _le64(cols: np.ndarray) -> np.ndarray:
    """8 uint8 columns -> little-endian uint64 column."""
    out = np.zeros(cols.shape[0], dtype=np.uint64)
    for j in range(8):
        out |= cols[:, j].astype(np.uint64) << np.uint64(8 * j)
    return out


def _le32(cols: np.ndarray) -> np.ndarray:
    out = np.zeros(cols.shape[0], dtype=np.uint64)
    for j in range(4):
        out |= cols[:, j].astype(np.uint64) << np.uint64(8 * j)
    return out


def xxh64_bytes(data: bytes, seed: int = 42) -> int:
    """Scalar XXH64 (python ints, exact) — the reference/fallback path
    for variable-length inputs (non-ASCII shingles, whole short docs).
    Returns the SIGNED 64-bit value Spark's ``xxhash64`` column shows.
    """
    p1, p2, p3, p4, p5 = (
        0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
        0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5,
    )

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & _M

    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + p1 + p2) & _M
        v2 = (seed + p2) & _M
        v3 = seed & _M
        v4 = (seed - p1) & _M
        while i + 32 <= n:
            vs = [v1, v2, v3, v4]
            for j in range(4):
                lane = int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little")
                vs[j] = (rotl((vs[j] + lane * p2) & _M, 31) * p1) & _M
            v1, v2, v3, v4 = vs
            i += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = (h ^ (rotl((v * p2) & _M, 31) * p1) & _M) & _M
            h = (h * p1 + p4) & _M
    else:
        h = (seed + p5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k1 = int.from_bytes(data[i : i + 8], "little")
        h = (h ^ (rotl((k1 * p2) & _M, 31) * p1) & _M) & _M
        h = (rotl(h, 27) * p1 + p4) & _M
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i : i + 4], "little")
        h = (h ^ (k * p1) & _M) & _M
        h = (rotl(h, 23) * p2 + p3) & _M
        i += 4
    while i < n:
        h = (h ^ (data[i] * p5) & _M) & _M
        h = (rotl(h, 11) * p1) & _M
        i += 1
    h ^= h >> 33
    h = (h * p2) & _M
    h ^= h >> 29
    h = (h * p3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h
