"""Product quantization and RaBitQ — the remaining quantizers.

Reference:
- PQ: crates/quantization/src/product.rs:31-120 — split dims into
  subspaces (``ratio`` dims each), k-means codebook of 2^bits centroids
  per subspace (defaults ratio=1, bits=8; train sample cap 65536,
  product.rs:60-66), asymmetric distance via per-query LUT.
- RaBitQ: crates/quantization/src/rabitq.rs:24-143 — seeded random
  orthogonal projection (QR of a gaussian matrix, rabitq.rs:37-56),
  1-bit sign codes of the rotated normalized vector + per-vector
  correction factors, estimator rescales the bit dot product.

Spark shapes:
- PQ codes are an ``array<smallint>`` column (n_subspaces bytes of
  information per row).  The query-time LUT is a (n_sub × 2^bits)
  table computed on the driver and inlined as a literal
  array-of-arrays; approximate distance is a native ``aggregate`` over
  the code array — whole-stage codegen, scanning ONLY the code column.
- RaBitQ codes are sign bits packed into ``array<int>`` words plus a
  stored norm.  Scoring unpacks per Arrow batch in numpy (one matmul
  per batch) — the Python boundary is per-batch, not per-row.

Both feed the same two-phase plan as SQ8: approximate scan -> rerank
window -> exact distances (reranker/flat.rs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PQ_BITS = 8  # crates/base/src/index.rs:475-496 default
TRAIN_CAP = 65536  # common/src/sample.rs


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------

def pq_train(sample: np.ndarray, n_subspaces: int, bits: int = PQ_BITS, seed: int = 42) -> np.ndarray:
    """Codebooks (n_subspaces, 2^bits, sub_dims) via per-subspace Lloyd.

    Training rows are capped at 64 per centroid (16384 at 8 bits) by a
    deterministic stride over the caller's id-sorted rows.  NOTE: the
    reference's PQ trainer itself samples 65536 rows for 256 centroids
    (256/centroid, crates/quantization/src/product.rs:61); our 64/centroid
    cap matches the reference's *IVF* k-means ratio (65536-row cap over
    nlist=1000 defaults, common/src/sample.rs), i.e. 4x fewer rows than
    its PQ trainer — a deliberate divergence validated by the recall
    gates (0.968-0.998 at 1M across 64/256 dims, 0.973 at 200kx1024).
    Lloyd cost is linear in rows, and past ~64/centroid extra rows only
    re-measure the same cells: the r12 profile had quantizer training
    at 3x the HNSW graph build per 256-dim segment, almost all of it
    Lloyd over the full 50k rows.  Encoding still covers every row."""
    from pgvecto_rs_spark.indexes.ivf import _lloyd

    n, dims = sample.shape
    cap = max((1 << bits) * 64, 4096)
    if n > cap:
        # floor stride keeps the strided sample >= cap rows (ceil would
        # undershoot: n=16385 with ceil stride 2 trains on 8193 rows —
        # half the documented target); truncate back down to exactly cap
        sample = sample[:: max(1, n // cap)][:cap]
        n = len(sample)
    if dims % n_subspaces:
        raise ValueError(f"dims {dims} not divisible by n_subspaces {n_subspaces}")
    sub = dims // n_subspaces
    k = 1 << bits
    books = []
    for s in range(n_subspaces):
        block = sample[:, s * sub : (s + 1) * sub]
        books.append(_lloyd(block, min(k, len(block)), seed=seed + s).astype(np.float64))
    # pad codebooks short of k (tiny training sets) by repeating rows so
    # the LUT stays rectangular
    full = np.zeros((n_subspaces, k, sub))
    for s, b in enumerate(books):
        full[s, : len(b)] = b
        if len(b) < k:
            full[s, len(b) :] = b[-1]
    return full


def pq_encode_udf(codebooks: np.ndarray, spark):
    """Pandas UDF: vector -> array<smallint> of per-subspace centroid ids."""
    bc = spark.sparkContext.broadcast(codebooks)

    @F.pandas_udf("array<smallint>")
    def encode(v: pd.Series) -> pd.Series:
        books = bc.value
        n_sub, k, sub = books.shape
        mat = np.asarray(v.tolist(), dtype=np.float64)
        codes = np.empty((len(mat), n_sub), dtype=np.int16)
        for s in range(n_sub):
            block = mat[:, s * sub : (s + 1) * sub]
            d = (
                np.einsum("ij,ij->i", block, block)[:, None]
                - 2.0 * block @ books[s].T
                + np.einsum("ij,ij->i", books[s], books[s])[None, :]
            )
            codes[:, s] = np.argmin(d, axis=1)
        return pd.Series([row.tolist() for row in codes])

    return encode


def pq_lut(codebooks: np.ndarray, q: np.ndarray, kernel: str) -> np.ndarray:
    """Per-query LUT[s][c] = kernel distance contribution of subspace s
    centroid c (product.rs asymmetric distance)."""
    n_sub, k, sub = codebooks.shape
    lut = np.empty((n_sub, k))
    for s in range(n_sub):
        qs = q[s * sub : (s + 1) * sub]
        if kernel == "l2":
            d = codebooks[s] - qs[None, :]
            lut[s] = np.einsum("ij,ij->i", d, d)
        else:  # dot
            lut[s] = -(codebooks[s] @ qs)
    return lut


def pq_approx_distance(codes_col: Column | str, lut: np.ndarray) -> Column:
    """Native ADC: Σ_s LUT[s][code_s] over the code array."""
    c = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    lut_col = F.array(*[F.array(*[F.lit(float(x)) for x in row]) for row in lut])
    pairs = F.zip_with(
        c,
        F.transform(lut_col, lambda row: row),  # identity keeps shapes aligned
        lambda code, row: F.element_at(row, code.cast("int") + 1),
    )
    return F.aggregate(pairs, F.lit(0.0), lambda acc, x: acc + x)


# ---------------------------------------------------------------------------
# RaBitQ
# ---------------------------------------------------------------------------

def rabitq_projection(dims: int, seed: int = 42) -> np.ndarray:
    """Seeded random orthogonal matrix: QR of a gaussian (rabitq.rs:37-56)."""
    rng = np.random.default_rng(seed)
    g = rng.normal(size=(dims, dims))
    qmat, r = np.linalg.qr(g)
    # sign-fix so the decomposition is unique/deterministic
    qmat *= np.sign(np.diag(r))[None, :]
    return qmat


def rabitq_encode_udf(proj: np.ndarray, spark):
    """vector -> (norm float, sign bits packed into array<int> words).

    bit i = sign(P·x̂)_i > 0; decode estimator x̂ ≈ norm · Pᵀ·sgn/√d."""
    bc = spark.sparkContext.broadcast(proj)

    @F.pandas_udf("struct<norm: float, words: array<int>>")
    def encode(v: pd.Series) -> pd.DataFrame:
        p = bc.value
        dims = p.shape[0]
        n_words = (dims + 31) // 32
        mat = np.asarray(v.tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        safe = np.where(norms > 0, norms, 1.0)
        rotated = (mat / safe[:, None]) @ p.T
        bits = (rotated > 0).astype(np.uint32)
        padded = np.zeros((len(mat), n_words * 32), dtype=np.uint32)
        padded[:, :dims] = bits
        words = padded.reshape(len(mat), n_words, 32)
        packed = (words << np.arange(32, dtype=np.uint32)[None, None, :]).sum(axis=2).astype(np.int64)
        return pd.DataFrame(
            {
                "norm": norms.astype(np.float32),
                "words": [row.astype("int32").tolist() for row in packed.view(np.int64) & 0xFFFFFFFF],
            }
        )

    return encode


def rabitq_score_udf(proj: np.ndarray, q: np.ndarray, kernel: str, spark):
    """Approximate kernel distance from (norm, words) per Arrow batch:
    dot(q, x) ≈ norm/√d · Σ_i (2·bit_i − 1)·(P·q̂... direct z_i) with
    z = P·q — one unpack + matvec per batch, numpy-vectorized."""
    dims = proj.shape[0]
    z = proj @ q  # rotate the query once, driver-side
    bz = spark.sparkContext.broadcast(z)
    q_sq = float(q @ q)

    @F.pandas_udf("double")
    def score(norm: pd.Series, words: pd.Series) -> pd.Series:
        zz = bz.value
        d = len(zz)
        n_words = (d + 31) // 32
        w = np.asarray(words.tolist(), dtype=np.int64).astype(np.uint32)
        bits = ((w[:, :, None] >> np.arange(32, dtype=np.uint32)[None, None, :]) & 1).astype(np.float64)
        bits = bits.reshape(len(w), n_words * 32)[:, :d]
        sgn = 2.0 * bits - 1.0
        est_dot = (norm.to_numpy(dtype=np.float64) / np.sqrt(d)) * (sgn @ zz)
        if kernel == "dot":
            return pd.Series(-est_dot)
        # l2: ||q||² + ||x||² − 2·q·x̂
        n2 = norm.to_numpy(dtype=np.float64) ** 2
        return pd.Series(q_sq + n2 - 2.0 * est_dot)

    return score


# ---------------------------------------------------------------------------
# scale-aware default rerank windows (r11)
# ---------------------------------------------------------------------------

#: Default rerank fraction of the approximately-scored candidate pool
#: per quantizer (applies when rerank_size=0; an explicit rerank_size —
#: the reference's pq_rerank_size / sq_rerank_size GUCs,
#: src/gucs/executing.rs:4-14 — keeps the fixed-window contract).
#: Calibrated on the 200k-row / nlist=512 sweep (BENCHNOTES r11
#: "rerank window calibration"): pq recall saturates at its nprobe
#: ceiling at ~4% of the pool (win 320 of a ~8.2k-candidate pool hit
#: the 0.93 ceiling; the old fixed win 40 read 0.83), and at
#: saturation results are bit-identical to the unquantized cell at the
#: same nprobe (verified directly).  rabitq (1 bit/dim at 64 dims)
#: needs ~2x that to approach its ceiling.  sq8's decode error is
#: small enough that the fixed 4k window already matched the
#: unquantized cell at the 1M gate (r10), so it keeps the cheap
#: default; low-bit SQ interpolates by code size (conservative).
RERANK_POOL_FRAC = {"pq": 0.04, "rabitq": 0.08,
                    "sq4": 0.02, "sq2": 0.08, "sq1": 0.08}

#: absolute bound on the scale-aware default window: keeps the
#: exact-vector rerank fetch (win rows/query) bounded however large the
#: candidate pool grows; users chasing the last recall points at
#: extreme pool sizes set rerank_size explicitly
RERANK_WINDOW_CAP = 4096


def scaled_rerank_window(quant: str | None, k: int, pool: int,
                         rerank_size: int, pq_ratio: int = 4) -> int:
    """Rerank window for the fixed-window two-phase paths.  The DEFAULT
    scales with the candidate pool because ADC rank error displaces
    true neighbors further down the approximate order the more
    candidates are scored — a fixed window's recall decays as the
    corpus grows (pq measured 0.80 recall at the 1M gate with the old
    fixed win 40; 4% of the pool restores the unquantized ceiling).

    An explicit ``rerank_size`` wins only UPWARD: it is floored at
    ``k*4`` (and ``k``), so a caller can widen the window but never
    shrink it below the recall-safe minimum — conservative by design
    (never loses recall; costs at most a 4k-row exact fetch).

    ``pq_ratio`` scales the pq window by code coarseness,
    (pq_ratio/4)^2, and lifts the absolute cap by pq_ratio/4: ADC rank
    displacement grows with dims-per-subspace, and the r12 high-dim
    smoke (200k x 1024, ratio 8, nlist=1024) measured default recall
    0.825 at the flat 4% window vs 0.946/0.984/0.998 at windows
    1000/2000/4096 — while the plain ivf cell read 1.000 at the same
    nprobe, pinning the whole gap on ADC error.  The quadratic rule
    puts ratio 8 at 16% of the pool (>=0.95 on that cell); ratio 4
    keeps the calibrated 4% exactly."""
    if rerank_size:
        return int(max(k, rerank_size, k * 4))
    frac = RERANK_POOL_FRAC.get(quant or "", 0.0)
    if not frac:
        return int(k * 4)
    cap = RERANK_WINDOW_CAP
    if quant == "pq" and pq_ratio > 4:
        coarse = (pq_ratio / 4.0) ** 2
        frac *= coarse
        cap = int(cap * pq_ratio / 4)
    return int(max(k * 4, min(int(frac * pool), cap)))
