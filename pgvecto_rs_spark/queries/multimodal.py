"""Multimodal queries over deterministic synthetic media: real
PPM/WAV/AVI codec paths reduced to integer-exact stats, knn and
perceptual near-dup."""

from __future__ import annotations

import math
import os
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgvecto_rs_spark.functions import binary as VB
from pgvecto_rs_spark.functions import dense as VD
from pgvecto_rs_spark.functions import sparse as VS
from pgvecto_rs_spark.operators import asof as OA
from pgvecto_rs_spark.operators import clustering as CL
from pgvecto_rs_spark.operators import curation as CU
from pgvecto_rs_spark.operators import dedup as DD
from pgvecto_rs_spark.operators import retrieval as RT
from pgvecto_rs_spark.operators import search as SR
from pgvecto_rs_spark.operators import textanalysis as TA

from pgvecto_rs_spark.queries._core import (  # noqa: F401
    DIMS,
    Q64,
    Q64_SQL,
    SPARSE_THRESHOLD,
    RANGE_RADIUS,
    STOPWORDS_SQL,
    QueryFn,
    register,
    _REGISTRY,
    _q_col,
    _tune,
    _emb,
    _docs,
    _events,
    _r4,
    _r4t,
    _scaled_sum,
    _SQL_L2,
    _SQL_DOT,
    _SQL_NORMSQ_E,
    _Q_NORM,
    _tmp_index_dir,
    _open_cached,
)




# ---------------------------------------------------------------------------
# 8m. multimodal (operators/multimodal.py): deterministic synthetic media
# payloads (PPM image / PCM WAV / MJPEG AVI, derived from doc_id alone) are
# pushed through the REAL codec paths — PPM decode + nearest-neighbor
# resize, stdlib-wave PCM decode, RIFF walk + baseline-JPEG decode — and the
# decoded values reduce to integer statistics a SQL oracle reproduces
# exactly.  This proves the Spark-side plumbing (binary columns, Arrow
# mapInPandas batches, fan-out schemas) end-to-end, not just in unit tests.
# Payload synthesis happens executor-side inside the same mapInPandas batch
# discipline, so nothing media-sized ever crosses the driver.
# ---------------------------------------------------------------------------


def _spread_ids(df: DataFrame) -> DataFrame:
    """Repartition the ids-only synth input so payload synthesis and the
    codec decode that follows parallelize: the sf-scale documents table
    arrives as ONE parquet file -> one partition, which would serialize
    the entire decode pipeline on a single core.  The exchange moves
    bare int64 ids (bytes never cross a shuffle), and at real scale —
    where inputs already have many partitions — it is a no-op-sized
    hedge, same rationale as dedup._spread."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < max(2, sc.defaultParallelism // 2):
        return df.repartition(sc.defaultParallelism)
    return df


def _fused_synth(docs: DataFrame, synth_op, *op_schemas) -> DataFrame:
    """ONE mapInPandas stage running ``synth_op`` and then each
    operator batch function (from the operators' ``*_op()`` factories)
    over the same batch iterator (guide §4): the synthesized payload
    never crosses a second Arrow boundary and the query pays one Python
    worker round trip instead of two or three.  The parse half IS the
    operator's own batch function — the real code path is identical by
    construction, not by duplication."""
    fns = [synth_op] + [op for op, _schema in op_schemas]
    schema = op_schemas[-1][1]

    def fused(it):
        for fn in fns:
            it = fn(it)
        return it

    return _spread_ids(docs).mapInPandas(fused, schema)


def _synth_ppm_payload(did: int, idx) -> bytes:
    """8x8 P6 PPM for doc ``did``: pixel v_i = (did*31 + i*7 + 13) % 256,
    r=g=b (so gray == v/255 exactly in float32 — see mm_image_stats
    oracle-boundary note).  ``idx`` is a reusable arange(64)."""
    import numpy as np

    v = ((did * 31 + idx * 7 + 13) % 256).astype(np.uint8)
    return b"P6\n8 8\n255\n" + bytes(np.repeat(v, 3))


def _quantize_1e4(feat) -> "np.ndarray":
    """int64 quantization of a decoded feature on the 1e4 grid,
    bit-identical to the old Catalyst column path: the float32 Arrow
    boundary (``array<float>``) then CAST(FLOOR(CAST(x AS DOUBLE)
    * 10000.0 + 0.5) AS BIGINT) — float32->double is exact and numpy's
    float64 *, + and floor are the same IEEE-754 ops Catalyst runs."""
    import numpy as np

    f32 = np.asarray(feat, dtype=np.float32).reshape(-1)
    return np.floor(f32.astype(np.float64) * 10000.0 + 0.5).astype(np.int64)


def _synth_decode_ppm_stats_op(it):
    """(doc_id, source) -> (source, s, m): fused synth + REAL PPM decode
    (multimodal._decode_image_bytes: P6 parse -> gray -> resize) + the
    1e4 per-pixel quantize and per-doc SUM/MAX, all in the task that
    built the image (guide §4) — one Python stage instead of two, no
    interpreted HOF lambdas, and no post-decode doc_id join just to
    attach ``source`` (it rides through the op)."""
    import numpy as np
    import pandas as pd

    from pgvecto_rs_spark.operators.multimodal import _decode_image_bytes

    idx = np.arange(64)
    for pdf in it:
        srcs, ss, ms = [], [], []
        for did, src in zip(pdf["doc_id"], pdf["source"]):
            feat = _decode_image_bytes(_synth_ppm_payload(int(did), idx), False)
            q = _quantize_1e4(feat)
            srcs.append(src)
            ss.append(int(q.sum()))
            ms.append(int(q.max()))
        yield pd.DataFrame(
            {
                "source": pd.Series(srcs, dtype="object"),
                "s": pd.Series(ss, dtype="int64"),
                "m": pd.Series(ms, dtype="int64"),
            }
        )


def _synth_decode_ppm_knn_op(it):
    """(doc_id) -> (doc_id, dist_q): fused synth + REAL PPM decode +
    1e4 quantize + exact int64 squared-L2 against the fixed query image
    (doc_id 123457's pixel formula, quantized on the same grid by the
    same ``math.floor`` expression the old Catalyst literal array used)
    — one Python stage; the JVM TakeOrderedAndProject consumes the
    16-byte (doc_id, dist_q) rows (guide §4)."""
    import math

    import numpy as np
    import pandas as pd

    from pgvecto_rs_spark.operators.multimodal import _decode_image_bytes

    idx = np.arange(64)
    qpx = np.array(
        [
            int(math.floor((123457 * 31 + i * 7 + 13) % 256 / 255.0 * 10000 + 0.5))
            for i in range(64)
        ],
        dtype=np.int64,
    )
    for pdf in it:
        ids, dists = [], []
        for did in pdf["doc_id"]:
            feat = _decode_image_bytes(_synth_ppm_payload(int(did), idx), False)
            d = _quantize_1e4(feat) - qpx
            ids.append(int(did))
            dists.append(int((d * d).sum()))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "dist_q": pd.Series(dists, dtype="int64"),
            }
        )


@register(
    "mm_image_stats",
    r"""
    WITH px AS (
      SELECT d.doc_id, d.source,
             CAST(FLOOR(((d.doc_id*31 + i*7 + 13) % 256) / 255.0 * 10000 + 0.5)
                  AS BIGINT) AS q
      FROM documents d, range(64) r(i)
    ), per_doc AS (
      SELECT doc_id, source, SUM(q) AS s, MAX(q) AS m
      FROM px GROUP BY doc_id, source
    )
    SELECT source,
           COUNT(*) AS n_images,
           CAST(SUM(s) AS BIGINT) AS sum_gray_q,
           CAST(MAX(m) AS BIGINT) AS max_gray_q
    FROM per_doc GROUP BY source
    """,
)
def mm_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image pipeline end-to-end: synthesize a deterministic 8x8 PPM per
    document, decode through the REAL codec path
    (multimodal.decode_image_features: P6 parse -> gray -> resize), and
    aggregate per-pixel grayscale quantized at 1e4 per source.

    Oracle-boundary safety: with r=g=b=v the decoded gray is
    float32(v/255); the exact value v*10000/255 is a multiple of 1/51,
    so its distance to any FLOOR(x+0.5) boundary is >= 1/102 ~ 9.8e-3
    while the float32 representation error is <= 6e-4 — both engines
    round identically for every v in 0..255 (verified exhaustively).

    r13 shape: synth, decode, quantize and the per-doc SUM/MAX are
    FUSED into one mapInPandas pass carrying ``source`` through (guide
    §4) — no second Python stage, no interpreted HOF lambdas, no
    post-decode join; only (source, s, m) rows reach the final
    partial-aggregated groupBy.  Decode still goes through the
    identical real codec path (multimodal._decode_image_bytes)."""
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    per_doc = _spread_ids(docs).mapInPandas(
        _synth_decode_ppm_stats_op, "source string, s bigint, m bigint"
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_images"),
        F.sum("s").cast("long").alias("sum_gray_q"),
        F.max("m").cast("long").alias("max_gray_q"),
    )


@register(
    "mm_image_knn",
    r"""
    WITH px AS (
      SELECT d.doc_id,
             CAST(FLOOR(((d.doc_id*31 + i*7 + 13) % 256) / 255.0 * 10000 + 0.5)
                  AS BIGINT)
             - CAST(FLOOR(((123457*31 + i*7 + 13) % 256) / 255.0 * 10000 + 0.5)
                    AS BIGINT) AS dq
      FROM documents d, range(64) r(i)
    )
    SELECT doc_id, CAST(SUM(dq*dq) AS BIGINT) AS dist_q
    FROM px GROUP BY doc_id
    ORDER BY dist_q, doc_id LIMIT 10
    """,
)
def mm_image_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal -> ANN handoff: decode every document's synthetic PPM
    through the REAL codec path, quantize the 64-dim grayscale feature
    to integers (the same 1e4 grid as mm_image_stats, so parity is
    exact), and run squared-L2 top-10 against a fixed query image
    (doc_id 123457's pixel formula) — decoded features are directly
    usable by the search layer, and the plan is the engine's top-k
    shape (TakeOrderedAndProject, no shuffle before the limit).

    r13 shape: synth, decode, quantize and the exact int64 squared-L2
    against the fixed query are FUSED into one mapInPandas pass (guide
    §4); only (doc_id, dist_q) rows leave the stage and the JVM top-k
    is unchanged.  Decode still goes through the identical real codec
    path (multimodal._decode_image_bytes)."""
    docs = _docs(spark, sf_dir).select("doc_id")
    per_doc = _spread_ids(docs).mapInPandas(
        _synth_decode_ppm_knn_op, "doc_id bigint, dist_q bigint"
    )
    return per_doc.orderBy("dist_q", "doc_id").limit(10)


def _synth_wav_op(it):
    """(doc_id) -> (doc_id, payload): mono 8-bit PCM WAV at 8 kHz,
    n = 64 + doc_id%32 samples, byte u_i = (doc_id*17 + i*29 + 5) % 256."""
    import struct

    import numpy as np
    import pandas as pd

    rate = 8000
    for pdf in it:
        payloads = []
        for did in pdf["doc_id"]:
            did = int(did)
            n = 64 + did % 32
            u = ((did * 17 + np.arange(n) * 29 + 5) % 256).astype(np.uint8)
            data = bytes(u)
            hdr = (
                b"RIFF"
                + struct.pack("<I", 36 + len(data))
                + b"WAVEfmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate, 1, 8)
                + b"data"
                + struct.pack("<I", len(data))
            )
            payloads.append(hdr + data)
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
        )


@register(
    "mm_audio_stats",
    r"""
    WITH sm AS (
      SELECT d.doc_id, i,
             (((d.doc_id*17 + i*29 + 5) % 256) - 128) AS s,
             (64 + d.doc_id % 32) AS n
      FROM documents d, range(96) r(i)
      WHERE i < 64 + d.doc_id % 32
    ), zz AS (
      SELECT doc_id, n, s,
             LEAD(s) OVER (PARTITION BY doc_id ORDER BY i) AS s2
      FROM sm
    )
    SELECT doc_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(MAX(n) AS BIGINT) AS n_samples,
           CAST(FLOOR(MAX(n) * 1000.0 / 8000.0) AS INT) AS duration_ms,
           CAST(SUM(s*s) AS BIGINT) AS energy,
           CAST(SUM(CASE WHEN s*s2 < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS zero_crossings
    FROM zz GROUP BY doc_id
    """,
)
def mm_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio pipeline end-to-end: synthesize a deterministic 8-bit PCM
    WAV per document, decode through the REAL stdlib-wave path, and
    emit exact integer statistics (energy = sum s^2, strict sign-flip
    zero crossings).  8-bit PCM decodes to (u-128)/128 — dyadic — so
    the integer sample is recovered exactly and the oracle needs no
    floating-point tolerance at all (the multimodal analogue of the
    scaled-integer SUM discipline used by the TPC-H oracles).

    r13 shape: synth and decode run as ONE fused Python stage
    (_fused_synth, guide §4) through decode_audio_stats' own batch
    function."""
    import pgvecto_rs_spark.operators.multimodal as MM

    docs = _docs(spark, sf_dir).select("doc_id")
    return _fused_synth(
        docs, _synth_wav_op, MM.decode_audio_stats_op(id_col="doc_id")
    )


def _synth_wav_groups_op(it):
    """(doc_id) -> (doc_id, payload): mono 8-bit PCM WAVs in near-dup
    groups of 4 (base g = doc_id - doc_id%4, variant d = doc_id%4),
    all group members n = 64 + g%32 samples:
    d in {0,1}: u_i = H(g*96 + i), with u_0 += 16 (mod 256) when d==1
                (the planted single-sample near-dup)
    d in {2,3}: u_i = H(doc_id*96 + i)   (per-doc unrelated signals)
    where H is the avalanche byte hash ``_synth_hash_bytes`` (96 > max
    n = 95, so x is injective across docs).  Same r10 rationale as the
    PPM fixture: the old affine formulas collapsed the energy-envelope
    hash space and near-dup PAIR COUNTS GREW QUADRATICALLY in corpus
    size (measured 74,876 pairs at 5k docs -> 7.7M at 50k; now 1,249
    -> 12,495, exactly the planted groups)."""
    import struct

    import numpy as np
    import pandas as pd

    rate = 8000
    for pdf in it:
        payloads = []
        for did in pdf["doc_id"]:
            did = int(did)
            g, d = did - did % 4, did % 4
            n = 64 + g % 32
            i = np.arange(n, dtype=np.int64)
            x = (did if d >= 2 else g) * 96 + i
            u = _synth_hash_bytes(x)
            if d == 1:
                u = u.copy()
                u[0] = (u[0] + 16) % 256
            data = bytes(u.astype(np.uint8))
            hdr = (
                b"RIFF"
                + struct.pack("<I", 36 + len(data))
                + b"WAVEfmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate, 1, 8)
                + b"data"
                + struct.pack("<I", len(data))
            )
            payloads.append(hdr + data)
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
        )


@register(
    "mm_audio_neardup",
    r"""
    WITH sm AS (
      SELECT d.doc_id, r.i,
             (64 + (d.doc_id - d.doc_id % 4) % 32) AS n,
             (CASE WHEN d.doc_id % 4 >= 2 THEN d.doc_id
                   ELSE d.doc_id - d.doc_id % 4 END) * 96 + r.i + 1 AS x
      FROM documents d, range(96) r(i)
      WHERE r.i < 64 + (d.doc_id - d.doc_id % 4) % 32
    ), ah1 AS (
      SELECT doc_id, i, n,
             (xor(x, x // 65536) * 569547437) % 4294967296 AS h
      FROM sm
    ), ah2 AS (
      SELECT doc_id, i, n,
             (xor(h, h // 32768) * 1935099287) % 4294967296 AS h
      FROM ah1
    ), sv AS (
      SELECT doc_id, i, n,
        (xor(h, h // 32768) % 256
         + CASE WHEN doc_id % 4 = 1 AND i = 0 THEN 16 ELSE 0 END) % 256
        - 128 AS s
      FROM ah2
    ), fe AS (
      SELECT doc_id, (i*64)//n AS f, SUM(s*s) AS e
      FROM sv GROUP BY doc_id, (i*64)//n
    ), te AS (
      SELECT doc_id, SUM(e) AS tot FROM fe GROUP BY doc_id
    ), sig AS (
      SELECT fe.doc_id,
        CAST(SUM(CASE WHEN 64*e > tot AND f < 32
                      THEN (CAST(1 AS BIGINT) << f) ELSE 0 END) AS BIGINT) AS lo,
        CAST(SUM(CASE WHEN 64*e > tot AND f >= 32
                      THEN (CAST(1 AS BIGINT) << (f-32)) ELSE 0 END) AS BIGINT) AS hi
      FROM fe JOIN te ON fe.doc_id = te.doc_id GROUP BY fe.doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS INT)
             AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
    """,
)
def mm_audio_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup end-to-end: synthesize grouped 8-bit PCM WAVs
    (each group of 4 doc_ids shares a base signal; one variant perturbs
    a single sample, two are unrelated), decode through the REAL
    stdlib-wave path, fingerprint with the integer-exact 64-frame
    energy-envelope hash (multimodal.audio_hashes_df), and find every
    pair within Hamming distance 3 via the shared banded-pigeonhole
    join (dedup.hamming_candidate_pairs).  The oracle replays the full
    pipeline in integer SQL (samples -> frame energies via
    f = i*64 // n -> strict cross-multiplied mean bits -> two 32-bit
    halves -> XOR popcount all-pairs), so parity is exact and
    deterministic — certifying the banding join finds EVERY pair
    within the radius on audio fingerprints too.  Fixture samples are
    avalanche-hashed (r10, `_synth_hash_bytes`) so pair counts scale
    linearly in corpus size — see `_synth_wav_groups_op`.  max_bucket
    sits above the corpus's worst band bucket so none is dropped; the
    only shuffle is the band-key exchange on 64-bit signatures, never
    on samples.

    r13 shape: synth, WAV decode and the energy-envelope hash run as
    ONE fused Python stage (_fused_synth through audio_hashes_df's own
    batch function, guide §4); only 16-byte signature rows leave it,
    and the banded join is unchanged."""
    import pgvecto_rs_spark.operators.multimodal as MM
    from pgvecto_rs_spark.operators.dedup import hamming_candidate_pairs

    docs = _docs(spark, sf_dir).select("doc_id")
    sig = _fused_synth(
        docs, _synth_wav_groups_op, MM.audio_hashes_op(id_col="doc_id")
    )
    return hamming_candidate_pairs(sig, max_hamming=3, max_bucket=100_000)


def _synth_sample_decode_avi_op(it):
    """(doc_id) -> (doc_id, n_sampled, max_frame_no, n_px): the fused
    form of :func:`_synth_avi_op` + ``sample_video_frames(every_n=2)``
    + ``decode_image_features`` + the two per-doc aggregates — same
    synthetic MJPEG AVI, same REAL RIFF walk (operators.video), same
    REAL per-frame JPEG decode (_decode_image_bytes), but one pass."""
    import numpy as np
    import pandas as pd

    from pgvecto_rs_spark.operators.multimodal import _decode_image_bytes
    from pgvecto_rs_spark.operators.video import decode_avi_frames, encode_mjpeg_avi

    for pdf in it:
        ids, ns, mx, px = [], [], [], []
        for did in pdf["doc_id"]:
            did = int(did)
            nf = 1 + did % 4
            frames = [
                np.full((8, 8), 32 * f + 16, dtype=np.uint8) for f in range(nf)
            ]
            payload = encode_mjpeg_avi(frames)
            sampled = [
                (fno, jpeg)
                for fno, jpeg in enumerate(decode_avi_frames(payload))
                if fno % 2 == 0
            ]
            n_px = sum(
                _decode_image_bytes(jpeg, False).reshape(-1).size
                for _fno, jpeg in sampled
            )
            ids.append(did)
            ns.append(len(sampled))
            mx.append(max(fno for fno, _ in sampled))
            px.append(n_px)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_sampled": pd.Series(ns, dtype="int64"),
                "max_frame_no": pd.Series(mx, dtype="int32"),
                "n_px": pd.Series(px, dtype="int64"),
            }
        )


@register(
    "mm_video_frames",
    r"""
    WITH v AS (SELECT doc_id, (1 + doc_id % 4) AS nf FROM documents)
    SELECT doc_id,
           CAST((nf + 1) // 2 AS BIGINT) AS n_sampled,
           CAST(((nf - 1) // 2) * 2 AS INT) AS max_frame_no,
           CAST(((nf + 1) // 2) * 64 AS BIGINT) AS n_px
    FROM v
    """,
)
def mm_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video pipeline end-to-end: synthesize an MJPEG AVI per document
    (real baseline-JPEG frames), frame-sample every 2nd frame through
    the REAL RIFF walk (multimodal.sample_video_frames), then decode
    every sampled frame through the REAL JPEG path
    (decode_image_features) and count decoded pixels.  The oracle
    checks the structural invariants that are SQL-expressible exactly
    (sampled-frame count, max sampled frame index, total decoded
    pixels); pixel values round-trip a lossy DCT so they are covered by
    unit tests, not the SQL oracle.

    r13 shape: synth, RIFF walk, frame sampling and the per-frame JPEG
    decode are FUSED into one mapInPandas pass (guide §4) — the old
    plan's `sampled` lineage fed two branches (counts and decode), so
    the uncached synth + RIFF walk executed twice, and the two per-doc
    aggregates met again in a doc_id join.  Decode still goes through
    the identical real paths (operators.video RIFF walk,
    operators.jpeg via _decode_image_bytes); video bytes never leave
    the task that synthesized them."""
    docs = _docs(spark, sf_dir).select("doc_id")
    return _spread_ids(docs).mapInPandas(
        _synth_sample_decode_avi_op,
        "doc_id bigint, n_sampled bigint, max_frame_no int, n_px bigint",
    )


def _synth_decode_jpeg_pair_op(it):
    """(doc_id, source) -> (source, eq, n_px): the fused form of
    :func:`_synth_jpeg_pair_op` + two ``decode_image_features`` passes
    + the equality join — same deterministic image, same encoder
    parameter cycling, same real decode path, but synth, both decodes
    and the baseline-vs-progressive comparison all happen in the task
    that created the payload, so no image bytes ever leave it.  eq
    compares the float32 feature vectors (what the old array<float>
    column equality compared)."""
    import numpy as np
    import pandas as pd

    from pgvecto_rs_spark.operators.jpeg import encode_jpeg
    from pgvecto_rs_spark.operators.multimodal import _decode_image_bytes

    idx = np.arange(64)
    for pdf in it:
        eqs, npx = [], []
        for did in pdf["doc_id"]:
            did = int(did)
            v = ((did * 31 + idx * 7 + 13) % 256).astype(np.uint8).reshape(8, 8)
            ri = did % 3
            if did % 2:
                img = np.stack([v, np.ascontiguousarray(v.T), 255 - v], axis=2)
                sub = ("444", "422", "420")[did % 3]
                b = encode_jpeg(img, subsample=sub, restart_interval=ri)
                p = encode_jpeg(img, subsample=sub, restart_interval=ri, progressive=True)
            else:
                b = encode_jpeg(v, restart_interval=ri)
                p = encode_jpeg(v, restart_interval=ri, progressive=True)
            fb = _decode_image_bytes(b, False).reshape(-1).astype(np.float32)
            fp = _decode_image_bytes(p, False).reshape(-1).astype(np.float32)
            eqs.append(int(np.array_equal(fb, fp)))
            npx.append(len(fp))
        yield pd.DataFrame({"source": pdf["source"], "eq": eqs, "n_px": npx})


@register(
    "mm_image_progressive",
    r"""
    SELECT source,
           COUNT(*) AS n_images,
           COUNT(*) AS n_equal,
           CAST(COUNT(*) * 64 AS BIGINT) AS n_px
    FROM documents GROUP BY source
    """,
)
def mm_image_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progressive-JPEG ingest end-to-end (r6 verdict gap #2): every
    document's synthetic image is encoded BOTH baseline (SOF0) and
    progressive (SOF2) — cycling gray/color, chroma subsampling and
    restart intervals — and both payloads decode through the REAL codec
    path (multimodal.decode_image_features -> operators.jpeg).  The
    query certifies, per source, that every progressive decode is
    BIT-IDENTICAL to its baseline twin (n_equal == n_images — the scan
    script quantizes identically, so any progressive bug breaks
    equality) and that all 64 pixels decoded (n_px).  The oracle states
    those invariants in exact SQL; pixel-level decode parity is pinned
    by the codec unit tests.

    r13 shape: synth + both decodes + the equality test are FUSED into
    one mapInPandas pass (guide §4) — the old plan ran the synth op
    once per decode branch (media was uncached, so the lineage executed
    twice), paid three Arrow-stage latencies, and shuffled both feature
    tables through a doc_id join just to compare rows that were born in
    the same task.  Decode still goes through the identical real codec
    path (operators.jpeg via _decode_image_bytes); features compare as
    float32, exactly what the old array<float> column equality saw."""
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    per_doc = _spread_ids(docs).mapInPandas(
        _synth_decode_jpeg_pair_op, "source string, eq bigint, n_px bigint"
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_images"),
        F.sum("eq").cast("long").alias("n_equal"),
        F.sum("n_px").cast("long").alias("n_px"),
    )


def _synth_decode_gif_stats_op(it):
    """(doc_id, source) -> (source, s, m): fused GIF synth + REAL GIF
    decode (multimodal._decode_image_bytes -> _decode_gif) + the 1e4
    quantize and per-doc SUM/MAX in one pass (guide §4), ``source``
    riding through instead of a post-decode join.

    Synth: 8x8 single-frame GIF with a 16-color grayscale palette
    g(j) = (j*17 + 5) % 256 (r=g=b) and indices
    idx_i = (doc_id*13 + i*5 + 3) % 16; interlace and local-palette
    modes cycle by doc_id, so the gate covers every container variant
    (values are identical across them — GIF is lossless)."""
    import numpy as np
    import pandas as pd

    from pgvecto_rs_spark.operators.multimodal import (
        _decode_image_bytes,
        encode_gif,
    )

    pal = np.stack([(np.arange(16) * 17 + 5) % 256] * 3, axis=1).astype(np.uint8)
    i64 = np.arange(64)
    for pdf in it:
        srcs, ss, ms = [], [], []
        for did, src in zip(pdf["doc_id"], pdf["source"]):
            did = int(did)
            idxs = ((did * 13 + i64 * 5 + 3) % 16).astype(np.uint8).reshape(8, 8)
            payload = encode_gif(
                idxs, pal,
                interlace=bool(did % 2),
                local_palette=did % 3 == 0,
            )
            q = _quantize_1e4(_decode_image_bytes(payload, False))
            srcs.append(src)
            ss.append(int(q.sum()))
            ms.append(int(q.max()))
        yield pd.DataFrame(
            {
                "source": pd.Series(srcs, dtype="object"),
                "s": pd.Series(ss, dtype="int64"),
                "m": pd.Series(ms, dtype="int64"),
            }
        )


@register(
    "mm_image_gif",
    r"""
    WITH px AS (
      SELECT d.doc_id, d.source,
             CAST(FLOOR((((d.doc_id*13 + i*5 + 3) % 16) * 17 + 5) % 256
                        / 255.0 * 10000 + 0.5) AS BIGINT) AS q
      FROM documents d, range(64) r(i)
    ), per_doc AS (
      SELECT doc_id, source, SUM(q) AS s, MAX(q) AS m
      FROM px GROUP BY doc_id, source
    )
    SELECT source,
           COUNT(*) AS n_images,
           CAST(SUM(s) AS BIGINT) AS sum_gray_q,
           CAST(MAX(m) AS BIGINT) AS max_gray_q
    FROM per_doc GROUP BY source
    """,
)
def mm_image_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF ingest end-to-end: a deterministic single-frame GIF per
    document (variable-width LZW for real; interlace and local-palette
    variants cycled by doc_id) decoded through the REAL codec path
    (multimodal._decode_gif), aggregated per source on the same 1e4
    quantization grid as mm_image_stats.  GIF is LOSSLESS, so the
    oracle replays the exact pixel function in SQL — the value-exact
    counterpart to mm_image_progressive's structural oracle.  Oracle
    boundary safety: identical r=g=b mean argument as mm_image_stats
    (values are multiples of 1/51 on the 1e4 grid, boundary distance
    >= 1/102 vs <= 6e-4 float32 error).

    r13 shape: synth, decode, quantize and the per-doc SUM/MAX are
    FUSED into one mapInPandas pass carrying ``source`` through (guide
    §4) — same cure as mm_image_stats; decode still goes through the
    identical real codec path (multimodal._decode_gif)."""
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    per_doc = _spread_ids(docs).mapInPandas(
        _synth_decode_gif_stats_op, "source string, s bigint, m bigint"
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_images"),
        F.sum("s").cast("long").alias("sum_gray_q"),
        F.max("m").cast("long").alias("max_gray_q"),
    )


def _synth_gif_anim_op(it):
    """(doc_id) -> (doc_id, payload): animated GIF with
    nf = 1 + doc_id % 4 full-screen 8x8 frames; frame f's indices are
    (doc_id*13 + f*7 + i*5 + 3) % 16 over the same 16-gray palette as
    _synth_decode_gif_stats_op.  Full-screen opaque frames make every composited
    canvas equal its own frame — value-exact under sampling."""
    import numpy as np
    import pandas as pd

    from pgvecto_rs_spark.operators.multimodal import encode_gif_animation

    pal = np.stack([(np.arange(16) * 17 + 5) % 256] * 3, axis=1).astype(np.uint8)
    i64 = np.arange(64)
    for pdf in it:
        payloads = []
        for did in pdf["doc_id"]:
            did = int(did)
            nf = 1 + did % 4
            frames = [
                {
                    "indices": ((did * 13 + f * 7 + i64 * 5 + 3) % 16)
                    .astype(np.uint8)
                    .reshape(8, 8)
                }
                for f in range(nf)
            ]
            payloads.append(encode_gif_animation(frames, pal, (8, 8)))
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
        )


def _gif_frame_quant_op(it):
    """(doc_id, frame_no, frame_payload) -> (doc_id, frame_no, s): the
    decode+quantize leg of mm_gif_frames — the REAL image decode
    (multimodal._decode_image_bytes over the sampled PPM frames) and
    the same bit-identical 1e4 quantized per-frame sum the old Catalyst
    column path produced (see :func:`_quantize_1e4`).  Emitting
    (doc_id, frame_no, s) directly also retires the old id-packing
    workaround (doc_id*1000 + frame_no) that carried frame_no through
    decode_image_features' (id, feature) schema."""
    import pandas as pd

    from pgvecto_rs_spark.operators.multimodal import _decode_image_bytes

    for pdf in it:
        ss = [
            int(_quantize_1e4(_decode_image_bytes(bytes(b), False)).sum())
            for b in pdf["frame_payload"]
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "frame_no": pdf["frame_no"].astype("int32"),
                "s": pd.Series(ss, dtype="int64"),
            }
        )


@register(
    "mm_gif_frames",
    r"""
    WITH v AS (SELECT doc_id, (1 + doc_id % 4) AS nf FROM documents),
    sampled AS (
      SELECT v.doc_id, f.f
      FROM v, range(4) f(f)
      WHERE f.f < v.nf AND f.f % 2 = 0
    ), px AS (
      SELECT s.doc_id, s.f,
             CAST(FLOOR((((s.doc_id*13 + s.f*7 + i*5 + 3) % 16) * 17 + 5) % 256
                        / 255.0 * 10000 + 0.5) AS BIGINT) AS q
      FROM sampled s, range(64) r(i)
    )
    SELECT doc_id,
           CAST(COUNT(DISTINCT f) AS BIGINT) AS n_sampled,
           CAST(MAX(f) AS INT) AS max_frame_no,
           CAST(SUM(q) AS BIGINT) AS sum_gray_q
    FROM px GROUP BY doc_id
    """,
)
def mm_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Animated-GIF sampling end-to-end: per document an animation of
    1 + doc_id%4 full-screen frames, every 2nd frame sampled through
    the REAL compositing path (multimodal._gif_frames via
    sample_video_frames, re-emitted as PPM), decoded through the REAL
    image path, and reduced to per-doc (n_sampled, max_frame_no,
    sum_gray_q).  GIF is lossless and the frames are full-screen
    opaque, so the oracle replays the exact per-frame pixel function —
    the value-exact animated counterpart to mm_video_frames' structural
    oracle (MJPEG is lossy).

    r13 shape: synth, GIF compositing/sampling and the per-frame
    decode+quantize run as ONE fused Python stage (_fused_synth
    chaining sample_video_frames' own batch function and
    _gif_frame_quant_op, guide §4) — down from THREE Python stages;
    only (doc_id, frame_no, s) rows reach the JVM groupBy."""
    import pgvecto_rs_spark.operators.multimodal as MM

    docs = _docs(spark, sf_dir).select("doc_id")
    per_frame = _fused_synth(
        docs, _synth_gif_anim_op,
        MM.sample_video_frames_op(id_col="doc_id", every_n=2),
        (_gif_frame_quant_op, "doc_id bigint, frame_no int, s bigint"),
    )
    return per_frame.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_sampled"),
        F.max("frame_no").cast("int").alias("max_frame_no"),
        F.sum("s").cast("long").alias("sum_gray_q"),
    )


def _synth_hash_bytes(x):
    """lowbias32-style avalanche hash -> one byte per element of ``x``
    (int64 numpy array; every step fits int64 and is replayed verbatim
    by the oracle SQL with xor()/// arithmetic).  An avalanche hash is
    REQUIRED here, not a nicety: affine pixel formulas (r9 fixture) or
    multiplicative-only hashes leave aHash signatures correlated — the
    r9 affine pattern had only 64 distinct base images at ANY corpus
    size, so near-dup pair counts grew QUADRATICALLY in rows (measured:
    13.5k pairs at 5k docs -> 1.17M at 50k); with this hash the counts
    are the planted ones, linear in rows (1,236 -> 12,340)."""
    M32 = 4294967296
    h = (x + 1) % M32
    h = ((h ^ (h // 65536)) * 569547437) % M32
    h = ((h ^ (h // 32768)) * 1935099287) % M32
    return (h ^ (h // 32768)) % 256


def _synth_ppm_groups_op(it):
    """(doc_id) -> (doc_id, payload): 8x8 P6 PPM in near-dup groups of
    4 (base g = doc_id - doc_id%4, variant d = doc_id%4), r=g=b:
    d in {0,1}: v_i = H(g*64 + i), with v_0 += 128 (mod 256) when d==1
                (the planted single-pixel near-dup)
    d in {2,3}: v_i = H(doc_id*64 + i)   (per-doc unrelated images)
    where H is the avalanche byte hash ``_synth_hash_bytes`` — see its
    docstring for why pseudorandom pixels (not affine patterns) are
    load-bearing for SCALING, not just correctness."""
    import numpy as np
    import pandas as pd

    idx = np.arange(64, dtype=np.int64)
    for pdf in it:
        payloads = []
        for did in pdf["doc_id"]:
            did = int(did)
            g, d = did - did % 4, did % 4
            x = (did if d >= 2 else g) * 64 + idx
            v = _synth_hash_bytes(x)
            if d == 1:
                v = v.copy()
                v[0] = (v[0] + 128) % 256
            payloads.append(b"P6\n8 8\n255\n" + bytes(np.repeat(v.astype(np.uint8), 3)))
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
        )


@register(
    "mm_image_neardup",
    r"""
    WITH xs AS (
      SELECT d.doc_id, r.i,
        (CASE WHEN d.doc_id % 4 >= 2 THEN d.doc_id
              ELSE d.doc_id - d.doc_id % 4 END) * 64 + r.i + 1 AS x
      FROM documents d, range(64) r(i)
    ), hh1 AS (
      SELECT doc_id, i, (xor(x, x // 65536) * 569547437) % 4294967296 AS h
      FROM xs
    ), hh2 AS (
      SELECT doc_id, i, (xor(h, h // 32768) * 1935099287) % 4294967296 AS h
      FROM hh1
    ), px AS (
      SELECT doc_id, i,
        (xor(h, h // 32768) % 256
         + CASE WHEN doc_id % 4 = 1 AND i = 0 THEN 128 ELSE 0 END) % 256 AS v
      FROM hh2
    ), s AS (
      SELECT doc_id, i, v, SUM(v) OVER (PARTITION BY doc_id) AS sv FROM px
    ), sig AS (
      SELECT doc_id,
        CAST(SUM(CASE WHEN 64*v > sv AND i < 32
                      THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS lo,
        CAST(SUM(CASE WHEN 64*v > sv AND i >= 32
                      THEN (CAST(1 AS BIGINT) << (i-32)) ELSE 0 END) AS BIGINT) AS hi
      FROM s GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS INT)
             AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
    """,
)
def mm_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup end-to-end: synthesize grouped 8x8 PPMs (each
    group of 4 doc_ids shares a base image; one variant perturbs a
    single pixel, two are unrelated), decode through the REAL codec
    path, fingerprint with the integer-exact 64-bit aHash
    (multimodal.image_hashes_df), and find every pair within Hamming
    distance 3 via the shared banded-pigeonhole join
    (dedup.hamming_candidate_pairs — the same engine as SimHash text
    near-dup, complete within the radius).  The oracle replays the
    full pipeline in integer SQL (pixels -> strict-mean bits -> two
    32-bit halves -> XOR popcount all-pairs), so parity is exact and
    deterministic — this certifies the banding join itself finds
    EVERY pair, not just the planted ones.  The fixture pixels are
    avalanche-hashed (r10, `_synth_hash_bytes`) so pair counts scale
    LINEARLY in corpus size — the r9 affine pattern collapsed to 64
    distinct base images and made pairs (and band buckets) quadratic.
    max_bucket stays far above the worst observed band bucket so no
    bucket is dropped; the only shuffle is the band-key exchange on
    64-bit signatures, never on pixels.

    r13 shape: synth, decode and aHash run as ONE fused Python stage
    (_fused_synth through image_hashes_df's own batch function, guide
    §4); only 16-byte signature rows leave it, and the banded join is
    unchanged."""
    import pgvecto_rs_spark.operators.multimodal as MM
    from pgvecto_rs_spark.operators.dedup import hamming_candidate_pairs

    docs = _docs(spark, sf_dir).select("doc_id")
    sig = _fused_synth(
        docs, _synth_ppm_groups_op,
        MM.image_hashes_op(id_col="doc_id", method="ahash"),
    )
    return hamming_candidate_pairs(sig, max_hamming=3, max_bucket=100_000)


def _synth_mp4_op(it):
    """(doc_id) -> (doc_id, payload): structurally standard MP4
    (operators/mp4.encode_mp4) with 1 + doc_id%5 fake-AVC samples;
    sizes, durations, composition offsets, keyframe pattern, timescale
    and geometry are all integer functions of (doc_id, sample index)
    so a SQL oracle recomputes the whole sample index exactly:
      size_i = 16 + (doc_id*7 + i*11) % 32
      dur_i  = 100 + 20*((doc_id + i) % 3)
      cts_i  = 40*(i % 2);  keyframe_i = (i % 3 == 0)
      timescale = 600 + 100*(doc_id % 3)
      width = 160 + 16*(doc_id % 4); height = 120 + 8*(doc_id % 3)
    Chunking is 2 samples/chunk; every 7th doc uses co64 offsets so
    both chunk-offset widths stay exercised."""
    import pandas as pd

    from pgvecto_rs_spark.operators.mp4 import encode_mp4

    for pdf in it:
        payloads = []
        for did in pdf["doc_id"]:
            did = int(did)
            nf = 1 + did % 5
            sizes = [16 + (did * 7 + i * 11) % 32 for i in range(nf)]
            pls = [
                bytes(((did + i + k) % 256) for k in range(sz))
                for i, sz in enumerate(sizes)
            ]
            payloads.append(
                encode_mp4(
                    pls,
                    durations=[100 + 20 * ((did + i) % 3) for i in range(nf)],
                    cts_offsets=[40 * (i % 2) for i in range(nf)],
                    keyframes=[i % 3 == 0 for i in range(nf)],
                    timescale=600 + 100 * (did % 3),
                    width=160 + 16 * (did % 4),
                    height=120 + 8 * (did % 3),
                    samples_per_chunk=2,
                    co64=(did % 7 == 0),
                )
            )
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
        )


_MP4_SAMPLE_CTE = r"""
    WITH v AS (SELECT doc_id, (1 + doc_id % 5) AS nf FROM documents),
    s AS (
      SELECT v.doc_id, v.nf, CAST(u.i AS INT) AS i,
             CAST(16 + (v.doc_id*7 + u.i*11) % 32 AS BIGINT) AS byte_len,
             CAST(100 + 20*((v.doc_id + u.i) % 3) AS BIGINT) AS dur,
             CAST(40*(u.i % 2) AS BIGINT) AS cts
      FROM v, unnest(range(0, v.nf)) AS u(i)
    ), w AS (
      SELECT doc_id, nf, i, byte_len, cts,
             CAST(COALESCE(SUM(dur) OVER (PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS dts,
             CAST(32 + COALESCE(SUM(byte_len) OVER (PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS byte_off,
             CAST(SUM(dur) OVER (PARTITION BY doc_id) AS BIGINT) AS duration
      FROM s
    )
"""


@register(
    "mm_mp4_index",
    _MP4_SAMPLE_CTE
    + r"""
    SELECT doc_id,
           CAST(i + 1 AS INT) AS sample_no,
           dts,
           CAST(dts + cts AS BIGINT) AS pts,
           byte_off,
           byte_len,
           (i % 3 = 0) AS keyframe,
           'avc1' AS codec,
           CAST(160 + 16*(doc_id % 4) AS INT) AS width,
           CAST(120 + 8*(doc_id % 3) AS INT) AS height,
           CAST(600 + 100*(doc_id % 3) AS BIGINT) AS timescale,
           duration
    FROM w
    """,
)
def mm_mp4_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4 container indexing end-to-end: synthesize a structurally
    standard single-track MP4 per document (real ftyp/mdat/moov with
    full stts/ctts/stss/stsc/stsz/stco|co64 tables), then recover the
    complete per-sample index — decode and presentation timestamps,
    byte extents, sync flags, codec/geometry/timescale — through the
    REAL box walk (multimodal.index_video_samples over operators/
    mp4.py).  Every output is an integer the oracle recomputes from
    the synthesis formulas, so parity is value-exact: this certifies
    the stts run-length expansion, ctts composition offsets, the
    stsc x stco/co64 chunk walk (2 samples/chunk, both offset widths),
    and stss keyframe resolution — everything frame sampling at 100 TB
    needs short of pixel decode (the documented ffmpeg seam).
    Reference parity: N/A (no media surface in the reference).

    r13 shape: synth and the box walk run as ONE fused Python stage
    (_fused_synth through index_video_samples' own batch function,
    guide §4)."""
    import pgvecto_rs_spark.operators.multimodal as MM

    docs = _docs(spark, sf_dir).select("doc_id")
    idx = _fused_synth(
        docs, _synth_mp4_op, MM.index_video_samples_op(id_col="doc_id")
    )
    return idx.select(
        "doc_id",
        "sample_no",
        "dts",
        "pts",
        F.col("offset").alias("byte_off"),
        F.col("size").alias("byte_len"),
        "keyframe",
        "codec",
        "width",
        "height",
        "timescale",
        "duration",
    )


@register(
    "mm_mp4_sample",
    _MP4_SAMPLE_CTE
    + r"""
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(MAX(i) AS INT) AS max_frame_no,
           CAST(SUM(byte_len) AS BIGINT) AS sum_bytes
    FROM w WHERE i % 2 = 0 GROUP BY doc_id
    """,
)
def mm_mp4_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4 frame sampling end-to-end: every 2nd sample of each
    synthetic MP4 is extracted through the REAL container path
    (sample_video_frames slices each sampled access unit out of mdat
    at its stbl-resolved offset/size).  The oracle recomputes sampled
    counts, last sampled index, and total extracted bytes from the
    synthesis formulas — value-exact, certifying the sampling stride
    and the byte-extent slicing; the unit tests additionally pin the
    extracted BYTES to the synthesized access units.

    r13 shape: synth and the container-level sampling run as ONE fused
    Python stage (_fused_synth through sample_video_frames' own batch
    function, guide §4)."""
    import pgvecto_rs_spark.operators.multimodal as MM

    docs = _docs(spark, sf_dir).select("doc_id")
    sampled = _fused_synth(
        docs, _synth_mp4_op,
        MM.sample_video_frames_op(id_col="doc_id", every_n=2),
    )
    return sampled.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_sampled"),
        F.max("frame_no").cast("int").alias("max_frame_no"),
        F.sum(F.length("frame_payload")).cast("long").alias("sum_bytes"),
    )


def _synth_flac_op(it):
    """(doc_id) -> (doc_id, payload): 16-bit mono FLAC at 16 kHz,
    n = 100 + doc_id%50 samples, s_i = ((doc_id*31 + i*i*7 + i*13)
    % 4001) - 2000; every 7th doc is a flat clip (s = doc_id%200 - 100)
    so CONSTANT subframes stay exercised.  blocksize 64 -> 2-3 frames
    per clip; mode='fixed' -> real Rice-coded FIXED predictors."""
    import numpy as np
    import pandas as pd

    from pgvecto_rs_spark.operators.flac import encode_flac

    for pdf in it:
        payloads = []
        for did in pdf["doc_id"]:
            did = int(did)
            n = 100 + did % 50
            if did % 7 == 0:
                s = np.full(n, did % 200 - 100, dtype=np.int32)
            else:
                i = np.arange(n, dtype=np.int64)
                s = ((did * 31 + i * i * 7 + i * 13) % 4001 - 2000).astype(
                    np.int32
                )
            payloads.append(
                encode_flac(s, rate=16000, bps=16, blocksize=64, mode="fixed")
            )
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
        )


@register(
    "mm_audio_flac",
    r"""
    WITH sm AS (
      SELECT d.doc_id, r.i,
             CASE WHEN d.doc_id % 7 = 0 THEN d.doc_id % 200 - 100
                  ELSE (d.doc_id*31 + r.i*r.i*7 + r.i*13) % 4001 - 2000
             END AS s,
             (100 + d.doc_id % 50) AS n
      FROM documents d, range(150) r(i)
      WHERE r.i < 100 + d.doc_id % 50
    ), zz AS (
      SELECT doc_id, n, s,
             LEAD(s) OVER (PARTITION BY doc_id ORDER BY i) AS s2
      FROM sm
    )
    SELECT doc_id,
           CAST(16000 AS INT) AS sample_rate,
           CAST(MAX(n) AS BIGINT) AS n_samples,
           CAST(FLOOR(MAX(n) * 1000.0 / 16000.0) AS INT) AS duration_ms,
           CAST(SUM(s*s) AS BIGINT) AS energy,
           CAST(SUM(CASE WHEN s*s2 < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS zero_crossings
    FROM zz GROUP BY doc_id
    """,
)
def mm_audio_flac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAC pipeline end-to-end (r8): synthesize a deterministic 16-bit
    mono FLAC per document (REAL compression — Rice-coded FIXED
    predictors, CONSTANT blocks on flat clips, multiple frames per
    stream, CRC-8/16 verified), decode through the full bitstream path
    (operators/flac.py via multimodal._decode_audio_bytes), and emit
    exact integer statistics.  FLAC is lossless, so unlike the MJPEG
    structural oracle this one is value-exact: energy and strict
    sign-flip zero crossings replay the synthesis formula in pure SQL
    with zero tolerance.  Reference parity: N/A (no media surface in
    the reference).

    r13 shape: FLAC encode and decode run as ONE fused Python stage
    (_fused_synth through decode_audio_stats' own batch function,
    guide §4)."""
    import pgvecto_rs_spark.operators.multimodal as MM

    docs = _docs(spark, sf_dir).select("doc_id")
    return _fused_synth(
        docs, _synth_flac_op, MM.decode_audio_stats_op(id_col="doc_id")
    )


def _synth_flac_stereo_op(it):
    """(doc_id) -> (doc_id, payload): 16-bit STEREO FLAC at 16 kHz,
    n = 96 + doc_id%64 samples, L_i = ((doc_id*37 + i*i*11 + i*17)
    % 3001) - 1500, R_i = ((doc_id*53 + i*i*5 + i*29) % 3001) - 1500.
    blocksize 32 -> 3-5 frames; stereo_mode='decorr' cycles the frame
    channel assignment left/side -> right/side -> mid/side ->
    independent, and mode='lpc' codes order-2 quantized-coefficient
    LPC subframes — the decode paths the r8 driver oracle did not
    reach (unit tests covered them via hand-built bitstreams only)."""
    import numpy as np
    import pandas as pd

    from pgvecto_rs_spark.operators.flac import encode_flac

    for pdf in it:
        payloads = []
        for did in pdf["doc_id"]:
            did = int(did)
            n = 96 + did % 64
            i = np.arange(n, dtype=np.int64)
            left = (did * 37 + i * i * 11 + i * 17) % 3001 - 1500
            right = (did * 53 + i * i * 5 + i * 29) % 3001 - 1500
            s = np.stack([left, right], axis=1).astype(np.int32)
            payloads.append(
                encode_flac(
                    s, rate=16000, bps=16, blocksize=32,
                    mode="lpc", stereo_mode="decorr",
                )
            )
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
        )


@register(
    "mm_audio_flac_stereo",
    r"""
    WITH sm AS (
      SELECT d.doc_id, r.i, c.ch,
             CASE WHEN c.ch = 0
                  THEN (d.doc_id*37 + r.i*r.i*11 + r.i*17) % 3001 - 1500
                  ELSE (d.doc_id*53 + r.i*r.i*5 + r.i*29) % 3001 - 1500
             END AS s
      FROM documents d, range(160) r(i), range(2) c(ch)
      WHERE r.i < 96 + d.doc_id % 64
    ), zz AS (
      SELECT doc_id, ch, s,
             LEAD(s) OVER (PARTITION BY doc_id, ch ORDER BY i) AS s2
      FROM sm
    )
    SELECT doc_id,
           CAST(ch AS INT) AS channel,
           CAST(16000 AS INT) AS sample_rate,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(s*s) AS BIGINT) AS energy,
           CAST(SUM(CASE WHEN s*s2 < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS zero_crossings
    FROM zz GROUP BY doc_id, ch
    """,
)
def mm_audio_flac_stereo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stereo-decorrelation + LPC FLAC decode end-to-end (r9, closing
    the r8 verdict's item 6): every frame channel assignment the spec
    defines (left/side, right/side, mid/side, independent — cycled per
    frame by the encoder twin) and order-2 quantized-coefficient LPC
    subframes, decoded through the full bitstream path and reduced to
    PER-CHANNEL exact integer stats (decode_audio_channel_stats — no
    mono downmix, no float round-trip).  FLAC is lossless, so the
    oracle replays the L/R synthesis formulas in pure SQL with zero
    tolerance: a single mis-reconstructed side channel or LPC residual
    flips energy/zero_crossings.  Reference parity: N/A (no media
    surface in the reference).

    r13 shape: FLAC encode and decode run as ONE fused Python stage
    (_fused_synth through decode_audio_channel_stats' own batch
    function, guide §4)."""
    import pgvecto_rs_spark.operators.multimodal as MM

    docs = _docs(spark, sf_dir).select("doc_id")
    return _fused_synth(
        docs, _synth_flac_stereo_op,
        MM.decode_audio_channel_stats_op(id_col="doc_id"),
    )


def _synth_decode_mp4_idr_op(it):
    """(doc_id) -> decoded keyframe stats: fused synth +
    ``decode_video_keyframes`` — the MP4 synthesis, the REAL container
    walk (operators.mp4 ``index_mp4_samples`` incl. avcC resolution)
    and the REAL CAVLC baseline IDR pixel decode (operators.h264
    ``decode_idr_frame``) all happen in the task that built the
    payload, so the MP4 bytes never cross a second Arrow boundary and
    the query pays ONE Python stage instead of two (guide §4).

    Synth: MP4 whose samples are REAL H.264 constrained-baseline IDR
    access units (avcC-format, SPS/PPS in the container's avcC record)
    built by the operators.h264 encoder twin.  2 + doc_id%3 keyframe
    samples per doc; each is a 32x32 frame of four macroblocks with a
    closed-form reconstruction:

      v  = 20 + (doc_id*7 + s*13) % 200      (PCM flat luma)
      k  = (doc_id + s) % 9 - 4              (DC residual level)
      c1 = (doc_id*3 + s*5) % 256            (PCM flat Cb)
      c2 = (doc_id*11 + s*2) % 256           (PCM flat Cr)

      MB(0,0) I_PCM flat (v, c1, c2)
      MB(1,0) I_16x16 HORIZONTAL + luma-DC-only residual k
      MB(0,1) I_16x16 VERTICAL   + luma-DC-only residual k
      MB(1,1) I_4x4 all-DC, zero residual (flat propagation)

    At qp=28 a lone luma DC level k adds exactly k per pixel
    ((64*k+32)>>6 == k), so the decoded frame is MB0 = v and the other
    three MBs = v+k, chroma flat c1/c2 — pure integer arithmetic for
    the SQL oracle while the decoder exercises PCM, CAVLC DC residuals
    (incl. negative levels), H/V/DC intra prediction, the luma-DC
    Hadamard path, avcC parameter sets and NAL length prefixes."""
    import numpy as np
    import pandas as pd

    from pgvecto_rs_spark.operators.h264 import (
        decode_idr_frame,
        encode_idr_stream,
        split_annexb,
    )
    from pgvecto_rs_spark.operators.mp4 import encode_mp4, index_mp4_samples

    for pdf in it:
        rows: list[tuple] = []
        for did in pdf["doc_id"]:
            did = int(did)
            samples = []
            sps = pps = None
            for s in range(2 + did % 3):
                v = 20 + (did * 7 + s * 13) % 200
                k = (did + s) % 9 - 4
                c1 = (did * 3 + s * 5) % 256
                c2 = (did * 11 + s * 2) % 256
                plan = [
                    {"type": "pcm", "y": np.full((16, 16), v),
                     "cb": np.full((8, 8), c1), "cr": np.full((8, 8), c2)},
                    {"type": "i16", "pred": 1, "chroma_mode": 1,
                     "dc": [k] + [0] * 15},
                    {"type": "i16", "pred": 0, "chroma_mode": 2,
                     "dc": [k] + [0] * 15},
                    {"type": "i4", "modes": 2, "chroma_mode": 0},
                ]
                sps, pps, idr = split_annexb(
                    encode_idr_stream(plan, 2, 2, qp=28)
                )
                samples.append(len(idr).to_bytes(4, "big") + idr)
            raw = encode_mp4(samples, sps=sps, pps=pps, width=32, height=32)
            idx = index_mp4_samples(raw)
            avcc = idx["avcc"]
            if avcc is None or not avcc["sps"] or not avcc["pps"]:
                raise ValueError("mm_mp4_idr: synthesized MP4 lost its avcC")
            for no, _dts, _pts, off, size, kf in idx["samples"]:
                if not kf:
                    continue
                out = decode_idr_frame(
                    raw[off : off + size],
                    sps_bytes=avcc["sps"][0],
                    pps_bytes=avcc["pps"][0],
                    nal_length_size=avcc["nal_length_size"],
                )
                y, cb, cr = out["y"], out["cb"], out["cr"]
                rows.append((
                    did, no, out["width"], out["height"],
                    int(y.astype(np.int64).sum()),
                    int(y.min()), int(y.max()),
                    int(cb.astype(np.int64).sum()),
                    int(cr.astype(np.int64).sum()),
                ))
        cols = list(zip(*rows)) if rows else [[] for _ in range(9)]
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(cols[0], dtype="int64"),
                "sample_no": pd.Series(cols[1], dtype="int32"),
                "width": pd.Series(cols[2], dtype="int32"),
                "height": pd.Series(cols[3], dtype="int32"),
                "luma_sum": pd.Series(cols[4], dtype="int64"),
                "luma_min": pd.Series(cols[5], dtype="int32"),
                "luma_max": pd.Series(cols[6], dtype="int32"),
                "cb_sum": pd.Series(cols[7], dtype="int64"),
                "cr_sum": pd.Series(cols[8], dtype="int64"),
            }
        )


@register(
    "mm_mp4_idr",
    r"""
    WITH s AS (
      SELECT d.doc_id, r.s,
             20 + (d.doc_id*7 + r.s*13) % 200 AS v,
             (d.doc_id + r.s) % 9 - 4 AS k,
             (d.doc_id*3 + r.s*5) % 256 AS c1,
             (d.doc_id*11 + r.s*2) % 256 AS c2
      FROM documents d, range(4) r(s)
      WHERE r.s < 2 + d.doc_id % 3
    )
    SELECT doc_id,
           CAST(s + 1 AS INT) AS sample_no,
           CAST(32 AS INT) AS width,
           CAST(32 AS INT) AS height,
           CAST(1024*v + 768*k AS BIGINT) AS luma_sum,
           CAST(v + LEAST(k, 0) AS INT) AS luma_min,
           CAST(v + GREATEST(k, 0) AS INT) AS luma_max,
           CAST(256*c1 AS BIGINT) AS cb_sum,
           CAST(256*c2 AS BIGINT) AS cr_sum
    FROM s
    """,
)
def mm_mp4_idr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H.264 IDR keyframe PIXEL decode end-to-end (r9, closing the r8
    verdict's item 4): MP4 container walk -> avcC SPS/PPS + NAL length
    prefixes -> per-keyframe byte slice -> from-spec CAVLC baseline
    I-slice decode (operators/h264.py) -> exact integer plane stats
    (decode_video_keyframes).  The synthetic frames' reconstruction has
    a closed form (see _synth_decode_mp4_idr_op), so the DuckDB oracle checks
    every decoded pixel statistic with ZERO tolerance: one wrong
    prediction sample, dequant value or CAVLC level anywhere flips
    luma_sum.  Inter-frame (P/B) decode remains behind the documented
    ffmpeg seam — this makes the KEYFRAME path, which frame-sampling
    curation actually uses, real.  Reference parity: N/A (no media
    surface in the reference).

    r13 shape: synth, container walk and IDR decode are FUSED into one
    mapInPandas pass (guide §4, same cure as mm_video_frames) — the MP4
    bytes never cross a second Arrow boundary.  Decode still goes
    through the identical real paths (operators.mp4 sample index,
    operators.h264 pixel decode)."""
    docs = _docs(spark, sf_dir).select("doc_id")
    return _spread_ids(docs).mapInPandas(
        _synth_decode_mp4_idr_op,
        "doc_id bigint, sample_no int, width int, height int, "
        "luma_sum bigint, luma_min int, luma_max int, "
        "cb_sum bigint, cr_sum bigint",
    )


def _synth_hash_mp4_group_op(it):
    """(doc_id) -> (doc_id, sample_no, sig): fused synth +
    ``video_keyframe_hashes`` — near-duplicate VIDEO groups synthesized,
    container-walked, IDR pixel-decoded and aHashed inside one task, so
    the MP4 bytes never cross a second Arrow boundary and only 16-byte
    signature rows leave the stage (guide §4).  Decode and hash go
    through the identical real paths (operators.mp4 sample index,
    operators.h264 pixel decode, the same ``_resize_nn`` + strict
    mean-threshold bit rule as ``video_keyframe_hashes``).

    Synth: videos with the same doc_id//4 share the frame pattern; the
    luma is constant over each 4x4 block, with block (i, j) of frame s
    in group g carrying

        t = (g*2 + s)*64 + i*8 + j + 1
        v = ((t*t % 999983) * t % 999983) % 200 + (doc_id % 4)*2

    — a cubic-residue mix (empirically: all 2*n_groups frame hashes
    distinct at sf0.1, zero accidental collisions) whose per-variant
    term is a UNIFORM brightness offset, which the aHash bit rule
    (64*v > sum(v)) is invariant to: the 4 variants of a group hash
    identically while different groups land far apart.  An earlier
    additive-gradient family collapsed to 64 distinct hashes at sf0.1
    (~1M accidental pairs) — smooth per-group phase shifts barely move
    mean-threshold bits, so near-dup fixtures need multiplicative
    per-cell mixing.  Frames are four I_PCM macroblocks carrying the
    pattern exactly (lossless), so the SQL oracle replays pixels ->
    8x8 nearest-neighbor subsample -> aHash -> pairwise comparison in
    pure integer arithmetic."""
    import numpy as np
    import pandas as pd

    from pgvecto_rs_spark.operators.h264 import (
        decode_idr_frame,
        encode_idr_stream,
        split_annexb,
    )
    from pgvecto_rs_spark.operators.mp4 import encode_mp4, index_mp4_samples
    from pgvecto_rs_spark.operators.multimodal import _resize_nn

    weights = 1 << np.arange(64, dtype=np.uint64)
    for pdf in it:
        ids, nos, sigs = [], [], []
        for did in pdf["doc_id"]:
            did = int(did)
            g, var = did // 4, did % 4
            samples = []
            sps = pps = None
            for s in range(2):
                i = np.arange(32)
                idx = (i[:, None] // 4) * 8 + (i[None, :] // 4)
                t = (g * 2 + s) * 64 + idx + 1
                pat = ((t * t % 999983) * t % 999983) % 200 + var * 2
                plan = []
                for mby in range(2):
                    for mbx in range(2):
                        plan.append({
                            "type": "pcm",
                            "y": pat[mby*16:mby*16+16, mbx*16:mbx*16+16],
                            "cb": np.full((8, 8), 128),
                            "cr": np.full((8, 8), 128),
                        })
                sps, pps, idr = split_annexb(
                    encode_idr_stream(plan, 2, 2, qp=28))
                samples.append(len(idr).to_bytes(4, "big") + idr)
            raw = encode_mp4(samples, sps=sps, pps=pps, width=32, height=32)
            smp = index_mp4_samples(raw)
            avcc = smp["avcc"]
            if avcc is None or not avcc["sps"] or not avcc["pps"]:
                raise ValueError(
                    "mm_video_idr_neardup: synthesized MP4 lost its avcC"
                )
            for no, _dts, _pts, off, size, kf in smp["samples"]:
                if not kf:
                    continue
                out = decode_idr_frame(
                    raw[off : off + size],
                    sps_bytes=avcc["sps"][0],
                    pps_bytes=avcc["pps"][0],
                    nal_length_size=avcc["nal_length_size"],
                )
                v = _resize_nn(out["y"], 8, 8).astype(np.int64)
                bits = (64 * v.reshape(-1)) > v.sum()
                sig = int((bits.astype(np.uint64) * weights)
                          .sum(dtype=np.uint64))
                if sig >= 1 << 63:
                    sig -= 1 << 64
                ids.append(did)
                nos.append(no)
                sigs.append(sig)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "sample_no": pd.Series(nos, dtype="int32"),
                "sig": pd.Series(sigs, dtype="int64"),
            }
        )


@register(
    "mm_video_idr_neardup",
    r"""
    WITH px AS (
      SELECT d.doc_id, r.s, i.i, j.j,
             ((t.t * t.t % 999983) * t.t % 999983) % 200
               + (d.doc_id % 4)*2 AS v
      FROM documents d, range(2) r(s), range(8) i(i), range(8) j(j),
           LATERAL (SELECT ((d.doc_id // 4)*2 + r.s)*64 + i.i*8 + j.j + 1
                    AS t) t
    ), tot AS (
      SELECT doc_id, s, SUM(v) AS t FROM px GROUP BY doc_id, s
    ), bits AS (
      SELECT p.doc_id, p.s, p.i*8 + p.j AS idx,
             CASE WHEN 64*p.v > t.t THEN 1 ELSE 0 END AS b
      FROM px p JOIN tot t ON p.doc_id = t.doc_id AND p.s = t.s
    ), sig AS (
      SELECT doc_id, s,
             CAST(SUM(CASE WHEN idx < 32
                           THEN b * (CAST(1 AS BIGINT) << idx)
                           ELSE 0 END) AS BIGINT) AS lo,
             CAST(SUM(CASE WHEN idx >= 32
                           THEN b * (CAST(1 AS BIGINT) << (idx - 32))
                           ELSE 0 END) AS BIGINT) AS hi
      FROM bits GROUP BY doc_id, s
    ), ham AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sig a JOIN sig b
        ON a.doc_id < b.doc_id AND a.lo = b.lo AND a.hi = b.hi
    )
    SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS n_frames
    FROM ham GROUP BY id_a, id_b HAVING COUNT(*) >= 2
    """,
)
def mm_video_idr_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate VIDEO detection by decoded-keyframe perceptual
    hash (r9): MP4 avcC -> H.264 IDR pixel decode -> 8x8 luma aHash
    per keyframe (same bit rule and Hamming space as image hashes) ->
    shared banded-pigeonhole Hamming join (never all-pairs; at
    max_hamming=0 it degenerates to one exact-equality band — the
    64-bit-mask path) -> video pair rollup with a min-matching-frames
    gate.  The synthetic corpus hides uniform-brightness variants
    inside groups (aHash is brightness-shift invariant) under a
    cubic-residue pattern mix with zero accidental collisions, and
    the oracle replays pixels -> subsample -> aHash -> pairwise
    signature equality in pure SQL — certifying both the pixel decode
    and the join's completeness.  100 TB shape: 16-byte signatures
    shuffle, video bytes never do.  Reference parity: N/A (no media
    surface in the reference).

    r13 shape: synth, container walk, IDR decode and aHash are FUSED
    into one mapInPandas pass (guide §4); the banded-pigeonhole join
    and rollup are unchanged
    (multimodal.video_pairs_from_keyframe_hashes)."""
    import pgvecto_rs_spark.operators.multimodal as MM

    docs = _docs(spark, sf_dir).select("doc_id")
    hashes = _spread_ids(docs).mapInPandas(
        _synth_hash_mp4_group_op, "doc_id bigint, sample_no int, sig bigint"
    )
    return MM.video_pairs_from_keyframe_hashes(
        hashes, id_col="doc_id", max_hamming=0, min_matching_frames=2,
        max_bucket=4096,
    )


def _synth_mp4_captions_op(it):
    """(doc_id) -> (doc_id, payload): MP4 with a video track (fake AU
    bytes — captions don't need pixels) plus a tx3g timed-text caption
    track of 2 + doc_id%4 cues:

        text_s = 'cap ' || doc_id || ':' || s || ' ' ||
                 repeat('ab', 1 + (doc_id + s) % 5)
        dur_s  = 400 + 100 * ((doc_id + s) % 7)    (timescale 1000)

    — pure string/integer functions, so the SQL oracle rebuilds every
    cue and its cumulative start time exactly."""
    import pandas as pd

    from pgvecto_rs_spark.operators.mp4 import encode_mp4

    for pdf in it:
        payloads = []
        for did in pdf["doc_id"]:
            did = int(did)
            cues = [
                (
                    f"cap {did}:{s} " + "ab" * (1 + (did + s) % 5),
                    400 + 100 * ((did + s) % 7),
                )
                for s in range(2 + did % 4)
            ]
            payloads.append(
                encode_mp4([bytes([did % 256]) * 16], text_samples=cues)
            )
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
        )


@register(
    "mm_mp4_captions",
    r"""
    WITH cue AS (
      SELECT d.doc_id, r.s,
             'cap ' || d.doc_id || ':' || r.s || ' '
               || repeat('ab', CAST(1 + (d.doc_id + r.s) % 5 AS INT)) AS text,
             400 + 100 * ((d.doc_id + r.s) % 7) AS dur
      FROM documents d, range(6) r(s)
      WHERE r.s < 2 + d.doc_id % 4
    )
    SELECT doc_id,
           CAST(s + 1 AS INT) AS sample_no,
           CAST(COALESCE(SUM(dur) OVER (
                  PARTITION BY doc_id ORDER BY s
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) AS BIGINT) AS dts,
           CAST(dur AS BIGINT) AS dur,
           text
    FROM cue
    """,
)
def mm_mp4_captions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3GPP timed-text caption harvesting (r9): MP4 track walk ->
    tx3g sample slicing -> (cue text, start, duration) rows, the
    aligned-text supervision a video training corpus mines without any
    pixel decode.  The oracle rebuilds every cue string and its
    cumulative stts start time in pure SQL — one wrong sample offset,
    stts run or UTF-8 slice anywhere breaks the hash match.
    Reference parity: N/A (no media surface in the reference).

    r13 shape: synth and the track walk run as ONE fused Python stage
    (_fused_synth through extract_video_captions' own batch function,
    guide §4)."""
    import pgvecto_rs_spark.operators.multimodal as MM

    docs = _docs(spark, sf_dir).select("doc_id")
    return _fused_synth(
        docs, _synth_mp4_captions_op,
        MM.extract_video_captions_op(id_col="doc_id"),
    )


def _synth_srt_op(it):
    """(doc_id) -> (doc_id, subtitle): SubRip sidecar text built by the
    formatter twin from pure formulas (n = 2 + doc_id%4 cues;
    start = (doc_id%5)*1000 + s*2000; end = start + 1200 +
    100*((doc_id+s)%4); text = 'cue <did>.<s>' NL 'xy'*(1+(did+s)%3))."""
    import pandas as pd

    from pgvecto_rs_spark.operators.subtitles import format_srt

    for pdf in it:
        subs = []
        for did in pdf["doc_id"]:
            did = int(did)
            cues = []
            for s in range(2 + did % 4):
                start = (did % 5) * 1000 + s * 2000
                end = start + 1200 + 100 * ((did + s) % 4)
                cues.append(
                    (start, end,
                     f"cue {did}.{s}\n" + "xy" * (1 + (did + s) % 3))
                )
            subs.append(format_srt(cues))
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "subtitle": subs}
        )


@register(
    "mm_srt_cues",
    r"""
    SELECT d.doc_id,
           CAST(r.s + 1 AS INT) AS cue_no,
           CAST((d.doc_id % 5)*1000 + r.s*2000 AS BIGINT) AS start_ms,
           CAST((d.doc_id % 5)*1000 + r.s*2000
                + 1200 + 100*((d.doc_id + r.s) % 4) AS BIGINT) AS end_ms,
           'cue ' || d.doc_id || '.' || r.s || chr(10)
             || repeat('xy', CAST(1 + (d.doc_id + r.s) % 3 AS INT)) AS text
    FROM documents d, range(6) r(s)
    WHERE r.s < 2 + d.doc_id % 4
    """,
)
def mm_srt_cues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sidecar SubRip subtitle harvesting (r9): formatter-twin SRT text
    -> strict parse (timestamps, multi-line payloads) -> exact cue
    rows.  Completes caption extraction across the common carriers
    (MP4 tx3g in-container + SRT/WebVTT sidecars).  Reference parity:
    N/A (no media surface in the reference).

    r13 shape: sidecar formatting and the strict parse run as ONE
    fused Python stage (_fused_synth through subtitle_cues' own batch
    function, guide §4)."""
    import pgvecto_rs_spark.operators.subtitles as SUB

    docs = _docs(spark, sf_dir).select("doc_id")
    return _fused_synth(
        docs, _synth_srt_op, SUB.subtitle_cues_op(id_col="doc_id", fmt="srt")
    )


def _synth_webvtt_op(it):
    """(doc_id) -> (doc_id, subtitle): WebVTT sidecar text; start times
    placed near the hour boundary so the hours field is exercised."""
    import pandas as pd

    from pgvecto_rs_spark.operators.subtitles import format_webvtt

    for pdf in it:
        subs = []
        for did in pdf["doc_id"]:
            did = int(did)
            cues = []
            for s in range(1 + did % 3):
                start = 3590000 + (did % 7) * 1000 + s * 2500
                end = start + 900 + 50 * ((did + s) % 5)
                cues.append((start, end, f"vtt {did}-{s}"))
            subs.append(format_webvtt(cues))
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "subtitle": subs}
        )


@register(
    "mm_webvtt_cues",
    r"""
    SELECT d.doc_id,
           CAST(r.s + 1 AS INT) AS cue_no,
           CAST(3590000 + (d.doc_id % 7)*1000 + r.s*2500 AS BIGINT)
             AS start_ms,
           CAST(3590000 + (d.doc_id % 7)*1000 + r.s*2500
                + 900 + 50*((d.doc_id + r.s) % 5) AS BIGINT) AS end_ms,
           'vtt ' || d.doc_id || '-' || r.s AS text
    FROM documents d, range(3) r(s)
    WHERE r.s < 1 + d.doc_id % 3
    """,
)
def mm_webvtt_cues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sidecar WebVTT subtitle harvesting (r9): formatter-twin VTT ->
    strict parse (signature, dot-millis timestamps crossing the hour
    boundary) -> exact cue rows.  Reference parity: N/A (no media
    surface in the reference).

    r13 shape: sidecar formatting and the strict parse run as ONE
    fused Python stage (_fused_synth through subtitle_cues' own batch
    function, guide §4)."""
    import pgvecto_rs_spark.operators.subtitles as SUB

    docs = _docs(spark, sf_dir).select("doc_id")
    return _fused_synth(
        docs, _synth_webvtt_op, SUB.subtitle_cues_op(id_col="doc_id", fmt="auto")
    )


def _synth_mp3_op(it):
    """(doc_id) -> (doc_id, payload): tagless MPEG-1 Layer III streams
    with formula parameters — n = 3 + doc_id%5 frames, bitrate from
    (64, 96, 128, 160) by doc_id%4, sample rate from (44100, 48000,
    32000) by doc_id%3, per-frame padding bit ((doc_id%256) >> (i%8))
    & 1 — so the oracle recomputes every frame's size and prefix-sum
    offset in pure SQL."""
    import pandas as pd

    from pgvecto_rs_spark.operators.mp3 import encode_mp3

    for pdf in it:
        payloads = []
        for did in pdf["doc_id"]:
            did = int(did)
            payloads.append(
                encode_mp3(
                    3 + did % 5,
                    bitrate_kbps=(64, 96, 128, 160)[did % 4],
                    sample_rate=(44100, 48000, 32000)[did % 3],
                    padding_pattern=did % 256,
                )
            )
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
        )


@register(
    "mm_mp3_index",
    r"""
    WITH f AS (
      SELECT d.doc_id, r.i,
             CASE d.doc_id % 4 WHEN 0 THEN 64 WHEN 1 THEN 96
                               WHEN 2 THEN 128 ELSE 160 END AS kbps,
             CASE d.doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                               ELSE 32000 END AS rate,
             ((d.doc_id % 256) >> CAST(r.i % 8 AS INT)) & 1 AS pad
      FROM documents d, range(8) r(i)
      WHERE r.i < 3 + d.doc_id % 5
    ), s AS (
      SELECT doc_id, i, kbps, rate,
             (144000 * kbps) // rate + pad AS size
      FROM f
    )
    SELECT doc_id,
           CAST(i + 1 AS INT) AS frame_no,
           CAST(COALESCE(SUM(size) OVER (
                  PARTITION BY doc_id ORDER BY i
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) AS BIGINT) AS offset,
           CAST(size AS BIGINT) AS size,
           CAST(1152 AS INT) AS samples,
           CAST(kbps AS INT) AS bitrate_kbps,
           CAST(rate AS INT) AS sample_rate,
           CAST(2 AS INT) AS channels
    FROM s
    """,
)
def mm_mp3_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 container-level frame indexing (r9): MPEG-1 Layer III
    header walk -> exact per-frame byte extents + bitrate/rate/padding
    from the spec tables.  The oracle recomputes every size from the
    table formula (144000*kbps/rate + padding) and every offset as a
    prefix sum — one wrong table entry or padding bit anywhere breaks
    the hash.  The audio leg of the container story next to
    mm_mp4_index.  Reference parity: N/A (no media surface in the
    reference).

    r13 shape: synth and the container walk run as ONE fused Python
    stage (_fused_synth through index_audio_frames' own batch function,
    guide §4)."""
    import pgvecto_rs_spark.operators.multimodal as MM

    docs = _docs(spark, sf_dir).select("doc_id")
    return _fused_synth(
        docs, _synth_mp3_op, MM.index_audio_frames_op(id_col="doc_id")
    )


def _synth_mp3_tags_op(it):
    """(doc_id) -> (doc_id, payload): MP3 with a real ID3v2.3 tag —
    TIT2 = 'title ' || doc_id, TPE1 = 'artist ' || doc_id%50,
    TLAN from (eng, deu, fra) by doc_id%3 — over 2 audio frames."""
    import pandas as pd

    from pgvecto_rs_spark.operators.mp3 import encode_mp3

    for pdf in it:
        payloads = []
        for did in pdf["doc_id"]:
            did = int(did)
            payloads.append(
                encode_mp3(
                    2,
                    tags={
                        "TIT2": f"title {did}",
                        "TPE1": f"artist {did % 50}",
                        "TLAN": ("eng", "deu", "fra")[did % 3],
                    },
                )
            )
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
        )


@register(
    "mm_mp3_tags",
    r"""
    SELECT doc_id, tag, value FROM (
      SELECT doc_id, 'TIT2' AS tag, 'title ' || doc_id AS value
      FROM documents
      UNION ALL
      SELECT doc_id, 'TPE1', 'artist ' || (doc_id % 50) FROM documents
      UNION ALL
      SELECT doc_id, 'TLAN',
             CASE doc_id % 3 WHEN 0 THEN 'eng' WHEN 1 THEN 'deu'
                             ELSE 'fra' END
      FROM documents
    )
    """,
)
def mm_mp3_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ID3v2 metadata harvesting (r9): real ID3v2.3 tag parse (syncsafe
    sizes, UTF-8 text frames) -> (doc, tag, value) rows — the metadata
    an audio corpus mines for licensing/language/dedup routing.
    Reference parity: N/A (no media surface in the reference).

    r13 shape: synth and the container walk run as ONE fused Python
    stage (_fused_synth through extract_audio_tags' own batch function,
    guide §4)."""
    import pgvecto_rs_spark.operators.multimodal as MM

    docs = _docs(spark, sf_dir).select("doc_id")
    return _fused_synth(
        docs, _synth_mp3_tags_op, MM.extract_audio_tags_op(id_col="doc_id")
    )


def _synth_ogg_op(it):
    """(doc_id) -> (doc_id, payload): comment-less Opus-in-Ogg streams
    with formula parameters — 2 + doc_id%4 single-packet audio pages of
    60 + doc_id%50 byte packets, granule 960*(i+1) — so every page's
    size and prefix-sum offset is pure arithmetic: the OpusHead page is
    always 47 bytes, the (vendor-only) OpusTags page 60 bytes, audio
    pages 28 + packet_size."""
    import pandas as pd

    from pgvecto_rs_spark.operators.ogg import encode_ogg_opus

    for pdf in it:
        payloads = []
        for did in pdf["doc_id"]:
            did = int(did)
            payloads.append(
                encode_ogg_opus(2 + did % 4, packet_size=60 + did % 50)
            )
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
        )


@register(
    "mm_ogg_index",
    r"""
    WITH audio AS (
      SELECT d.doc_id, r.i,
             CAST(28 + 60 + d.doc_id % 50 AS BIGINT) AS size,
             CAST(960 * (r.i + 1) AS BIGINT) AS granule,
             r.i = 1 + d.doc_id % 4 AS eos
      FROM documents d, range(5) r(i)
      WHERE r.i < 2 + d.doc_id % 4
    )
    SELECT doc_id, CAST(1 AS INT) AS page_no, CAST(0 AS BIGINT) AS offset,
           CAST(47 AS BIGINT) AS size, CAST(1 AS BIGINT) AS serial,
           CAST(0 AS BIGINT) AS granule, CAST(1 AS INT) AS n_packets,
           TRUE AS bos, FALSE AS eos
    FROM documents
    UNION ALL
    SELECT doc_id, CAST(2 AS INT), CAST(47 AS BIGINT), CAST(60 AS BIGINT),
           CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS INT),
           FALSE, FALSE
    FROM documents
    UNION ALL
    SELECT doc_id, CAST(i + 3 AS INT),
           CAST(107 + i * size AS BIGINT), size,
           CAST(1 AS BIGINT), granule, CAST(1 AS INT), FALSE, eos
    FROM audio
    """,
)
def mm_ogg_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ogg container page indexing (r9): full page walk with per-page
    CRC-32 verification (a green row certifies byte-exact container
    integrity, not just header plausibility) -> exact byte extents,
    granule positions and BOS/EOS flags.  Completes the container
    matrix alongside mm_mp4_index and mm_mp3_index.  Reference
    parity: N/A (no media surface in the reference).

    r13 shape: synth and the container walk run as ONE fused Python
    stage (_fused_synth through index_audio_pages' own batch function,
    guide §4)."""
    import pgvecto_rs_spark.operators.multimodal as MM

    docs = _docs(spark, sf_dir).select("doc_id")
    return _fused_synth(
        docs, _synth_ogg_op, MM.index_audio_pages_op(id_col="doc_id")
    )


def _synth_opus_tags_op(it):
    """(doc_id) -> (doc_id, payload): Opus-in-Ogg with VorbisComments —
    TITLE = 'song ' || doc_id, ARTIST = 'band ' || doc_id%40,
    LANGUAGE from (eng, spa, jpn) by doc_id%3."""
    import pandas as pd

    from pgvecto_rs_spark.operators.ogg import encode_ogg_opus

    for pdf in it:
        payloads = []
        for did in pdf["doc_id"]:
            did = int(did)
            payloads.append(
                encode_ogg_opus(
                    2,
                    comments={
                        "TITLE": f"song {did}",
                        "ARTIST": f"band {did % 40}",
                        "LANGUAGE": ("eng", "spa", "jpn")[did % 3],
                    },
                )
            )
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
        )


@register(
    "mm_opus_tags",
    r"""
    SELECT doc_id, tag, value FROM (
      SELECT doc_id, 'TITLE' AS tag, 'song ' || doc_id AS value
      FROM documents
      UNION ALL
      SELECT doc_id, 'ARTIST', 'band ' || (doc_id % 40) FROM documents
      UNION ALL
      SELECT doc_id, 'LANGUAGE',
             CASE doc_id % 3 WHEN 0 THEN 'eng' WHEN 1 THEN 'spa'
                             ELSE 'jpn' END
      FROM documents
    )
    """,
)
def mm_opus_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VorbisComment metadata harvesting (r9): real OpusTags parse
    (vendor + length-prefixed KEY=value entries, UTF-8) through the
    container-sniffing extract_audio_tags surface shared with ID3.
    Reference parity: N/A (no media surface in the reference).

    r13 shape: synth and the container walk run as ONE fused Python
    stage (_fused_synth through extract_audio_tags' own batch function,
    guide §4)."""
    import pgvecto_rs_spark.operators.multimodal as MM

    docs = _docs(spark, sf_dir).select("doc_id")
    return _fused_synth(
        docs, _synth_opus_tags_op, MM.extract_audio_tags_op(id_col="doc_id")
    )
