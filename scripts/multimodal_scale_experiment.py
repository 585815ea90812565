#!/usr/bin/env python
"""Scale experiment for the multimodal decode pipeline: N synthetic
64x64 P6 PPM images (~12 KB payload each) and N 8-bit PCM WAV clips
(~8 KB each) generated executor-side, decoded through the REAL codec
paths (operators/multimodal.py decode_image_features /
decode_audio_stats) as Arrow-batched mapInPandas operators.

What this verifies at volume:

- payload bytes never cross the driver (synthesis and decode both run
  inside mapInPandas; the only collect is the aggregated stat row);
- decode throughput in rows/s and payload MB/s on local[32], the
  number a 1000-executor cluster multiplies out from;
- the image path's feature output feeds a groupBy aggregate directly
  (decode -> vectorize -> reduce, the training-pipeline shape).

Run:  python scripts/multimodal_scale_experiment.py [n_rows]
Writes one JSON line; results recorded in BENCHNOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

IMG_W = IMG_H = 64  # 64x64 RGB -> 12,303-byte payloads
WAV_N = 8_000  # 1 s at 8 kHz, 8-bit mono -> 8,044-byte payloads


def _synth_images(it):
    import numpy as np
    import pandas as pd

    hdr = f"P6\n{IMG_W} {IMG_H}\n255\n".encode()
    idx = np.arange(IMG_W * IMG_H)
    for pdf in it:
        payloads = []
        for did in pdf["id"]:
            v = ((int(did) * 31 + idx * 7 + 13) % 256).astype(np.uint8)
            payloads.append(hdr + bytes(np.repeat(v, 3)))
        yield pd.DataFrame({"doc_id": pdf["id"].astype("int64"), "payload": payloads})


def _synth_wavs(it):
    import struct

    import numpy as np
    import pandas as pd

    rate = 8_000
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + WAV_N)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate, 1, 8)
        + b"data"
        + struct.pack("<I", WAV_N)
    )
    idx = np.arange(WAV_N)
    for pdf in it:
        payloads = []
        for did in pdf["id"]:
            u = ((int(did) * 17 + idx * 29 + 5) % 256).astype(np.uint8)
            payloads.append(hdr + bytes(u))
        yield pd.DataFrame({"doc_id": pdf["id"].astype("int64"), "payload": payloads})


JPEG_W = JPEG_H = 128  # compressed-codec rows: 128x128 gray frames
N_VARIANTS = 8  # distinct payloads cycled across rows (synth stays cheap)


def _worker_cached(key, builder):
    """Build-once-per-python-worker cache: mapInPandas closures are
    re-deserialized per task, but the worker process (and any module it
    imports) is reused — stash the encoded variants on an imported
    module so the encoder cost is paid once per worker, not once per
    partition (it would otherwise dominate the timed decode)."""
    import pgvecto_rs_spark.operators.multimodal as _mm_mod

    cache = getattr(_mm_mod, "_SCALE_EXP_CACHE", None)
    if cache is None:
        cache = {}
        _mm_mod._SCALE_EXP_CACHE = cache
    if key not in cache:
        cache[key] = builder()
    return cache[key]


def _synth_jpegs(it):
    """Distinct baseline-JPEG payloads, encoded ONCE per worker (the
    encoder is not the thing under test) and cycled across rows; every
    row still runs a full real entropy decode + IDCT."""
    import numpy as np
    import pandas as pd

    def _build():
        from pgvecto_rs_spark.operators.jpeg import encode_jpeg

        rng = np.random.default_rng(1234)
        base = rng.integers(0, 256, (JPEG_H, JPEG_W), dtype=np.uint8)
        base = (
            base.astype(np.float32)
            + np.roll(base, 1, 0)
            + np.roll(base, 1, 1)
            + np.roll(base, 2, 0)
        ).astype(np.uint8)
        return [
            encode_jpeg(np.roll(base, v * 3, axis=1), restart_interval=0)
            for v in range(N_VARIANTS)
        ]

    variants = _worker_cached("jpeg", _build)
    for pdf in it:
        payloads = [variants[int(did) % N_VARIANTS] for did in pdf["id"]]
        yield pd.DataFrame({"doc_id": pdf["id"].astype("int64"), "payload": payloads})


def _synth_pngs(it):
    """Distinct Paeth-filtered PNG payloads (the worst-case sequential
    filter), encoded once per worker and cycled across rows."""
    import struct
    import zlib

    import numpy as np
    import pandas as pd

    def _png(px):
        h, w = px.shape

        def chunk(typ, data):
            return (
                struct.pack(">I", len(data))
                + typ
                + data
                + struct.pack(">I", zlib.crc32(typ + data))
            )

        raw = bytearray()
        prev = np.zeros(w, dtype=np.int64)
        for y in range(h):
            rec = px[y].astype(np.int64)
            raw.append(4)  # Paeth on every row
            enc = rec.copy()
            for x in range(w):
                a = rec[x - 1] if x >= 1 else 0
                b = prev[x]
                c = prev[x - 1] if x >= 1 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (rec[x] - pr) & 0xFF
            raw += bytes(enc.astype(np.uint8))
            prev = rec
        out = b"\x89PNG\r\n\x1a\n"
        out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        out += chunk(b"IDAT", zlib.compress(bytes(raw)))
        return out + chunk(b"IEND", b"")

    def _build():
        rng = np.random.default_rng(99)
        return [
            _png(rng.integers(0, 256, (JPEG_H, JPEG_W), dtype=np.uint8))
            for _ in range(N_VARIANTS)
        ]

    variants = _worker_cached("png", _build)
    for pdf in it:
        payloads = [variants[int(did) % N_VARIANTS] for did in pdf["id"]]
        yield pd.DataFrame({"doc_id": pdf["id"].astype("int64"), "payload": payloads})


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from pgvecto_rs_spark.operators import multimodal as MM
    from pgvecto_rs_spark.session import get_spark

    spark = get_spark(
        "multimodal-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")

    img_bytes = n * (15 + IMG_W * IMG_H * 3)
    wav_bytes = n * (44 + WAV_N)

    base = spark.range(n).repartition(64)

    t0 = time.time()
    media = base.mapInPandas(_synth_images, "doc_id bigint, payload binary")
    feats = MM.decode_image_features(media, id_col="doc_id")
    img_row = (
        feats.select(
            F.size("feature").alias("npx"),
            F.element_at("feature", 1).alias("p0"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("npx").alias("total_px"),
            F.sum("p0").alias("sum_p0"),
        )
        .collect()[0]
    )
    t_img = time.time() - t0
    assert img_row["n"] == n and img_row["total_px"] == n * 64, img_row

    t0 = time.time()
    wavs = base.mapInPandas(_synth_wavs, "doc_id bigint, payload binary")
    stats = MM.decode_audio_stats(wavs, id_col="doc_id")
    wav_row = stats.agg(
        F.count("*").alias("n"),
        F.sum("n_samples").alias("total_samples"),
        F.sum("energy").alias("total_energy"),
        F.sum("zero_crossings").alias("total_zc"),
    ).collect()[0]
    t_wav = time.time() - t0
    assert wav_row["n"] == n and wav_row["total_samples"] == n * WAV_N, wav_row

    # compressed codecs: every row is a REAL entropy decode (Huffman +
    # IDCT for JPEG; inflate + Paeth unfilter for PNG) — the paths the
    # table-driven _BitReader / list-loop unfilter made scale-viable
    n_codec = max(1_000, n // 10)
    base_c = spark.range(n_codec).repartition(64)
    codec_out = {}
    for name, synth in (("jpeg", _synth_jpegs), ("png", _synth_pngs)):
        t0 = time.time()
        media = base_c.mapInPandas(synth, "doc_id bigint, payload binary")
        feats = MM.decode_image_features(media, id_col="doc_id")
        row = feats.agg(
            F.count("*").alias("n"), F.sum(F.size("feature")).alias("total_px")
        ).collect()[0]
        dt = time.time() - t0
        assert row["n"] == n_codec, (name, row)
        codec_out[f"{name}_decode_s"] = round(dt, 2)
        codec_out[f"{name}_rows_per_s"] = round(n_codec / dt)
        codec_out[f"{name}_mpx_per_s"] = round(
            n_codec * JPEG_W * JPEG_H / dt / 1e6, 1
        )

    # MP4 container indexing: every row a real moov/stbl walk over a
    # 30-sample file — the per-payload cost a 100 TB video corpus pays
    # for frame SELECTION (no pixel decode, r8)
    def _synth_mp4s(it):
        import pandas as pd

        from pgvecto_rs_spark.operators.mp4 import encode_mp4

        for pdf in it:
            payloads = []
            for did in pdf["id"]:
                did = int(did)
                pls = [bytes([(did + i) % 256]) * (200 + (did + i) % 64)
                       for i in range(30)]
                payloads.append(
                    encode_mp4(
                        pls,
                        durations=[100 + (did + i) % 7 for i in range(30)],
                        keyframes=[i % 10 == 0 for i in range(30)],
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["id"].astype("int64"), "payload": payloads}
            )

    t0 = time.time()
    media = base_c.mapInPandas(_synth_mp4s, "doc_id bigint, payload binary")
    idx = MM.index_video_samples(media, id_col="doc_id")
    row = idx.agg(
        F.count("*").alias("n_samples"),
        F.sum(F.when(F.col("keyframe"), 1).otherwise(0)).alias("n_key"),
        F.sum("size").alias("total_bytes"),
    ).collect()[0]
    t_mp4 = time.time() - t0
    assert row["n_samples"] == n_codec * 30 and row["n_key"] == n_codec * 3, row
    codec_out["mp4_index_s"] = round(t_mp4, 2)
    codec_out["mp4_files_per_s"] = round(n_codec / t_mp4)
    codec_out["mp4_samples_per_s"] = round(n_codec * 30 / t_mp4)

    # H.264 IDR keyframe pixel decode (r9): every row is a real MP4
    # avcC walk + 3 CAVLC baseline I-frame decodes (PCM + DC-residual
    # MBs) reduced to exact plane stats — the per-payload cost the
    # keyframe leg of a video curation pipeline pays; only ~60-byte
    # stat rows leave the stage
    def _synth_idr_mp4s(it):
        import numpy as np
        import pandas as pd

        from pgvecto_rs_spark.operators.h264 import (
            encode_idr_stream, split_annexb)
        from pgvecto_rs_spark.operators.mp4 import encode_mp4

        for pdf in it:
            payloads = []
            for did in pdf["id"]:
                did = int(did)
                samples, sps, pps = [], None, None
                for s in range(3):
                    v = 20 + (did * 7 + s * 13) % 200
                    plan = [
                        {"type": "pcm", "y": np.full((16, 16), v),
                         "cb": np.full((8, 8), 90), "cr": np.full((8, 8), 110)},
                        {"type": "i16", "pred": 1, "chroma_mode": 1,
                         "dc": [(did + s) % 9 - 4] + [0] * 15},
                    ]
                    sps, pps, idr = split_annexb(
                        encode_idr_stream(plan, 2, 1, qp=28))
                    samples.append(len(idr).to_bytes(4, "big") + idr)
                payloads.append(
                    encode_mp4(samples, sps=sps, pps=pps, width=32, height=16))
            yield pd.DataFrame(
                {"doc_id": pdf["id"].astype("int64"), "payload": payloads}
            )

    t0 = time.time()
    media = base_c.mapInPandas(_synth_idr_mp4s, "doc_id bigint, payload binary")
    kf = MM.decode_video_keyframes(media, id_col="doc_id")
    row = kf.agg(
        F.count("*").alias("n_frames"),
        F.sum("luma_sum").alias("total_luma"),
    ).collect()[0]
    t_idr = time.time() - t0
    assert row["n_frames"] == n_codec * 3, row
    codec_out["h264_idr_decode_s"] = round(t_idr, 2)
    codec_out["h264_frames_per_s"] = round(n_codec * 3 / t_idr)

    print(
        json.dumps(
            {
                "experiment": "multimodal_scale",
                "n_rows": n,
                "image_decode_s": round(t_img, 2),
                "image_rows_per_s": round(n / t_img),
                "image_mb_per_s": round(img_bytes / t_img / 1e6, 1),
                "audio_decode_s": round(t_wav, 2),
                "audio_rows_per_s": round(n / t_wav),
                "audio_mb_per_s": round(wav_bytes / t_wav / 1e6, 1),
                "total_energy": int(wav_row["total_energy"]),
                "n_codec_rows": n_codec,
                **codec_out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
