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
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
