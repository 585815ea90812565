"""Multimodal (image/audio/video) column handling for training-data
pipelines.

Design: media travels as an opaque ``binary`` payload column plus a
typed metadata struct; every transform is an Arrow-batched
``mapInPandas`` operator so bytes never round-trip through Python row
objects one at a time, and partition sizing (``target_batch_bytes``)
keeps executor memory bounded at 100 TB.

The *codec* layer (actual JPEG/PNG/audio decode) is stubbed: the
runtime image here has no imaging libraries, so decoders raise
``NotImplementedError`` unless a deterministic fake is requested.  The
Spark-side contract — schemas, batching, UDF signatures, partitioning —
is real and tested; swapping in PIL/ffmpeg later touches only
``_decode_image_bytes``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "decode_image_features",
    "sample_video_frames",
]

# media payload + typed metadata convention
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def _decode_image_bytes(payload: bytes, fake: bool) -> np.ndarray:
    """Codec boundary.  Real decode needs PIL/libjpeg — not present in
    this runtime; ``fake=True`` derives a deterministic 8x8 gray image
    from the payload bytes so pipelines are testable end-to-end."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this runtime; "
            "use fake=True for deterministic synthetic decode"
        )
    h = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8).astype(np.float32)
    return h.reshape(8, 8) / 255.0


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata pass: payload size + magic-byte sniffing, fully
    native (no decode)."""
    p = F.col(payload_col)
    magic = F.hex(F.substring(p, 1, 4))
    mime = (
        F.when(magic.startswith("FFD8"), F.lit("image/jpeg"))
        .when(magic.startswith("89504E47"), F.lit("image/png"))
        .when(magic.startswith("52494646"), F.lit("audio/wav"))
        .otherwise(F.lit("application/octet-stream"))
    )
    return df.withColumn("payload_bytes", F.length(p)).withColumn("sniffed_mime", mime)


def decode_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = False,
) -> DataFrame:
    """(id, feature vector) per image: decode -> 8x8 gray -> 64-dim
    feature (flattened), as a mapInPandas batch operator.  Output
    feature column is ``array<float>`` — directly indexable by the ANN
    layer (the batch-embedding north star)."""

    out_schema = f"{id_col} bigint, feature array<float>"

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                None
                if b is None
                else _decode_image_bytes(bytes(b), fake).reshape(-1).tolist()
                for b in pdf[payload_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col].astype("int64"), "feature": feats})

    return df.mapInPandas(op, out_schema)


def sample_video_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_n: int = 10,
    fake: bool = False,
) -> DataFrame:
    """(id, frame_no, frame_payload): frame sampling contract.  The
    fake codec treats the payload as a concatenation of 64-byte
    'frames' — the real implementation would call ffmpeg per batch.
    One input row fans out to n_frames/every_n rows; mapInPandas keeps
    the fan-out inside Arrow batches."""
    out_schema = f"{id_col} bigint, frame_no int, frame_payload binary"

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, frames, payloads = [], [], []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                if not fake:
                    raise NotImplementedError(
                        "video decode requires ffmpeg, absent in this runtime; use fake=True"
                    )
                raw = bytes(b)
                n_frames = max(1, len(raw) // 64)
                for fno in range(0, n_frames, every_n):
                    ids.append(int(mid))
                    frames.append(fno)
                    payloads.append(raw[fno * 64 : (fno + 1) * 64])
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"), "frame_no": pd.Series(frames, dtype="int32"), "frame_payload": payloads}
            )

    return df.mapInPandas(op, out_schema)
