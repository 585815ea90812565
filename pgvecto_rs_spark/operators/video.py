"""Motion-JPEG AVI video codec in pure stdlib + numpy.

Makes the video path of ``operators.multimodal`` REAL for one honest,
classic format: MJPEG-in-AVI (each frame an independent baseline JPEG
inside a RIFF container).  The RIFF walk is stdlib ``struct``; frame
decode reuses ``operators.jpeg``.  Modern inter-frame codecs (H.264 in
MP4) genuinely need ffmpeg and stay behind the ``fake=True`` contract.

The encoder writes a structurally-standard AVI (hdrl with avih/strh/
strf, movi with 00dc chunks, idx1) so fixtures are valid files, not
just parser-shaped bytes.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg

__all__ = ["decode_avi_frames", "encode_mjpeg_avi", "is_avi"]


def is_avi(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


def decode_avi_frames(payload: bytes) -> list[bytes]:
    """Extract per-frame JPEG payloads from an MJPEG AVI.

    Walks the RIFF tree to the 'movi' LIST and collects video-stream
    data chunks (fourcc ``..dc``/``..db``) whose payload is a JPEG.
    Tolerant of missing idx1 and of padding bytes (RIFF chunks are
    word-aligned).
    """
    if not is_avi(payload):
        raise ValueError("not a RIFF/AVI payload")

    frames: list[bytes] = []

    def walk(data: bytes, pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if fourcc == b"LIST":
                list_type = data[body_start : body_start + 4]
                if list_type in (b"movi", b"hdrl", b"strl"):
                    walk(data, body_start + 4, body_end)
            elif fourcc[2:4] in (b"dc", b"db"):
                body = data[body_start:body_end]
                if body[:2] == b"\xff\xd8":
                    frames.append(body)
            pos = body_end + (size & 1)  # word alignment

    walk(payload, 12, len(payload))
    return frames


def decode_avi_frame_arrays(payload: bytes) -> list[np.ndarray]:
    """Decoded float32 grayscale frames of an MJPEG AVI."""
    return [decode_jpeg(f) for f in decode_avi_frames(payload)]


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", list_type + data)


def encode_mjpeg_avi(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Encode uint8 grayscale/RGB frames (all same shape) as MJPEG AVI."""
    if not frames:
        raise ValueError("no frames")
    h, w = np.asarray(frames[0]).shape[:2]
    jpegs = [encode_jpeg(np.asarray(f)) for f in frames]
    max_size = max(len(j) for j in jpegs)

    # avih: MainAVIHeader (14 DWORDs)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        max_size * fps,  # max bytes per sec
        0,  # padding granularity
        0x10,  # flags: AVIF_HASINDEX
        len(jpegs),  # total frames
        0,  # initial frames
        1,  # streams
        max_size,  # suggested buffer size
        w,
        h,
        0, 0, 0, 0,  # reserved
    )
    # strh: AVIStreamHeader
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIIhhhh",
            0,  # flags
            0, 0,  # priority, language
            0,  # initial frames
            1, fps,  # scale, rate -> fps
            0,  # start
            len(jpegs),  # length (frames)
            max_size,  # suggested buffer
            0xFFFFFFFF & -1,  # quality (default)
            0,  # sample size (0 = varying)
            0, 0, int(w), int(h),  # rcFrame
        )
    )
    # strf: BITMAPINFOHEADER
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks = [_chunk(b"00dc", j) for j in jpegs]
    movi = _list(b"movi", b"".join(movi_chunks))
    # idx1: one entry per chunk (offset relative to movi list-type fourcc)
    idx_entries = []
    off = 4
    for j, ck in zip(jpegs, movi_chunks):
        idx_entries.append(b"00dc" + struct.pack("<III", 0x10, off, len(j)))
        off += len(ck)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
