"""MP3 container-level indexing + ID3 tag extraction, pure stdlib.

The audio analogue of ``operators.mp4``: web-scale audio corpora are
overwhelmingly MP3, and everything a curation pipeline needs short of
PCM lives in the frame headers and the ID3 tag — per-frame byte
extents (segmentation / byte-range planning), bitrate/sample-rate/
channel layout (quality filtering), exact duration (length filtering),
and the ID3v2 text frames (title/artist/album/language metadata).
All of that is exactly recoverable with a header walk:

- MPEG-1/2/2.5 Layer III frame headers: 11-bit sync, version/layer
  bits, bitrate + sample-rate table lookups, padding — frame size =
  (144000 or 72000) * bitrate_kbps / sample_rate + padding.
- ID3v2.3/2.4 at the start (syncsafe tag size; per-frame plain or
  syncsafe sizes; text frames in ISO-8859-1 / UTF-16(+BOM) / UTF-16BE
  / UTF-8), ID3v1 trailer tolerated and skipped.

The MDCT/huffman PCM decode genuinely belongs to a compiled codec and
stays out of scope, exactly like H.264 inter frames — this module is
the honest container layer, rejected loudly on structural corruption
(ValueError) so the uniform ``on_error`` ingest policy applies.

The encoder twin (``encode_mp3``) writes spec-shaped files (real
header bit-fields, deterministic filler payloads, a real ID3v2.3 tag)
so fixtures are valid files and oracles can recompute every frame
offset/size in pure SQL.

Reference parity: N/A — /root/reference (pgvecto.rs) has no media
surface; engine extension like the rest of the codec family.
"""

from __future__ import annotations

import struct

__all__ = ["encode_mp3", "index_mp3_frames", "is_mp3"]

# bitrate tables (kbps), index 1..14; 0 = free-format (rejected), 15 = bad
_BITRATES_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                  256, 320]
_BITRATES_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
                  160]
_RATES = {3: [44100, 48000, 32000],   # MPEG-1
          2: [22050, 24000, 16000],   # MPEG-2
          0: [11025, 12000, 8000]}    # MPEG-2.5


def is_mp3(payload: bytes) -> bool:
    """Sniff: ID3v2 tag or an MPEG Layer III frame sync at offset 0."""
    if payload[:3] == b"ID3":
        return True
    if len(payload) >= 4 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0:
        return (payload[1] >> 1) & 3 == 1  # layer III
    return False


def _syncsafe(b: bytes) -> int:
    if any(x & 0x80 for x in b):
        raise ValueError("mp3: non-syncsafe byte in ID3 size")
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _decode_id3_text(data: bytes) -> str:
    if not data:
        return ""
    enc, body = data[0], data[1:]
    if enc == 0:
        s = body.decode("latin-1")
    elif enc == 1:
        s = body.decode("utf-16")  # BOM required
    elif enc == 2:
        s = body.decode("utf-16-be")
    elif enc == 3:
        s = body.decode("utf-8")
    else:
        raise ValueError(f"mp3: unknown ID3 text encoding {enc}")
    return s.rstrip("\x00")


def _parse_id3v2(data: bytes) -> tuple[dict, int]:
    """-> ({frame_id: text}, bytes_consumed).  Text (T***) frames only;
    others are skipped by size."""
    if data[:3] != b"ID3":
        return {}, 0
    if len(data) < 10:
        raise ValueError("mp3: truncated ID3v2 header")
    ver = data[3]
    if ver not in (3, 4):
        raise ValueError(f"mp3: ID3v2.{ver} not supported (2.3/2.4 only)")
    flags = data[5]
    if flags & 0x40:
        raise ValueError("mp3: ID3v2 extended header not supported")
    size = _syncsafe(data[6:10])
    end = 10 + size
    if end > len(data):
        raise ValueError("mp3: ID3v2 tag size overruns file")
    tags: dict[str, str] = {}
    pos = 10
    while pos + 10 <= end:
        fid = data[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        if not all(65 <= c <= 90 or 48 <= c <= 57 for c in fid):
            raise ValueError(f"mp3: invalid ID3 frame id {fid!r}")
        fsz = (_syncsafe(data[pos + 4 : pos + 8]) if ver == 4
               else struct.unpack(">I", data[pos + 4 : pos + 8])[0])
        if pos + 10 + fsz > end:
            raise ValueError("mp3: ID3 frame size overruns tag")
        if fid[0:1] == b"T":
            try:
                tags[fid.decode("ascii")] = _decode_id3_text(
                    data[pos + 10 : pos + 10 + fsz]
                )
            except UnicodeDecodeError as e:
                raise ValueError(f"mp3: undecodable ID3 text frame ({e})")
        pos += 10 + fsz
    return tags, end


def index_mp3_frames(payload: bytes) -> dict:
    """Walk every MPEG Layer III frame: ``{"tags": {...}, "frames":
    [(frame_no, offset, size, samples, bitrate_kbps, sample_rate,
    channels), ...], "duration_ms"}`` — 1-based frame numbers, byte
    offsets into ``payload``, all integers.

    Frames must tile the stream exactly (after the ID3v2 tag, before
    an optional 128-byte ID3v1 trailer); a broken sync, bad table
    index, free-format bitrate, or non-Layer-III frame raises
    ValueError — the uniform fuzz-pinned codec contract."""
    try:
        return _index_mp3(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"mp3: truncated field ({e})") from e


def _index_mp3(payload: bytes) -> dict:
    if not is_mp3(payload):
        raise ValueError("mp3: no ID3 tag or frame sync at offset 0")
    tags, pos = _parse_id3v2(payload)
    end = len(payload)
    if end - pos >= 128 and payload[end - 128 : end - 125] == b"TAG":
        end -= 128  # ID3v1 trailer
    frames = []
    while pos < end:
        if end - pos < 4:
            raise ValueError("mp3: trailing bytes too short for a frame header")
        h = struct.unpack(">I", payload[pos : pos + 4])[0]
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError(f"mp3: lost frame sync at offset {pos}")
        version = (h >> 19) & 3   # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
        layer = (h >> 17) & 3     # 1 = Layer III
        if version == 1:
            raise ValueError("mp3: reserved MPEG version id")
        if layer != 1:
            raise ValueError("mp3: not Layer III")
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 3
        padding = (h >> 9) & 1
        mode = (h >> 6) & 3
        if br_idx == 0 or br_idx == 15:
            raise ValueError("mp3: free-format/invalid bitrate index")
        if sr_idx == 3:
            raise ValueError("mp3: reserved sample-rate index")
        rate = _RATES[version][sr_idx]
        if version == 3:  # MPEG-1
            kbps = _BITRATES_V1L3[br_idx]
            size = 144000 * kbps // rate + padding
            samples = 1152
        else:  # MPEG-2 / 2.5 Layer III
            kbps = _BITRATES_V2L3[br_idx]
            size = 72000 * kbps // rate + padding
            samples = 576
        if pos + size > end:
            raise ValueError("mp3: frame extends past end of stream")
        frames.append(
            (len(frames) + 1, pos, size, samples, kbps, rate,
             1 if mode == 3 else 2)
        )
        pos += size
    if not frames:
        raise ValueError("mp3: no audio frames")
    # constant-rate streams are the norm; for mixed rates this is the
    # exact sum of per-frame durations in float-free integer math
    duration_ms = sum(s * 1000 // r for _n, _o, _z, s, _k, r, _c in frames)
    return {"tags": tags, "frames": frames, "duration_ms": duration_ms}


def _id3_frame(fid: str, text: str) -> bytes:
    body = b"\x03" + text.encode("utf-8")  # encoding 3 = UTF-8
    return fid.encode("ascii") + struct.pack(">I", len(body)) + b"\x00\x00" + body


def encode_mp3(
    n_frames: int,
    *,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    tags: dict | None = None,
    padding_pattern: int = 0,
    fill: int = 0xAA,
) -> bytes:
    """Spec-shaped MPEG-1/2 Layer III stream: real header bit-fields
    and table-consistent frame sizes with deterministic filler
    payloads (PCM decode is out of scope by design), preceded by a
    real ID3v2.3 tag when ``tags`` is given.

    ``padding_pattern``: bitmask — frame i sets the padding bit iff
    ``(padding_pattern >> (i % 8)) & 1``, so oracles can recompute
    every offset as a prefix sum of table sizes."""
    if n_frames < 1:
        raise ValueError("encode_mp3: need at least one frame")
    v1 = sample_rate in _RATES[3]
    rates = _RATES[3] if v1 else _RATES[2]
    if sample_rate not in rates:
        raise ValueError(f"encode_mp3: unsupported sample rate {sample_rate}")
    table = _BITRATES_V1L3 if v1 else _BITRATES_V2L3
    if bitrate_kbps not in table[1:]:
        raise ValueError(f"encode_mp3: unsupported bitrate {bitrate_kbps}")
    br_idx = table.index(bitrate_kbps)
    sr_idx = rates.index(sample_rate)

    out = bytearray()
    if tags:
        frames = b"".join(_id3_frame(k, v) for k, v in tags.items())
        out += b"ID3\x03\x00\x00" + bytes(
            [(len(frames) >> 21) & 0x7F, (len(frames) >> 14) & 0x7F,
             (len(frames) >> 7) & 0x7F, len(frames) & 0x7F]
        ) + frames
    base = (144000 if v1 else 72000) * bitrate_kbps // sample_rate
    for i in range(n_frames):
        pad = (padding_pattern >> (i % 8)) & 1
        h = (0x7FF << 21) | ((3 if v1 else 2) << 19) | (1 << 17) | (1 << 16)
        h |= (br_idx << 12) | (sr_idx << 10) | (pad << 9)
        h |= 1 << 6  # joint stereo
        out += struct.pack(">I", h)
        out += bytes([(fill + i) & 0xFF]) * (base + pad - 4)
    return bytes(out)
