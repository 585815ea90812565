"""Ogg container indexing + Opus/Vorbis metadata, pure stdlib.

Completes the audio container matrix (FLAC = lossless decode, WAV =
PCM decode, MP3 = frame index + ID3, Ogg/Opus = page index + tags):
web audio/speech corpora ship heavily as Opus-in-Ogg, and the curation
layer needs the PAGE STRUCTURE (byte extents for range planning,
granule positions for exact duration/segmentation, stream serials for
demux) and the VorbisComment metadata (title/artist/language/license
tags) — none of which needs the SILK/CELT decode, which belongs to a
compiled codec and stays out of scope like H.264 inter frames.

Everything here is exactly recoverable and fully verified:

- Ogg pages (RFC 3533): capture pattern, version 0, header-type flags
  (continuation/BOS/EOS), 64-bit granule, serial, sequence, the page
  CRC-32 (poly 0x04C11DB7, non-reflected, init/xorout 0 — CHECKED per
  page, corrupt pages are rejected, not skipped), lacing table.
- OpusHead (RFC 7845 §5.1): version, channel count, pre-skip, input
  sample rate, output gain, mapping family.
- OpusTags / VorbisComment (RFC 7845 §5.2): vendor string + KEY=value
  user comments, UTF-8.

The encoder twin (``encode_ogg_opus``) writes spec-valid streams
(real CRCs, real lacing) so fixtures are valid files and oracles can
recompute every page offset/size in pure SQL.

Reference parity: N/A — /root/reference (pgvecto.rs) has no media
surface; engine extension like the rest of the codec family.
"""

from __future__ import annotations

import struct

__all__ = [
    "encode_ogg_opus",
    "extract_opus_tags",
    "index_ogg_pages",
    "is_ogg",
]


def is_ogg(payload: bytes) -> bool:
    return payload[:4] == b"OggS"


def _crc_table() -> list[int]:
    tbl = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7 if r & 0x80000000 else r << 1) & 0xFFFFFFFF
        tbl.append(r)
    return tbl


_CRC = _crc_table()


def _ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC[((crc >> 24) & 0xFF) ^ b]
    return crc


def index_ogg_pages(payload: bytes) -> dict:
    """Walk every Ogg page: ``{"pages": [(page_no, offset, size,
    serial, granule, n_packets, bos, eos), ...], "codecs": {serial:
    codec}}`` — 1-based page numbers, byte offsets into ``payload``,
    ``n_packets`` = packets COMPLETED on the page, codec sniffed from
    each stream's first packet ("opus", "vorbis", "flac", "theora", or
    "unknown").  Page CRCs are verified; any structural corruption
    (bad capture pattern, version, CRC mismatch, truncated lacing)
    raises ValueError — the uniform fuzz-pinned codec contract."""
    try:
        return _index_ogg(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"ogg: truncated field ({e})") from e


_MAGIC = [(b"OpusHead", "opus"), (b"\x01vorbis", "vorbis"),
          (b"\x7fFLAC", "flac"), (b"\x80theora", "theora")]


def _index_ogg(payload: bytes) -> dict:
    if not is_ogg(payload):
        raise ValueError("ogg: missing OggS capture pattern")
    pages = []
    codecs: dict[int, str] = {}
    pos, n = 0, len(payload)
    while pos < n:
        if n - pos < 27:
            raise ValueError("ogg: truncated page header")
        if payload[pos : pos + 4] != b"OggS":
            raise ValueError(f"ogg: lost page sync at offset {pos}")
        if payload[pos + 4] != 0:
            raise ValueError("ogg: unsupported stream structure version")
        htype = payload[pos + 5]
        granule, serial, _seq, crc, nseg = struct.unpack(
            "<qIIIB", payload[pos + 6 : pos + 27]
        )
        lace = payload[pos + 27 : pos + 27 + nseg]
        if len(lace) < nseg:
            raise ValueError("ogg: truncated lacing table")
        body = sum(lace)
        size = 27 + nseg + body
        if pos + size > n:
            raise ValueError("ogg: page body extends past end of stream")
        page = bytearray(payload[pos : pos + size])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != crc:
            raise ValueError(f"ogg: page CRC mismatch at offset {pos}")
        n_packets = sum(1 for v in lace if v < 255)
        bos, eos = bool(htype & 2), bool(htype & 4)
        if bos and serial not in codecs:
            first = payload[pos + 27 + nseg : pos + 27 + nseg + 16]
            codecs[serial] = next(
                (name for magic, name in _MAGIC if first.startswith(magic)),
                "unknown",
            )
        pages.append(
            (len(pages) + 1, pos, size, serial, granule, n_packets, bos, eos)
        )
        pos += size
    if not pages:
        raise ValueError("ogg: no pages")
    return {"pages": pages, "codecs": codecs}


def extract_opus_tags(payload: bytes) -> dict:
    """OpusHead + OpusTags from the first Opus stream: ``{"channels",
    "pre_skip", "input_sample_rate", "output_gain", "vendor",
    "comments": {KEY: value}}`` — comment keys uppercased per the
    VorbisComment convention (keys are case-insensitive), values exact
    UTF-8.  ValueError on structural corruption; NotImplementedError
    when the stream is not Opus."""
    try:
        return _extract_opus_tags(payload)
    except struct.error as e:
        # a short unpack slice is genuine truncation; anything else
        # (e.g. an IndexError from a parser bug) propagates — the r10
        # broad catch masked parser defects as data errors
        raise ValueError(f"ogg: truncated field ({e})") from e
    except UnicodeDecodeError as e:
        raise ValueError(f"ogg: malformed UTF-8 in vendor/comment field ({e})") from e


def _extract_opus_tags(payload: bytes) -> dict:
    idx = index_ogg_pages(payload)
    opus_serial = next(
        (s for s, c in idx["codecs"].items() if c == "opus"), None
    )
    if opus_serial is None:
        raise NotImplementedError(
            f"ogg: no Opus stream (codecs: {sorted(idx['codecs'].values())})"
        )
    # reassemble the stream's packets across pages (255-lacing spans)
    packets: list[bytes] = []
    cur = bytearray()
    for _no, off, _size, serial, _g, _np, _bos, _eos in idx["pages"]:
        if serial != opus_serial:
            continue
        nseg = payload[off + 26]
        lace = payload[off + 27 : off + 27 + nseg]
        p = off + 27 + nseg
        for v in lace:
            cur += payload[p : p + v]
            p += v
            if v < 255:
                packets.append(bytes(cur))
                cur = bytearray()
        if len(packets) >= 2:
            break
    if len(packets) < 2:
        raise ValueError("ogg: missing OpusHead/OpusTags packets")
    head, tags = packets[0], packets[1]
    if not head.startswith(b"OpusHead") or len(head) < 19:
        raise ValueError("ogg: malformed OpusHead")
    if head[8] not in (1,):  # version
        raise ValueError(f"ogg: OpusHead version {head[8]} not supported")
    channels = head[9]
    pre_skip, rate = struct.unpack("<HI", head[10:16])
    (gain,) = struct.unpack("<h", head[16:18])
    if not tags.startswith(b"OpusTags"):
        raise ValueError("ogg: malformed OpusTags")
    pos = 8
    (vlen,) = struct.unpack("<I", tags[pos : pos + 4])
    pos += 4
    if pos + vlen > len(tags):
        raise ValueError("ogg: vendor string overruns OpusTags")
    vendor = tags[pos : pos + vlen].decode("utf-8")
    pos += vlen
    (count,) = struct.unpack("<I", tags[pos : pos + 4])
    pos += 4
    if count > len(tags):  # untrusted u32
        raise ValueError("ogg: comment count exceeds packet size")
    comments: dict[str, str] = {}
    for _ in range(count):
        (clen,) = struct.unpack("<I", tags[pos : pos + 4])
        pos += 4
        if pos + clen > len(tags):
            raise ValueError("ogg: comment overruns OpusTags")
        entry = tags[pos : pos + clen].decode("utf-8")
        pos += clen
        key, sep, val = entry.partition("=")
        if not sep:
            raise ValueError(f"ogg: comment without '=': {entry[:40]!r}")
        comments[key.upper()] = val
    return {
        "channels": channels,
        "pre_skip": pre_skip,
        "input_sample_rate": rate,
        "output_gain": gain,
        "vendor": vendor,
        "comments": comments,
    }


def _page(serial: int, seq: int, granule: int, htype: int,
          packets: list[bytes]) -> bytes:
    lace = bytearray()
    body = bytearray()
    for p in packets:
        q, r = divmod(len(p), 255)
        lace += b"\xff" * q + bytes([r])
        body += p
    hdr = (b"OggS\x00" + bytes([htype])
           + struct.pack("<qIII", granule, serial, seq, 0)
           + bytes([len(lace)]) + bytes(lace))
    crc = _ogg_crc(hdr + bytes(body))
    hdr = hdr[:22] + struct.pack("<I", crc) + hdr[26:]
    return hdr + bytes(body)


def encode_ogg_opus(
    n_audio_pages: int,
    *,
    comments: dict | None = None,
    channels: int = 2,
    pre_skip: int = 312,
    input_sample_rate: int = 48000,
    vendor: str = "pgvecto-rs-spark",
    packet_size: int = 100,
    samples_per_page: int = 960,
    serial: int = 1,
) -> bytes:
    """Spec-valid Opus-in-Ogg stream: OpusHead BOS page, OpusTags page,
    then ``n_audio_pages`` single-packet audio pages (deterministic
    filler payloads of ``packet_size`` bytes — SILK/CELT decode is out
    of scope by design) with granule ``samples_per_page * (i+1)``; the
    last page carries EOS.  Real lacing, real page CRCs."""
    if n_audio_pages < 1:
        raise ValueError("encode_ogg_opus: need at least one audio page")
    head = (b"OpusHead" + bytes([1, channels])
            + struct.pack("<HIh", pre_skip, input_sample_rate, 0)
            + bytes([0]))
    items = list((comments or {}).items())
    tags = (b"OpusTags" + struct.pack("<I", len(vendor.encode()))
            + vendor.encode() + struct.pack("<I", len(items)))
    for k, v in items:
        entry = f"{k}={v}".encode("utf-8")
        tags += struct.pack("<I", len(entry)) + entry
    out = bytearray()
    out += _page(serial, 0, 0, 2, [head])            # BOS
    out += _page(serial, 1, 0, 0, [tags])
    for i in range(n_audio_pages):
        pkt = bytes([(0x0B + i) & 0xFF]) * packet_size  # fake Opus TOC+data
        htype = 4 if i == n_audio_pages - 1 else 0      # EOS on last
        out += _page(serial, 2 + i, samples_per_page * (i + 1), htype, [pkt])
    return bytes(out)
