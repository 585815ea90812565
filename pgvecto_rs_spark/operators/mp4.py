"""ISO BMFF (MP4) container parsing in pure stdlib ``struct``.

Closes the r7 "inter-frame video" gap at the CONTAINER level: real
web-video corpora are H.264-in-MP4, and while pixel decode genuinely
needs a compiled codec (absent from this runtime — the ``fake=True``
contract in ``operators.multimodal`` stands), everything a curation
pipeline needs short of pixels lives in the ``moov/trak/mdia/minf/
stbl`` sample tables and is exactly recoverable with a box walk:

- per-sample decode timestamps (``stts`` run-length deltas),
- composition (presentation) offsets (``ctts``, for B-frame reorder),
- sync/keyframe flags (``stss``; absent means every sample syncs),
- byte offset + size of every sample (``stsc`` sample-to-chunk runs x
  ``stco``/``co64`` chunk offsets x ``stsz`` sizes),
- codec fourcc, width/height (``stsd`` visual sample entry), timescale
  and duration (``mdhd``).

That index is what frame *sampling* needs — pick every Nth sample or
keyframes only, slice the payload bytes at (offset, size) — so
``multimodal.sample_video_frames`` can be honest on MP4 input: the
sampled frame PAYLOADS (AVC access units) are real, only their pixel
decode stays behind the fake/NotImplementedError seam.

The encoder twin (``encode_mp4``) writes a structurally standard file
(ftyp | mdat | moov with a full avc1/avcC sample description) with a
FIXED prefix layout — ftyp is always 24 bytes, mdat data starts at
byte 32 — so test oracles can recompute every sample offset as
``32 + chunk/intra-chunk cumulative sizes`` in pure SQL.

Reference parity: N/A — /root/reference (pgvecto.rs) has no media
surface; this extends the engine for LLM-training-data work like the
rest of ``operators.multimodal``.
"""

from __future__ import annotations

import struct

__all__ = [
    "MP4_FTYP_SIZE",
    "MP4_MDAT_DATA_START",
    "encode_mp4",
    "extract_mp4_text_samples",
    "index_mp4_samples",
    "is_mp4",
]

MP4_FTYP_SIZE = 24  # encoder twin's fixed ftyp box size
MP4_MDAT_DATA_START = MP4_FTYP_SIZE + 8  # ftyp + mdat header


def is_mp4(payload: bytes) -> bool:
    """ISO BMFF sniff: a top-level ``ftyp`` box in the first 12 bytes."""
    return len(payload) >= 12 and payload[4:8] == b"ftyp"


# ---------------------------------------------------------------------------
# box walking
# ---------------------------------------------------------------------------


def _iter_boxes(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for the box sequence in
    ``data[pos:end]``.  Handles 64-bit ``size==1`` largesize boxes and
    ``size==0`` (box extends to end).  Malformed sizes raise ValueError
    — the ingest policy maps that to a NULL row, never a crash."""
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize box header")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(
                f"mp4: box {fourcc!r} size {size} overruns container"
            )
        yield fourcc, body, pos + size
        pos += size
    if pos != end:
        raise ValueError("mp4: trailing garbage after last box")


def _find(data: bytes, pos: int, end: int, fourcc: bytes):
    for fc, b, e in _iter_boxes(data, pos, end):
        if fc == fourcc:
            yield b, e


def _full(data: bytes, pos: int) -> tuple[int, int]:
    """(version, flags) of a full box body starting at ``pos``."""
    v = data[pos]
    flags = int.from_bytes(data[pos + 1 : pos + 4], "big")
    return v, flags


def _read_table(data: bytes, pos: int, end: int, fmt: str) -> list[tuple]:
    """FullBox with a u32 entry_count then ``fmt``-shaped entries."""
    if end - pos < 8:
        raise ValueError("mp4: truncated table box")
    (n,) = struct.unpack(">I", data[pos + 4 : pos + 8])
    sz = struct.calcsize(fmt)
    if end - (pos + 8) < n * sz:
        raise ValueError("mp4: table entry_count overruns box")
    return list(struct.iter_unpack(fmt, data[pos + 8 : pos + 8 + n * sz]))


# ---------------------------------------------------------------------------
# sample-table resolution
# ---------------------------------------------------------------------------


def index_mp4_samples(payload: bytes) -> dict:
    """Parse the FIRST video track's sample tables into a flat index.

    Returns ``{"codec", "width", "height", "timescale", "duration",
    "samples": [(sample_no, dts, pts, offset, size, keyframe), ...]}``
    with 1-based sample numbers, dts/pts in ``timescale`` units, and
    byte offsets into ``payload``.  All integers — engine-exact.

    Raises ``ValueError`` on anything structurally broken (truncated
    boxes, table overruns, offsets outside the file, no video track):
    the same fuzz-pinned exception contract as every other codec here,
    so ``on_error='null'`` ingest policy applies uniformly.
    """
    # Truncated boxes can cut a fixed-width field mid-slice (short stsd/
    # stsz/mdhd at EOF → struct.error; empty full-box body → IndexError).
    # Those are structural corruption too — normalize them to the one
    # documented exception so on_error='null' ingest never crashes.
    try:
        return _index_mp4_samples(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"mp4: truncated field ({e})") from e


def _index_mp4_samples(payload: bytes) -> dict:
    if not is_mp4(payload):
        raise ValueError("mp4: missing ftyp")
    moov = next(_find(payload, 0, len(payload), b"moov"), None)
    if moov is None:
        raise ValueError("mp4: no moov box")

    for trak_b, trak_e in _find(payload, moov[0], moov[1], b"trak"):
        mdia = next(_find(payload, trak_b, trak_e, b"mdia"), None)
        if mdia is None:
            continue
        hdlr = next(_find(payload, mdia[0], mdia[1], b"hdlr"), None)
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd = next(_find(payload, mdia[0], mdia[1], b"mdhd"), None)
        minf = next(_find(payload, mdia[0], mdia[1], b"minf"), None)
        if mdhd is None or minf is None:
            raise ValueError("mp4: video track missing mdhd/minf")
        v, _ = _full(payload, mdhd[0])
        if v == 1:
            timescale, duration = struct.unpack(
                ">IQ", payload[mdhd[0] + 20 : mdhd[0] + 32]
            )
        else:
            timescale, duration = struct.unpack(
                ">II", payload[mdhd[0] + 12 : mdhd[0] + 20]
            )
        stbl = next(_find(payload, minf[0], minf[1], b"stbl"), None)
        if stbl is None:
            raise ValueError("mp4: video track missing stbl")
        return _resolve_stbl(payload, stbl[0], stbl[1], timescale, duration)
    raise ValueError("mp4: no video track")


def _sample_rows(data: bytes, boxes: dict) -> list[tuple]:
    """stts/ctts/stss/stsz/stsc/stco(co64) -> per-sample
    (sample_no, dts, pts, offset, size, keyframe) rows — the
    handler-agnostic core shared by the video index and the text
    (caption) track extractor."""
    # stsz: fixed-size or per-sample table.  A fuzzed/corrupt count can
    # claim billions of samples; more samples than container bytes is
    # structurally impossible for real media, so bound expansion there
    # (same spirit as the table-overrun checks — never trust a u32).
    zb, ze = boxes[b"stsz"]
    fixed, n_samples = struct.unpack(">II", data[zb + 4 : zb + 12])
    if n_samples > len(data):
        raise ValueError("mp4: stsz sample count exceeds container size")
    if fixed:
        sizes = [fixed] * n_samples
    else:
        if ze - (zb + 12) < n_samples * 4:
            raise ValueError("mp4: stsz overruns box")
        sizes = list(
            struct.unpack(f">{n_samples}I", data[zb + 12 : zb + 12 + n_samples * 4])
        )

    # stts → per-sample dts (cumulative run-length deltas); only the
    # first n_samples matter, and run counts are untrusted u32s — clamp
    # each run so a corrupt count can't drive an unbounded loop
    dts, t = [], 0
    for count, delta in _read_table(data, *boxes[b"stts"], ">II"):
        for _ in range(min(count, n_samples - len(dts))):
            dts.append(t)
            t += delta
        if len(dts) >= n_samples:
            break
    if len(dts) < n_samples:
        raise ValueError("mp4: stts covers fewer samples than stsz")

    # ctts (optional) → composition offsets; version 1 entries are signed
    cts_off = [0] * n_samples
    if b"ctts" in boxes:
        cb = boxes[b"ctts"][0]
        v, _ = _full(data, cb)
        fmt = ">Ii" if v == 1 else ">II"
        i = 0
        for count, off in _read_table(data, *boxes[b"ctts"], fmt):
            for _ in range(min(count, n_samples - i)):
                cts_off[i] = off
                i += 1
            if i >= n_samples:
                break

    # stss (optional) → keyframes; absent means all samples sync
    if b"stss" in boxes:
        sync = {s for (s,) in _read_table(data, *boxes[b"stss"], ">I")}
        keyframe = [(i + 1) in sync for i in range(n_samples)]
    else:
        keyframe = [True] * n_samples

    # stsc runs x stco/co64 → per-sample chunk + intra-chunk offset
    if b"co64" in boxes:
        chunk_offsets = [o for (o,) in _read_table(data, *boxes[b"co64"], ">Q")]
    else:
        chunk_offsets = [o for (o,) in _read_table(data, *boxes[b"stco"], ">I")]
    runs = _read_table(data, *boxes[b"stsc"], ">III")
    offsets: list[int] = []
    si = 0
    n_chunks = len(chunk_offsets)
    for ri, (first, per_chunk, _desc) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else n_chunks
        if first < 1 or per_chunk < 1 or last > n_chunks:
            raise ValueError("mp4: stsc run out of range")
        for ci in range(first - 1, last):
            off = chunk_offsets[ci]
            for _ in range(per_chunk):
                if si >= n_samples:
                    break
                offsets.append(off)
                off += sizes[si]
                si += 1
    if si < n_samples:
        raise ValueError("mp4: stsc/stco cover fewer samples than stsz")
    for o, z in zip(offsets, sizes):
        if o + z > len(data):
            raise ValueError("mp4: sample extends past end of file")

    samples = [
        (i + 1, dts[i], dts[i] + cts_off[i], offsets[i], sizes[i], keyframe[i])
        for i in range(n_samples)
    ]
    return samples


def _stbl_boxes(data: bytes, pos: int, end: int) -> dict:
    boxes = {fc: (b, e) for fc, b, e in _iter_boxes(data, pos, end)}
    for req in (b"stsd", b"stts", b"stsz", b"stsc"):
        if req not in boxes:
            raise ValueError(f"mp4: stbl missing {req.decode()}")
    if b"stco" not in boxes and b"co64" not in boxes:
        raise ValueError("mp4: stbl missing stco/co64")
    return boxes


def _resolve_stbl(
    data: bytes, pos: int, end: int, timescale: int, duration: int
) -> dict:
    boxes = _stbl_boxes(data, pos, end)

    # stsd: first visual sample entry — codec fourcc at +8, width/height
    # at +32/+34 within the entry (6 reserved + 2 dref idx + 16 predefined)
    sb, se = boxes[b"stsd"]
    (n_desc,) = struct.unpack(">I", data[sb + 4 : sb + 8])
    if n_desc < 1 or se - sb < 8 + 44:
        raise ValueError("mp4: empty/truncated stsd")
    entry = sb + 8
    codec = data[entry + 4 : entry + 8].decode("ascii", "replace")
    width, height = struct.unpack(">HH", data[entry + 32 : entry + 36])
    # avcC (AVCDecoderConfigurationRecord) inside the visual sample
    # entry, after the 78-byte fixed part: out-of-band SPS/PPS + the
    # NAL length-prefix size — what an H.264 IDR pixel decode needs
    avcc = None
    (entry_size,) = struct.unpack(">I", data[entry : entry + 4])
    entry_end = min(entry + entry_size, se)
    if codec in ("avc1", "avc3") and entry_end - entry > 86:
        for fc, ab, ae in _iter_boxes(data, entry + 86, entry_end):
            if fc != b"avcC" or ae - ab < 7:
                continue
            nls = (data[ab + 4] & 3) + 1
            pos2 = ab + 5
            sps_list, pps_list = [], []
            n_sps = data[pos2] & 0x1F
            pos2 += 1
            for _ in range(n_sps):
                (ln,) = struct.unpack(">H", data[pos2 : pos2 + 2])
                sps_list.append(data[pos2 + 2 : pos2 + 2 + ln])
                pos2 += 2 + ln
            n_pps = data[pos2]
            pos2 += 1
            for _ in range(n_pps):
                (ln,) = struct.unpack(">H", data[pos2 : pos2 + 2])
                pps_list.append(data[pos2 + 2 : pos2 + 2 + ln])
                pos2 += 2 + ln
            if pos2 > ae:
                raise ValueError("mp4: truncated avcC parameter sets")
            avcc = {"nal_length_size": nls, "sps": sps_list, "pps": pps_list}
            break

    samples = _sample_rows(data, boxes)
    return {
        "codec": codec,
        "width": int(width),
        "height": int(height),
        "timescale": int(timescale),
        "duration": int(duration),
        "samples": samples,
        "avcc": avcc,
    }


def extract_mp4_text_samples(payload: bytes) -> dict:
    """Extract the FIRST text/subtitle track (handler ``text``/``sbtl``/
    ``subt``, ``tx3g`` sample entries — 3GPP timed text, the common
    caption format in MP4): ``{"timescale", "duration", "samples":
    [(sample_no, dts, dur, text), ...]}`` with dts/dur in timescale
    units and ``text`` decoded UTF-8.

    Caption harvesting is a first-class training-data source (aligned
    text supervision for video); this stays container-exact like the
    video index — sample bytes are sliced at their (offset, size) and
    a tx3g sample is just ``u16 length + UTF-8`` (+ optional modifier
    boxes, ignored).  ValueError on structural corruption;
    NotImplementedError for non-tx3g text sample entries."""
    try:
        return _extract_mp4_text(payload)
    except (struct.error, IndexError, UnicodeDecodeError) as e:
        raise ValueError(f"mp4: truncated/invalid text field ({e})") from e


def _extract_mp4_text(payload: bytes) -> dict:
    if not is_mp4(payload):
        raise ValueError("mp4: missing ftyp")
    moov = next(_find(payload, 0, len(payload), b"moov"), None)
    if moov is None:
        raise ValueError("mp4: no moov box")
    for trak_b, trak_e in _find(payload, moov[0], moov[1], b"trak"):
        mdia = next(_find(payload, trak_b, trak_e, b"mdia"), None)
        if mdia is None:
            continue
        hdlr = next(_find(payload, mdia[0], mdia[1], b"hdlr"), None)
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] not in (
            b"text", b"sbtl", b"subt"
        ):
            continue
        mdhd = next(_find(payload, mdia[0], mdia[1], b"mdhd"), None)
        minf = next(_find(payload, mdia[0], mdia[1], b"minf"), None)
        if mdhd is None or minf is None:
            raise ValueError("mp4: text track missing mdhd/minf")
        v, _ = _full(payload, mdhd[0])
        if v == 1:
            timescale, duration = struct.unpack(
                ">IQ", payload[mdhd[0] + 20 : mdhd[0] + 32]
            )
        else:
            timescale, duration = struct.unpack(
                ">II", payload[mdhd[0] + 12 : mdhd[0] + 20]
            )
        stbl = next(_find(payload, minf[0], minf[1], b"stbl"), None)
        if stbl is None:
            raise ValueError("mp4: text track missing stbl")
        boxes = _stbl_boxes(payload, stbl[0], stbl[1])
        sb, se = boxes[b"stsd"]
        (n_desc,) = struct.unpack(">I", payload[sb + 4 : sb + 8])
        if n_desc < 1 or se - sb < 8 + 16:
            raise ValueError("mp4: empty/truncated text stsd")
        entry = sb + 8
        fourcc = payload[entry + 4 : entry + 8]
        if fourcc != b"tx3g":
            raise NotImplementedError(
                f"mp4: text sample entry {fourcc!r} not supported (tx3g only)"
            )
        rows = _sample_rows(payload, boxes)
        # per-sample durations from the stts runs (clamped like dts)
        durs: list[int] = []
        for count, delta in _read_table(payload, *boxes[b"stts"], ">II"):
            for _ in range(min(count, len(rows) - len(durs))):
                durs.append(delta)
            if len(durs) >= len(rows):
                break
        samples = []
        for (no, dts, _pts, off, size, _kf), dur in zip(rows, durs):
            if size < 2:
                raise ValueError("mp4: tx3g sample shorter than its header")
            (tlen,) = struct.unpack(">H", payload[off : off + 2])
            if 2 + tlen > size:
                raise ValueError("mp4: tx3g text length overruns sample")
            samples.append(
                (no, dts, dur, payload[off + 2 : off + 2 + tlen].decode("utf-8"))
            )
        return {
            "timescale": int(timescale),
            "duration": int(duration),
            "samples": samples,
        }
    raise ValueError("mp4: no text track")


# ---------------------------------------------------------------------------
# encoder twin (fixtures / deterministic synthetic corpora)
# ---------------------------------------------------------------------------


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _fullbox(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, bytes([version]) + flags.to_bytes(3, "big") + body)


def _rle(values: list[int]) -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    for v in values:
        if out and out[-1][1] == v:
            out[-1] = (out[-1][0] + 1, v)
        else:
            out.append((1, v))
    return out


def encode_mp4(
    sample_payloads: list[bytes],
    *,
    durations: list[int] | None = None,
    cts_offsets: list[int] | None = None,
    keyframes: list[bool] | None = None,
    timescale: int = 1000,
    width: int = 64,
    height: int = 48,
    samples_per_chunk: int = 2,
    co64: bool = False,
    sps: bytes | None = None,
    pps: bytes | None = None,
    text_samples: list | None = None,
) -> bytes:
    """Structurally standard single-video-track MP4: ``ftyp | mdat |
    moov`` with a full avc1+avcC sample description and real stts/
    ctts/stss/stsc/stsz/stco(co64) tables.

    Layout contract for oracles: ftyp is exactly ``MP4_FTYP_SIZE``
    bytes, mdat data begins at ``MP4_MDAT_DATA_START``, samples are
    laid out back-to-back in order, grouped into chunks of
    ``samples_per_chunk``.  Sample payload bytes are whatever the
    caller passes (deterministic fake access units in tests — pixel
    decode is out of scope by design).

    ``text_samples`` (optional): list of ``(text, duration)`` adds a
    second trak — a 3GPP timed-text (tx3g) caption track whose sample
    bytes (``u16 length + UTF-8``) follow the video samples in mdat,
    one chunk; ``extract_mp4_text_samples`` reads it back exactly.
    """
    n = len(sample_payloads)
    if n == 0:
        raise ValueError("encode_mp4: need at least one sample")
    durations = durations or [100] * n
    cts_offsets = cts_offsets if cts_offsets is not None else [0] * n
    keyframes = keyframes if keyframes is not None else [True] * n
    if not (len(durations) == len(cts_offsets) == len(keyframes) == n):
        raise ValueError("encode_mp4: per-sample lists must match payloads")

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom" + b"avc1")
    assert len(ftyp) == MP4_FTYP_SIZE
    text_payloads = [
        struct.pack(">H", len(t.encode("utf-8"))) + t.encode("utf-8")
        for t, _d in (text_samples or [])
    ]
    mdat_data = b"".join(sample_payloads) + b"".join(text_payloads)
    mdat = _box(b"mdat", mdat_data)

    sizes = [len(p) for p in sample_payloads]
    offs, o = [], MP4_MDAT_DATA_START
    for z in sizes:
        offs.append(o)
        o += z
    chunk_offsets = [offs[i] for i in range(0, n, samples_per_chunk)]

    total = sum(durations)
    mvhd = _fullbox(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, total)
        + struct.pack(">ihhII", 0x00010000, 0x0100, 0, 0, 0)
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + struct.pack(">6I", 0, 0, 0, 0, 0, 0)
        + struct.pack(">I", 2),
    )
    tkhd = _fullbox(
        b"tkhd",
        0,
        7,
        struct.pack(">IIIII", 0, 0, 1, 0, total)
        + struct.pack(">IIhhhh", 0, 0, 0, 0, 0, 0)
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _fullbox(
        b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale, total, 0x55C4, 0)
    )
    hdlr = _fullbox(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + bytes(12) + b"VideoHandler\x00",
    )
    vmhd = _fullbox(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dinf = _box(
        b"dinf", _fullbox(b"dref", 0, 0, struct.pack(">I", 1) + _fullbox(b"url ", 0, 1, b""))
    )

    # avcC parameter sets: callers with REAL streams (operators.h264
    # encoder twin) pass their own SPS/PPS so samples are decodable;
    # the default is a deterministic fake (constrained-baseline ids)
    # for container-only fixtures
    if sps is None:
        sps = bytes([0x67, 0x42, 0xC0, 0x1E, 0x8C, 0x8D, 0x40, width >> 3,
                     height >> 3])
    if pps is None:
        pps = bytes([0x68, 0xCE, 0x3C, 0x80])
    avcc = _box(
        b"avcC",
        bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
        + struct.pack(">H", len(sps)) + sps
        + bytes([1]) + struct.pack(">H", len(pps)) + pps,
    )
    avc1 = _box(
        b"avc1",
        bytes(6)
        + struct.pack(">H", 1)
        + bytes(16)
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)
        + bytes(32)
        + struct.pack(">Hh", 24, -1)
        + avcc,
    )
    stsd = _fullbox(b"stsd", 0, 0, struct.pack(">I", 1) + avc1)
    stts = _fullbox(
        b"stts", 0, 0,
        struct.pack(">I", len(_rle(durations)))
        + b"".join(struct.pack(">II", c, v) for c, v in _rle(durations)),
    )
    boxes_stbl = [stsd, stts]
    if any(cts_offsets):
        runs = _rle(cts_offsets)
        boxes_stbl.append(
            _fullbox(
                b"ctts", 0, 0,
                struct.pack(">I", len(runs))
                + b"".join(struct.pack(">II", c, v) for c, v in runs),
            )
        )
    if not all(keyframes):
        sync = [i + 1 for i, k in enumerate(keyframes) if k]
        boxes_stbl.append(
            _fullbox(
                b"stss", 0, 0,
                struct.pack(">I", len(sync))
                + b"".join(struct.pack(">I", s) for s in sync),
            )
        )
    # one stsc run unless the tail chunk is short
    runs = [(1, samples_per_chunk, 1)]
    tail = n % samples_per_chunk
    if tail and n > samples_per_chunk:
        runs.append((len(chunk_offsets), tail, 1))
    elif tail:
        runs = [(1, tail, 1)]
    boxes_stbl.append(
        _fullbox(
            b"stsc", 0, 0,
            struct.pack(">I", len(runs))
            + b"".join(struct.pack(">III", *r) for r in runs),
        )
    )
    boxes_stbl.append(
        _fullbox(
            b"stsz", 0, 0,
            struct.pack(">II", 0, n) + b"".join(struct.pack(">I", z) for z in sizes),
        )
    )
    if co64:
        boxes_stbl.append(
            _fullbox(
                b"co64", 0, 0,
                struct.pack(">I", len(chunk_offsets))
                + b"".join(struct.pack(">Q", c) for c in chunk_offsets),
            )
        )
    else:
        boxes_stbl.append(
            _fullbox(
                b"stco", 0, 0,
                struct.pack(">I", len(chunk_offsets))
                + b"".join(struct.pack(">I", c) for c in chunk_offsets),
            )
        )
    stbl = _box(b"stbl", b"".join(boxes_stbl))
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)

    text_trak = b""
    if text_samples:
        t_durs = [int(d) for _t, d in text_samples]
        t_total = sum(t_durs)
        t_sizes = [len(p) for p in text_payloads]
        t_start = MP4_MDAT_DATA_START + sum(sizes)
        t_tkhd = _fullbox(
            b"tkhd", 0, 7,
            struct.pack(">IIIII", 0, 0, 2, 0, t_total)
            + struct.pack(">IIhhhh", 0, 0, 0, 0, 0, 0)
            + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                          0x40000000)
            + struct.pack(">II", width << 16, height << 16),
        )
        t_mdhd = _fullbox(
            b"mdhd", 0, 0,
            struct.pack(">IIIIHH", 0, 0, timescale, t_total, 0x55C4, 0),
        )
        t_hdlr = _fullbox(
            b"hdlr", 0, 0,
            struct.pack(">I", 0) + b"text" + bytes(12) + b"TextHandler\x00",
        )
        # tx3g sample entry (3GPP TS 26.245): display flags,
        # justification, bg color, default text box, style record,
        # font table
        tx3g = _box(
            b"tx3g",
            bytes(6) + struct.pack(">H", 1)
            + struct.pack(">I", 0)          # displayFlags
            + struct.pack(">bb", 1, -1)     # h/v justification
            + bytes([0, 0, 0, 0])           # background RGBA
            + struct.pack(">HHHH", 0, 0, height, width)  # BoxRecord
            + struct.pack(">HHHBB", 0, 0, 1, 0, 12)      # StyleRecord
            + bytes([0, 0, 0, 255])         # text RGBA
            + _box(b"ftab", struct.pack(">HHB", 1, 1, 5) + b"Serif"),
        )
        t_boxes = [
            _fullbox(b"stsd", 0, 0, struct.pack(">I", 1) + tx3g),
            _fullbox(
                b"stts", 0, 0,
                struct.pack(">I", len(_rle(t_durs)))
                + b"".join(struct.pack(">II", c, v) for c, v in _rle(t_durs)),
            ),
            _fullbox(
                b"stsc", 0, 0,
                struct.pack(">I", 1) + struct.pack(">III", 1, len(t_sizes), 1),
            ),
            _fullbox(
                b"stsz", 0, 0,
                struct.pack(">II", 0, len(t_sizes))
                + b"".join(struct.pack(">I", z) for z in t_sizes),
            ),
            _fullbox(b"stco", 0, 0, struct.pack(">II", 1, t_start)),
        ]
        t_stbl = _box(b"stbl", b"".join(t_boxes))
        # null media header for timed text
        t_minf = _box(
            b"minf", _fullbox(b"nmhd", 0, 0, b"") + dinf + t_stbl
        )
        t_mdia = _box(b"mdia", t_mdhd + t_hdlr + t_minf)
        text_trak = _box(b"trak", t_tkhd + t_mdia)

    moov = _box(b"moov", mvhd + trak + text_trak)
    return ftyp + mdat + moov
