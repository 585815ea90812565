"""Baseline + progressive JPEG codec in pure numpy + stdlib — no
imaging library.

Closes the last stubbed codec surface in ``operators.multimodal``: the
reference treats media as opaque bytes plus typed metadata; here the
decode step itself is real for baseline (SOF0/1) and progressive (SOF2)
8-bit JPEG, grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling,
with restart-marker support.  Progressive covers spectral selection,
successive approximation, EOB runs and refinement correction bits
(T.81 Annex G.1.2) — real web-crawl corpora are majority-progressive,
so an ingest path that nulls SOF2 would drop most of the data.
Hierarchical and arithmetic coding raise ``NotImplementedError``.

The encoder exists so tests and pipelines can produce valid JPEG
fixtures without PIL: standard Annex-K quantization + Huffman tables
(plus a generated EOBn-complete AC table for progressive scans),
4:4:4 color or single-component grayscale, baseline or a 4-stage
progressive scan script that quantizes identically to baseline — the
round-trip equality tests pin decode(progressive) == decode(baseline)
bit-for-bit.

Huffman bit IO is sequential by definition; DCT/IDCT, dequantization,
level shift and color conversion are vectorized numpy.  At 100 TB-scale
image pipelines the module boundary (`decode_jpeg` / `encode_jpeg`) is
exactly where a compiled codec would be swapped in — the Spark-side
contract in ``multimodal.py`` is unchanged.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

# ---------------------------------------------------------------------------
# shared tables

# zigzag order: _ZIGZAG[i] = raster index of the i-th coefficient in scan order
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# ITU-T T.81 Annex K.1 example quantization tables (quality 50)
_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

# Annex K.3 typical Huffman tables: (bits[1..16] counts, values)
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# AC table for progressive scans: the Annex-K baseline tables define no
# EOBn symbols (r<<4 for r >= 1), which progressive end-of-band runs
# require (G.1.2.2).  One flat canonical table — every symbol we can
# emit at code length 8 (240 symbols in the 256-slot space; valid by
# Kraft, deliberately simple rather than optimal) — shared by luma and
# chroma progressive AC scans as table id 2.
_HUFF_AC_PROGRESSIVE = (
    [0, 0, 0, 0, 0, 0, 0, 240, 0, 0, 0, 0, 0, 0, 0, 0],
    sorted(
        [r << 4 for r in range(15)]          # EOB0..EOB14 (0x00 = EOB)
        + [0xF0]                              # ZRL
        + [(r << 4) | s for r in range(16) for s in range(1, 15)]
    ),
)

# 8-point DCT-II basis matrix: _DCT[u, x] = c(u)/2 * cos((2x+1)u*pi/16)
_DCT = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _DCT[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _dct2(blocks: np.ndarray) -> np.ndarray:
    """Forward 2-D DCT over a stack of 8x8 blocks (n, 8, 8)."""
    return _DCT @ blocks @ _DCT.T


def _idct2(blocks: np.ndarray) -> np.ndarray:
    """Inverse 2-D DCT over a stack of 8x8 blocks (n, 8, 8)."""
    return _DCT.T @ blocks @ _DCT


# ---------------------------------------------------------------------------
# Huffman code construction (T.81 Annex C)


_CODES_CACHE: dict[bytes, dict[int, tuple[int, int]]] = {}


def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) for the canonical code defined by BITS.

    Cached by table content (same discipline as ``_build_lut``): every
    encode re-requests the five standard Annex-K tables, so the build
    is paid once per distinct table.  Callers only read the dict."""
    key = bytes(bits) + bytes(values)
    hit = _CODES_CACHE.get(key)
    if hit is not None:
        return hit
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    if len(_CODES_CACHE) < 64:
        _CODES_CACHE[key] = codes
    return codes


def _build_decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value lookup for sequential decoding."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


_LUT_CACHE: dict[bytes, tuple[list[int], list[int]]] = {}


def _build_lut(bits: list[int], values: list[int]) -> tuple[list[int], list[int]]:
    """Flat 16-bit-prefix lookup: (value[win16], length[win16]).

    Every canonical code of length L owns the 2^(16-L) windows whose
    first L bits equal the code, so one table index replaces the
    bit-serial walk of the code tree (length 0 = invalid prefix).
    Built with numpy slice fills, served as plain Python lists (scalar
    list indexing is ~3x faster than numpy scalar indexing, and the
    decode loop does one lookup per symbol).  Cached by table bytes —
    MJPEG frames and Annex-K encoders reuse identical tables, so the
    1 ms build is paid once per distinct table, not per image."""
    key = bytes(bits) + bytes(values)
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    if sum(bits) > len(values):
        raise ValueError("jpeg: DHT values shorter than BITS counts")
    lv = np.zeros(65536, dtype=np.int64)
    ll = np.zeros(65536, dtype=np.int64)
    code = 0
    k = 0
    for length in range(1, 17):
        span = 1 << (16 - length)
        if code + bits[length - 1] > (1 << length):
            raise ValueError("jpeg: DHT BITS exceed the code space")
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            lv[lo : lo + span] = values[k]
            ll[lo : lo + span] = length
            code += 1
            k += 1
        code <<= 1
    lut = (lv.tolist(), ll.tolist())
    if len(_LUT_CACHE) < 64:  # bound worst-case memory on adversarial streams
        _LUT_CACHE[key] = lut
    return lut


# ---------------------------------------------------------------------------
# bit IO


class _BitWriter:
    """MSB-first entropy writer with lazy byte emission: bits pool in
    one int accumulator and drain in whole-byte chunks, with 0xFF byte
    stuffing applied chunk-wise via ``bytes.replace`` (identical output
    to the per-byte loop: a 00 after every FF, in stream order).
    ``flush()`` fully drains, so callers may append marker bytes to
    ``out`` right after it (restart markers do)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def _drain(self) -> None:
        nb = self._nbits >> 3
        if not nb:
            return
        keep = self._nbits & 7
        chunk = (self._acc >> keep).to_bytes(nb, "big")
        self._acc &= (1 << keep) - 1
        self._nbits = keep
        if b"\xff" in chunk:
            chunk = chunk.replace(b"\xff", b"\xff\x00")
        self.out += chunk

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        if self._nbits >= 256:
            self._drain()

    def flush(self) -> None:
        pad = (-self._nbits) % 8
        if pad:
            self.write((1 << pad) - 1, pad)
        self._drain()


class _BitReader:
    """Bulk entropy reader: one pass unstuffs the whole scan (0xFF00 ->
    0xFF), records restart-marker byte boundaries, and stops at the
    first real marker; bits are then served from big-endian uint64
    words with O(1) 16-bit window peeks instead of per-bit calls (the
    bit-serial predecessor spent 97% of decode wall in read_bit — see
    BENCHNOTES).  Reads past the current restart segment's end yield
    zero bits, exactly like the old reader's zero-padding at a marker;
    ``restart()`` jumps to the next recorded boundary."""

    def __init__(self, data: bytes, pos: int) -> None:
        buf = bytearray()
        boundaries: list[int] = []  # bit offsets where post-RSTn segments start
        n = len(data)
        i = pos
        # bulk path: most scans have no 0xFF at all between markers
        while i < n:
            j = data.find(b"\xff", i)
            if j < 0:
                buf += data[i:]
                i = n
                break
            buf += data[i:j]
            # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
            # marker (e.g. FF FF D0) — skip them before classifying, as
            # the bit-serial reader's forward-scan resynchronization did.
            while j + 1 < n and data[j + 1] == 0xFF:
                j += 1
            nxt = data[j + 1] if j + 1 < n else 0xD9
            if nxt == 0x00:
                buf.append(0xFF)
                i = j + 2
            elif 0xD0 <= nxt <= 0xD7:
                boundaries.append(len(buf) * 8)
                i = j + 2
            else:
                i = j  # position of the terminating marker's first 0xFF
                break  # EOI or other marker: end of entropy data
        # byte offset of the marker that ended the scan (== len(data)
        # when the stream ran out) — progressive decoding resumes the
        # marker parse here for the next scan
        self.end_pos = i
        self._end_bits = len(buf) * 8
        pad = (-len(buf)) % 8 + 16  # two spare zero words for window reads
        self._w: list[int] = np.frombuffer(
            bytes(buf) + b"\x00" * pad, dtype=">u8"
        ).tolist()
        self._boundaries = boundaries
        self._bseg = 0  # index of the next unconsumed boundary
        self._seg_end = boundaries[0] if boundaries else self._end_bits
        self.bitpos = 0

    def _peek16(self) -> int:
        """Next 16 bits at ``bitpos``, zero-filled past the current
        segment end (matching the old reader's zero padding)."""
        p = self.bitpos
        end = self._seg_end
        if p + 16 <= end:
            i, off = divmod(p, 64)
            w = self._w
            x = (w[i] << off) & 0xFFFFFFFFFFFFFFFF
            if off:
                x |= w[i + 1] >> (64 - off)
            return x >> 48
        valid = end - p
        if valid <= 0:
            return 0
        i, off = divmod(p, 64)
        w = self._w
        x = (w[i] << off) & 0xFFFFFFFFFFFFFFFF
        if off:
            x |= w[i + 1] >> (64 - off)
        x >>= 48
        return x & ~((1 << (16 - valid)) - 1)

    def decode(self, lut: tuple[list[int], list[int]]) -> int:
        """Table-driven Huffman symbol decode: one window peek + one
        list index per symbol."""
        win = self._peek16()
        length = lut[1][win]
        if length == 0:
            raise ValueError("jpeg: invalid huffman code")
        self.bitpos += length
        return lut[0][win]

    def _peek32(self) -> int:
        """Next 32 bits at ``bitpos``, zero-filled past the segment end —
        wide enough for one Huffman code (<=16 bits) plus its magnitude
        bits (<=16), so a whole coefficient needs ONE peek."""
        p = self.bitpos
        valid = self._seg_end - p
        if valid <= 0:
            # overrun reads yield zero bits without touching the word
            # list (bitpos keeps advancing on corrupt streams, so the
            # bound check must precede any indexing)
            return 0
        i, off = divmod(p, 64)
        w = self._w
        x = (w[i] << off) & 0xFFFFFFFFFFFFFFFF
        if off:
            x |= w[i + 1] >> (64 - off)
        x >>= 32
        if valid >= 32:
            return x
        return x & ~((1 << (32 - valid)) - 1)

    def decode_coef(self, lut: tuple[list[int], list[int]], dc: bool) -> tuple[int, int]:
        """Decode one (run/size symbol, sign-extended coefficient) pair
        with a single 32-bit window: Huffman code, then the T.81 F.2.2.1
        magnitude bits, then EXTEND — all from the same peek.  For DC
        tables the symbol IS the size; for AC the low nibble is."""
        win = self._peek32()
        idx = win >> 16
        length = lut[1][idx]
        if length == 0:
            raise ValueError("jpeg: invalid huffman code")
        rs = lut[0][idx]
        size = rs if dc else rs & 0xF
        raw = (win >> (32 - length - size)) & ((1 << size) - 1)
        self.bitpos += length + size
        if size and raw < (1 << (size - 1)):
            raw -= (1 << size) - 1
        return rs, raw

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        v = self._peek16() >> (16 - n)
        self.bitpos += n
        return v

    def read_bit(self) -> int:
        return self.receive(1)

    def restart(self) -> None:
        """Jump to the next restart boundary (byte-aligned, RSTn consumed
        during the unstuffing pass).  Boundaries are consumed strictly in
        stream order — one per restart() call — which matches the old
        reader's forward marker scan on well-formed streams and stays
        correct even if a corrupt segment's decode overran into the
        zero-fill region."""
        if self._bseg < len(self._boundaries):
            self.bitpos = self._boundaries[self._bseg]
            self._bseg += 1
        else:
            self.bitpos = self._end_bits
        nxt = self._bseg
        self._seg_end = (
            self._boundaries[nxt] if nxt < len(self._boundaries) else self._end_bits
        )


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 sign extension of an n-bit magnitude."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """(category, raw bits) for encoding a signed coefficient."""
    n = int(v).bit_length() if v > 0 else int(-v).bit_length()
    if v < 0:
        v = v + (1 << n) - 1
    return n, v


# ---------------------------------------------------------------------------
# decoder


def _decode_huffman_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    """Bit-serial fallback decode (kept for the dict-table API; the hot
    path uses ``_BitReader.decode`` with a ``_build_lut`` table)."""
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("jpeg: invalid huffman code")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/1) or progressive (SOF2) JPEG to float32
    grayscale HxW in [0, 1].

    Color images are converted YCbCr -> luma (the multimodal feature
    path is grayscale); sampling factors 4:4:4 / 4:2:2 / 4:2:0 and
    restart intervals are honored.  Progressive streams decode all
    spectral-selection and successive-approximation scans (T.81 Annex
    G.1.2 — the reference itself ships no codecs; this extends our
    multimodal surface to the majority-progressive web-crawl corpus).
    Hierarchical (SOF3+) and arithmetic coding raise
    NotImplementedError.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a jpeg")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, tuple[list[int], list[int]]] = {}
    huff_ac: dict[int, tuple[list[int], list[int]]] = {}
    frame = None  # (h, w, components) where component = (cid, hs, vs, tq)
    restart_interval = 0
    progressive = False
    coef: list[np.ndarray] | None = None  # per-comp (BH, BW, 64) zigzag coefs
    scanned = False
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                if p + 17 > len(seg):
                    raise ValueError("jpeg: truncated DHT segment")
                tc_th = seg[p]
                bits = list(seg[p + 1 : p + 17])
                nvals = sum(bits)
                if p + 17 + nvals > len(seg):
                    raise ValueError("jpeg: truncated DHT segment")
                values = list(seg[p + 17 : p + 17 + nvals])
                table = _build_lut(bits, values)
                if tc_th >> 4 == 0:
                    huff_dc[tc_th & 0xF] = table
                else:
                    huff_ac[tc_th & 0xF] = table
                p += 17 + nvals
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                if p + 65 > len(seg):
                    raise ValueError("jpeg: truncated DQT segment")
                pq_tq = seg[p]
                if pq_tq >> 4 != 0:
                    raise NotImplementedError("jpeg: 16-bit quant tables")
                zz = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(np.int32)
                tab = np.zeros(64, dtype=np.int32)
                tab[_ZIGZAG] = zz
                qt[pq_tq & 0xF] = tab.reshape(8, 8)
                p += 65
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            if len(seg) < 6:
                raise ValueError("jpeg: truncated SOF segment")
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if h == 0 or w == 0 or nc == 0 or len(seg) < 6 + 3 * nc:
                raise ValueError("jpeg: malformed SOF segment")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                if hv >> 4 == 0 or hv & 0xF == 0:
                    raise ValueError("jpeg: zero sampling factor")
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "jpeg: only baseline (SOF0/1) and progressive (SOF2) supported"
            )
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("jpeg: truncated DRI segment")
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            if len(seg) < 1:
                raise ValueError("jpeg: truncated SOS segment")
            ns = seg[0]
            if len(seg) < 4 + 2 * ns:
                raise ValueError("jpeg: truncated SOS segment")
            scan_sel = {}
            scan_order = []
            for i in range(ns):
                cs, td_ta = seg[1 + 2 * i : 3 + 2 * i]
                scan_sel[cs] = (td_ta >> 4, td_ta & 0xF)
                scan_order.append(cs)
            if not progressive:
                return _decode_scan(
                    payload, pos + seglen, frame, scan_sel, qt, huff_dc, huff_ac, restart_interval
                )
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            if coef is None:
                coef = _alloc_progressive_coefs(frame)
            r = _BitReader(payload, pos + seglen)
            _decode_progressive_scan(
                r, frame, scan_order, scan_sel, ss, se, ahal >> 4, ahal & 0xF,
                huff_dc, huff_ac, restart_interval, coef,
            )
            scanned = True
            pos = r.end_pos
            continue
        pos += seglen
    if progressive and scanned:
        return _assemble_planes(frame, coef, qt)
    raise ValueError("jpeg: no scan found")


def _decode_scan(payload, pos, frame, scan_sel, qt, huff_dc, huff_ac, restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    r = _BitReader(payload, pos)
    # per-component zigzag-order coefficient blocks as plain Python
    # lists, appended in (my, mx, by, bx) order — per-coefficient numpy
    # scalar writes and per-block view creation were ~30% of scan wall;
    # the de-zigzag scatter and dequantize run vectorized once per plane
    blocks: list[list[list[int]]] = [[] for _ in comps]
    zero64 = [0] * 64
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.restart()
                pred = [0] * len(comps)
            for ci, (cid, hs, vs, _tq) in enumerate(comps):
                if cid not in scan_sel:
                    raise ValueError("jpeg: scan references unknown component")
                td, ta = scan_sel[cid]
                if td not in huff_dc or ta not in huff_ac:
                    raise ValueError("jpeg: scan references missing huffman table")
                dct = huff_dc[td]
                act = huff_ac[ta]
                app = blocks[ci].append
                p = pred[ci]
                for _ in range(vs * hs):
                    zz = zero64.copy()
                    _t, diff = r.decode_coef(dct, True)
                    p += diff
                    zz[0] = p
                    k = 1
                    while k < 64:
                        rs, coef = r.decode_coef(act, False)
                        if rs & 0xF == 0:
                            if rs >> 4 == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += rs >> 4
                        if k > 63:
                            raise ValueError("jpeg: AC index overflow")
                        zz[k] = coef
                        k += 1
                    app(zz)
                pred[ci] = p
            mcu_count += 1
    # de-zigzag + dequantize + IDCT + assemble the luma plane (the
    # multimodal feature path is grayscale — chroma blocks must be
    # entropy-decoded to keep the stream in sync, but their IDCT is
    # skipped); table presence is still validated for every component
    grids = []
    for ci, (_cid, hs, vs, tq) in enumerate(comps):
        arr = np.asarray(blocks[ci], dtype=np.int32)
        grids.append(
            arr.reshape(mcuy, mcux, vs, hs, 64)
            .transpose(0, 2, 1, 3, 4)
            .reshape(mcuy * vs, mcux * hs, 64)
        )
    return _assemble_planes(frame, grids, qt)


def _assemble_planes(frame, coef: list[np.ndarray], qt) -> np.ndarray:
    """Dequantize + IDCT the luma component from per-component
    (block_rows, block_cols, 64) zigzag-order coefficient grids; shared
    by the baseline and progressive decode paths."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    y = None
    for ci, (_cid, hs, vs, tq) in enumerate(comps):
        if tq not in qt:
            raise ValueError("jpeg: frame references missing quant table")
        if ci != 0:
            continue  # luma-only output; chroma needs no IDCT
        arr = coef[ci]
        bh, bw = arr.shape[:2]
        nat = np.zeros_like(arr)
        nat[:, :, _ZIGZAG] = arr  # one vectorized de-zigzag scatter
        coefs = nat.reshape(-1, 8, 8) * qt[tq][None, :, :]
        px = _idct2(coefs.astype(np.float64)) + 128.0
        plane = px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        y = plane[:h, :w]
    return np.clip(y, 0.0, 255.0).astype(np.float32) / 255.0


# ---------------------------------------------------------------------------
# progressive decoding (T.81 Annex G.1.2)


def _alloc_progressive_coefs(frame) -> list[np.ndarray]:
    """Per-component (block_rows, block_cols, 64) zigzag coefficient
    grids sized to the MCU-padded frame, accumulated across scans."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return [
        np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32)
        for (_cid, hs, vs, _tq) in comps
    ]


def _nonintl_block_dims(h: int, w: int, hs: int, vs: int, hmax: int, vmax: int):
    """True (non-MCU-padded) block grid of a component — the traversal
    of non-interleaved progressive scans (T.81 A.2.2)."""
    cw = (w * hs + hmax - 1) // hmax
    ch = (h * vs + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8


def _decode_progressive_scan(
    r: _BitReader,
    frame,
    scan_order,
    scan_sel,
    ss: int,
    se: int,
    ah: int,
    al: int,
    huff_dc,
    huff_ac,
    restart_interval: int,
    coef: list[np.ndarray],
) -> None:
    """Decode one progressive scan into the coefficient grids.

    Handles all four scan kinds: DC first (diff-coded, value << Al),
    DC refinement (one appended bit per block), AC first (spectral band
    with EOB runs), AC refinement (correction-bit algorithm of
    G.1.2.3, the libjpeg decode_mcu_AC_refine logic)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    cid_to_ci = {c[0]: i for i, c in enumerate(comps)}
    sel = []
    for cs in scan_order:
        if cs not in cid_to_ci:
            raise ValueError("jpeg: scan references unknown component")
        sel.append(cid_to_ci[cs])
    if ss > 63 or se > 63 or ss > se or al > 13 or ah > 13:
        raise ValueError("jpeg: bad progressive scan parameters")
    dc_scan = ss == 0
    if dc_scan and se != 0:
        raise ValueError("jpeg: DC scan with Se != 0")
    if not dc_scan and len(sel) != 1:
        raise ValueError("jpeg: AC scans must be non-interleaved")

    tabs = {}
    for ci in sel:
        td, ta = scan_sel[comps[ci][0]]
        if dc_scan and ah == 0:
            if td not in huff_dc:
                raise ValueError("jpeg: scan references missing huffman table")
            tabs[ci] = huff_dc[td]
        elif not dc_scan:
            if ta not in huff_ac:
                raise ValueError("jpeg: scan references missing huffman table")
            tabs[ci] = huff_ac[ta]

    pred = [0] * len(comps)
    state = {"eobrun": 0}

    def dc_first(ci: int, gy: int, gx: int) -> None:
        _t, diff = r.decode_coef(tabs[ci], True)
        pred[ci] += diff
        coef[ci][gy, gx, 0] = pred[ci] << al

    def dc_refine(ci: int, gy: int, gx: int) -> None:
        if r.read_bit():
            coef[ci][gy, gx, 0] = int(coef[ci][gy, gx, 0]) | (1 << al)

    def ac_first(ci: int, gy: int, gx: int) -> None:
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        zz = coef[ci][gy, gx]
        act = tabs[ci]
        k = ss
        while k <= se:
            rs, val = r.decode_coef(act, False)
            rr, s = rs >> 4, rs & 0xF
            if s == 0:
                if rr < 15:  # EOBn: run of (1<<rr)+ext end-of-band blocks
                    state["eobrun"] = (1 << rr) - 1 + r.receive(rr)
                    return
                k += 16  # ZRL
                continue
            k += rr
            if k > se:
                raise ValueError("jpeg: AC index overflow")
            zz[k] = val << al
            k += 1

    def ac_refine(ci: int, gy: int, gx: int) -> None:
        p1 = 1 << al
        m1 = -1 << al
        zz = coef[ci][gy, gx].tolist()
        act = tabs[ci]
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = r.decode(act)
                rr, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if rr < 15:
                        state["eobrun"] = (1 << rr) + r.receive(rr)
                        break
                    # rr == 15: skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("jpeg: bad refinement magnitude")
                    val = p1 if r.read_bit() else m1
                while k <= se:
                    c = zz[k]
                    if c != 0:
                        if r.read_bit() and (c & p1) == 0:
                            zz[k] = c + (p1 if c >= 0 else m1)
                    else:
                        if rr == 0:
                            break
                        rr -= 1
                    k += 1
                if val:
                    if k > se:
                        raise ValueError("jpeg: AC index overflow")
                    zz[k] = val
                k += 1
        if state["eobrun"] > 0:
            # inside an end-of-band run: corrections only
            while k <= se:
                c = zz[k]
                if c != 0 and r.read_bit() and (c & p1) == 0:
                    zz[k] = c + (p1 if c >= 0 else m1)
                k += 1
            state["eobrun"] -= 1
        coef[ci][gy, gx] = zz

    if dc_scan:
        op = dc_first if ah == 0 else dc_refine
    else:
        op = ac_first if ah == 0 else ac_refine

    count = 0
    if len(sel) > 1:  # interleaved (DC scans only)
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and count and count % restart_interval == 0:
                    r.restart()
                    pred[:] = [0] * len(comps)
                    state["eobrun"] = 0
                for ci in sel:
                    _cid, hs, vs, _tq = comps[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            op(ci, my * vs + by, mx * hs + bx)
                count += 1
    else:
        ci = sel[0]
        _cid, hs, vs, _tq = comps[ci]
        bh_i, bw_i = _nonintl_block_dims(h, w, hs, vs, hmax, vmax)
        for gy in range(bh_i):
            for gx in range(bw_i):
                if restart_interval and count and count % restart_interval == 0:
                    r.restart()
                    pred[:] = [0] * len(comps)
                    state["eobrun"] = 0
                op(ci, gy, gx)
                count += 1


# ---------------------------------------------------------------------------
# encoder


def _encode_block(
    w: _BitWriter,
    blk: np.ndarray,
    quant: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    coefs = np.round(_dct2(blk[None, :, :].astype(np.float64) - 128.0)[0] / quant).astype(np.int64)
    zz = coefs.flat[_ZIGZAG].tolist()
    dc = zz[0]
    diff = dc - pred
    n, bitsv = _magnitude(diff) if diff else (0, 0)
    code, length = dc_codes[n]
    w.write(code, length)
    if n:
        w.write(bitsv, n)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            w.write(code, length)
            run -= 16
        n, bitsv = _magnitude(v)
        code, length = ac_codes[(run << 4) | n]
        w.write(code, length)
        w.write(bitsv, n)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _dht_body(tc: int, th: int, table: tuple[list[int], list[int]]) -> bytes:
    bits, values = table
    return bytes([tc << 4 | th]) + bytes(bits) + bytes(values)


def _pad_edge(p: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Bottom/right edge-replication pad to (th, tw) — np.pad(...,
    mode='edge') without its ~60 us of argument plumbing (bottom rows
    copy the already-right-padded last row, so the corner matches)."""
    h, w = p.shape
    if th == h and tw == w:
        return p
    out = np.empty((th, tw), dtype=p.dtype)
    out[:h, :w] = p
    if tw > w:
        out[:h, w:] = p[:, w - 1 : w]
    if th > h:
        out[h:, :] = out[h - 1 : h, :]
    return out


def _block_mean_downsample(p: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Downsample a plane by integer factors with block averaging."""
    if fy == 1 and fx == 1:
        return p
    h, w = p.shape
    p = _pad_edge(p, h + (fy - h % fy) % fy, w + (fx - w % fx) % fx)
    return p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx).mean(axis=(1, 3))


def encode_jpeg(
    img: np.ndarray,
    subsample: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode to baseline (SOF0) or progressive (SOF2) JPEG.  ``img``
    is uint8 HxW (grayscale) or HxWx3 (RGB, converted to YCbCr).
    Annex-K tables (quality ~50).

    ``subsample``: "444", "422", or "420" chroma sampling (color only).
    ``restart_interval``: emit DRI + RSTn markers every N units (0 = off).
    ``progressive``: emit a 4-stage scan script — DC first (Al=1), one
    AC spectral scan per component (Ss=1..63, Al=1), DC refinement,
    one AC refinement scan per component — exercising spectral
    selection, successive approximation, EOB runs and correction bits
    (T.81 Annex G.1.2).  The quantized coefficients are identical to
    the baseline encoding, so both decode to identical pixels.
    """
    img = np.asarray(img)
    gray = img.ndim == 2
    h, wd = img.shape[:2]
    factors = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}
    if subsample not in factors:
        raise ValueError(f"unsupported subsample {subsample!r}")
    lh, lv = (1, 1) if gray else factors[subsample]
    if gray:
        planes = [img.astype(np.float64)]
        quants = [_QUANT_LUMA]
        samps = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        rr, gg, bb = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * rr + 0.587 * gg + 0.114 * bb
        cb = -0.168736 * rr - 0.331264 * gg + 0.5 * bb + 128.0
        cr = 0.5 * rr - 0.418688 * gg - 0.081312 * bb + 128.0
        planes = [y, _block_mean_downsample(cb, lv, lh), _block_mean_downsample(cr, lv, lh)]
        quants = [_QUANT_LUMA, _QUANT_CHROMA, _QUANT_CHROMA]
        samps = [(lh, lv), (1, 1), (1, 1)]

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_l = _QUANT_LUMA.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes()
    out += _seg(0xDB, b"\x00" + zz_l)
    if not gray:
        zz_c = _QUANT_CHROMA.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes()
        out += _seg(0xDB, b"\x01" + zz_c)
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, wd, nc)
    for i in range(nc):
        hs, vs = samps[i]
        sof += bytes([i + 1, (hs << 4) | vs, 0 if i == 0 else 1])
    out += _seg(0xC2 if progressive else 0xC0, sof)
    out += _seg(0xC4, _dht_body(0, 0, _HUFF_DC_LUMA))
    out += _seg(0xC4, _dht_body(1, 0, _HUFF_AC_LUMA))
    if not gray:
        out += _seg(0xC4, _dht_body(0, 1, _HUFF_DC_CHROMA))
        out += _seg(0xC4, _dht_body(1, 1, _HUFF_AC_CHROMA))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    dc_luma = _build_codes(*_HUFF_DC_LUMA)
    ac_luma = _build_codes(*_HUFF_AC_LUMA)
    dc_chroma = _build_codes(*_HUFF_DC_CHROMA)
    ac_chroma = _build_codes(*_HUFF_AC_CHROMA)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (wd + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # pad each component plane to its MCU-grid size with edge replication
    padded = []
    for p, (hs, vs) in zip(planes, samps):
        padded.append(_pad_edge(p, mcuy * vs * 8, mcux * hs * 8))

    if progressive:
        _emit_progressive_scans(
            out, padded, quants, samps, h, wd, restart_interval,
            [dc_luma, dc_chroma, dc_chroma][:nc],
            [ac_luma, ac_chroma, ac_chroma][:nc],
        )
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)
    bw = _BitWriter()
    preds = [0] * nc
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (mcu_count // restart_interval - 1) % 8])
                preds = [0] * nc
            for ci in range(nc):
                hs, vs = samps[ci]
                dc_c = dc_luma if ci == 0 else dc_chroma
                ac_c = ac_luma if ci == 0 else ac_chroma
                for by in range(vs):
                    for bx in range(hs):
                        r0 = (my * vs + by) * 8
                        c0 = (mx * hs + bx) * 8
                        blk = padded[ci][r0 : r0 + 8, c0 : c0 + 8]
                        preds[ci] = _encode_block(bw, blk, quants[ci], preds[ci], dc_c, ac_c)
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoding (T.81 Annex G.1.2) — the scan script and the
# EOB-run / correction-bit emitters (libjpeg encode_mcu_AC_first /
# encode_mcu_AC_refine logic)


def _quantized_coef_grids(padded, quants, samps, mcux, mcuy):
    """Per-component (block_rows, block_cols, 64) zigzag quantized
    coefficients — identical values to the baseline _encode_block path
    (same DCT, same np.round), computed vectorized."""
    grids = []
    for p, q, (hs, vs) in zip(padded, quants, samps):
        bh, bw = mcuy * vs, mcux * hs
        blocks = (
            p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        coefs = np.round(_dct2(blocks - 128.0) / q).astype(np.int64)
        grids.append(coefs.reshape(-1, 64)[:, _ZIGZAG].reshape(bh, bw, 64))
    return grids


def _sos_header(comp_specs, ss, se, ah, al):
    body = bytes([len(comp_specs)])
    for cid, td, ta in comp_specs:
        body += bytes([cid, (td << 4) | ta])
    body += bytes([ss, se, (ah << 4) | al])
    return _seg(0xDA, body)


def _ac_pt(v: int, al: int) -> int:
    """AC successive-approximation point transform: magnitude shift
    toward zero (G.1.2.2) — NOT an arithmetic shift."""
    return v >> al if v >= 0 else -((-v) >> al)


class _EobRun:
    """End-of-band run accumulator shared by the AC scan emitters; for
    refinement scans it also buffers the runs' correction bits, emitted
    right after the EOBn symbol (libjpeg's BE buffer)."""

    def __init__(self, w: _BitWriter, ac_codes) -> None:
        self.w = w
        self.ac = ac_codes
        self.run = 0
        self.bits: list[int] = []

    def add(self, correction_bits=()) -> None:
        self.run += 1
        self.bits.extend(correction_bits)
        if self.run == 32767:  # EOBn maximum (t <= 14)
            self.flush()

    def flush(self) -> None:
        if self.run > 0:
            t = self.run.bit_length() - 1
            code, length = self.ac[t << 4]
            self.w.write(code, length)
            if t:
                self.w.write(self.run - (1 << t), t)
            self.run = 0
        for b in self.bits:
            self.w.write(b, 1)
        self.bits.clear()


def _emit_dc_scan(out, grids, samps, dc_codes, al, ah, ri, mcux, mcuy, cids):
    """Interleaved DC scan: first pass (diff-coded arithmetic-shifted
    values) when ah == 0, else one appended bit per block."""
    nc = len(grids)
    out.extend(_sos_header([(cids[i], i and 1, 0) for i in range(nc)], 0, 0, ah, al))
    w = _BitWriter()
    preds = [0] * nc
    count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and count and count % ri == 0:
                w.flush()
                w.out += bytes([0xFF, 0xD0 + (count // ri - 1) % 8])
                preds = [0] * nc
            for ci in range(nc):
                hs, vs = samps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        v = int(grids[ci][my * vs + by, mx * hs + bx, 0])
                        if ah == 0:
                            pt = v >> al  # arithmetic shift (G.1.2.1)
                            diff = pt - preds[ci]
                            preds[ci] = pt
                            n, bitsv = _magnitude(diff) if diff else (0, 0)
                            code, length = dc_codes[ci][n]
                            w.write(code, length)
                            if n:
                                w.write(bitsv, n)
                        else:
                            w.write((v >> al) & 1, 1)
            count += 1
    w.flush()
    out.extend(w.out)


def _emit_ac_first_scan(out, zz, ac_codes, cid, td_ta, ss, se, al, ri, bh_i, bw_i):
    """Non-interleaved AC spectral scan, first pass (ah == 0)."""
    out.extend(_sos_header([(cid, td_ta[0], td_ta[1])], ss, se, 0, al))
    w = _BitWriter()
    eob = _EobRun(w, ac_codes)
    count = 0
    for gy in range(bh_i):
        for gx in range(bw_i):
            if ri and count and count % ri == 0:
                eob.flush()
                w.flush()
                w.out += bytes([0xFF, 0xD0 + (count // ri - 1) % 8])
            band = [_ac_pt(int(v), al) for v in zz[gy, gx, ss : se + 1]]
            if not any(band):
                eob.add()
            else:
                eob.flush()
                run = 0
                last_nz = max(i for i, v in enumerate(band) if v)
                for i in range(last_nz + 1):
                    v = band[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_codes[0xF0]
                        w.write(code, length)
                        run -= 16
                    n, bitsv = _magnitude(v)
                    code, length = ac_codes[(run << 4) | n]
                    w.write(code, length)
                    w.write(bitsv, n)
                    run = 0
                if last_nz < se - ss:
                    eob.add()  # trailing zeros: this block joins an EOB run
            count += 1
    eob.flush()
    w.flush()
    out.extend(w.out)


def _emit_ac_refine_scan(out, zz, ac_codes, cid, td_ta, ss, se, ah, al, ri, bh_i, bw_i):
    """Non-interleaved AC refinement scan (libjpeg encode_mcu_AC_refine):
    newly-nonzero coefficients emit (run<<4)|1 + a sign bit; coefficients
    already nonzero at the previous precision contribute one buffered
    correction bit each, emitted after the symbol (or after the EOBn
    covering their block)."""
    out.extend(_sos_header([(cid, td_ta[0], td_ta[1])], ss, se, ah, al))
    w = _BitWriter()
    eob = _EobRun(w, ac_codes)
    count = 0
    for gy in range(bh_i):
        for gx in range(bw_i):
            if ri and count and count % ri == 0:
                eob.flush()
                w.flush()
                w.out += bytes([0xFF, 0xD0 + (count // ri - 1) % 8])
            vals = [int(v) for v in zz[gy, gx, ss : se + 1]]
            mags = [_ac_pt(abs(v), al) for v in vals]  # |v| >> al
            eobpos = -1  # last newly-nonzero coefficient
            for i, m in enumerate(mags):
                if m == 1:
                    eobpos = i
            run = 0
            br: list[int] = []
            for i, m in enumerate(mags):
                if m == 0:
                    run += 1
                    continue
                while run > 15 and i <= eobpos:
                    eob.flush()
                    code, length = ac_codes[0xF0]
                    w.write(code, length)
                    run -= 16
                    for b in br:
                        w.write(b, 1)
                    br = []
                if m > 1:  # already nonzero: one correction bit
                    br.append(m & 1)
                    continue
                eob.flush()
                code, length = ac_codes[(run << 4) | 1]
                w.write(code, length)
                w.write(1 if vals[i] > 0 else 0, 1)
                for b in br:
                    w.write(b, 1)
                br = []
                run = 0
            if run > 0 or br:
                eob.add(br)
            count += 1
    eob.flush()
    w.flush()
    out.extend(w.out)


def _emit_progressive_scans(out, padded, quants, samps, h, wd, ri, dc_codes, ac_codes):
    """The 4-stage scan script: DC(Al=1) -> per-component AC(Al=1) ->
    DC refine -> per-component AC refine.  AC scans use the shared
    progressive AC table (id 2) — the baseline tables lack the EOBn
    symbols end-of-band runs need."""
    nc = len(padded)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (wd + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    grids = _quantized_coef_grids(padded, quants, samps, mcux, mcuy)
    cids = [i + 1 for i in range(nc)]
    dims = [
        _nonintl_block_dims(h, wd, hs, vs, hmax, vmax) for hs, vs in samps
    ]
    out.extend(_seg(0xC4, _dht_body(1, 2, _HUFF_AC_PROGRESSIVE)))
    ac_prog = _build_codes(*_HUFF_AC_PROGRESSIVE)
    _emit_dc_scan(out, grids, samps, dc_codes, 1, 0, ri, mcux, mcuy, cids)
    for ci in range(nc):
        bh_i, bw_i = dims[ci]
        _emit_ac_first_scan(
            out, grids[ci], ac_prog, cids[ci], (0, 2),
            1, 63, 1, ri, bh_i, bw_i,
        )
    _emit_dc_scan(out, grids, samps, dc_codes, 0, 1, ri, mcux, mcuy, cids)
    for ci in range(nc):
        bh_i, bw_i = dims[ci]
        _emit_ac_refine_scan(
            out, grids[ci], ac_prog, cids[ci], (0, 2),
            1, 63, 1, 0, ri, bh_i, bw_i,
        )
