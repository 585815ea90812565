"""FLAC (Free Lossless Audio Codec) decode in pure stdlib + numpy.

Closes the real-web-audio gap the WAV container zoo leaves: FLAC is
the dominant lossless distribution format, and because it is LOSSLESS
the decoded PCM is bit-exact — so, like GIF/PNG/BMP on the image side,
every driver oracle over it can be value-exact, not structural.

Implemented (the complete STREAM decode path of the format spec):

- fLaC magic + metadata blocks (STREAMINFO parsed, others skipped),
- frame headers: sync, blocking strategy, all block-size / sample-rate
  / sample-size codes (incl. end-of-header 8/16-bit sizes), UTF-8
  coded frame/sample numbers, CRC-8 verification,
- channel assignments: independent, left/side, right/side, mid/side,
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, and LPC orders
  1-32 (quantized-coefficient linear prediction), wasted bits,
- residuals: Rice partitions, both coding methods (4- and 5-bit
  parameters), escape code (unencoded binary residuals),
- frame CRC-16 verification.

Everything is integer arithmetic — deterministic and engine-exact.
The encoder twin (``encode_flac``) writes CONSTANT / VERBATIM / FIXED
frames with real Rice coding so fixtures are spec-valid files the
decoder round-trips bit-for-bit (and any external FLAC decoder would
too).

Exception contract: malformed input raises ``ValueError`` (or
``NotImplementedError`` for declared-but-unsupported shapes), never a
stdlib internal — the same fuzz-pinned policy as every codec in
``operators.multimodal``.

Reference parity: N/A — /root/reference (pgvecto.rs) has no media
surface; this extends the engine for LLM-training-data work.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_flac", "encode_flac", "is_flac"]


def is_flac(payload: bytes) -> bool:
    return payload[:4] == b"fLaC"


# ---------------------------------------------------------------------------
# bit reader
# ---------------------------------------------------------------------------


class _Bits:
    """Bit reader over a cached integer window.

    ``acc`` holds the next ``nacc`` unread bits (top-aligned at
    ``acc >> (nacc - k)``); ``pos + nacc`` is always byte-aligned, so
    refills grab whole bytes in 8-byte gulps.  ``unary`` is O(1) via
    ``int.bit_length`` instead of one ``read(1)`` per zero bit — the
    dominant cost of Rice decode in the r13 profile.
    """

    __slots__ = ("data", "pos", "n", "acc", "nacc")

    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.data = data
        self.pos = pos_bytes * 8
        self.n = len(data) * 8
        self.acc = 0
        self.nacc = 0

    def _fill(self, need: int) -> None:
        a, na = self.acc, self.nacc
        byte = (self.pos + na) >> 3
        data = self.data
        while na < need:
            chunk = data[byte : byte + 8]
            if not chunk:
                raise ValueError("flac: bitstream truncated")
            a = (a << (len(chunk) * 8)) | int.from_bytes(chunk, "big")
            na += len(chunk) * 8
            byte += len(chunk)
        self.acc, self.nacc = a, na

    def read(self, nbits: int) -> int:
        if self.nacc < nbits:
            if self.pos + nbits > self.n:
                raise ValueError("flac: bitstream truncated")
            self._fill(nbits)
        na = self.nacc - nbits
        v = self.acc >> na
        self.acc &= (1 << na) - 1
        self.nacc = na
        self.pos += nbits
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >> (nbits - 1) else v

    def unary(self) -> int:
        # count zero bits up to the first 1
        q = 0
        while True:
            if self.nacc == 0:
                if self.pos >= self.n:
                    raise ValueError("flac: bitstream truncated in unary code")
                self._fill(1)
            if self.acc:
                lead = self.nacc - self.acc.bit_length()
                q += lead
                if q > 1 << 20:
                    raise ValueError("flac: unary run too long")
                na = self.nacc - lead - 1
                self.acc &= (1 << na) - 1
                self.nacc = na
                self.pos += lead + 1
                return q
            # window is all zero bits: consume it whole
            q += self.nacc
            self.pos += self.nacc
            self.nacc = 0
            if q > 1 << 20:
                raise ValueError("flac: unary run too long")

    def align(self) -> None:
        rem = self.pos & 7
        if rem:
            # pos + nacc is byte-aligned, so nacc >= 8 - rem here
            drop = 8 - rem
            self.nacc -= drop
            self.acc &= (1 << self.nacc) - 1
            self.pos += drop

    def byte_pos(self) -> int:
        return self.pos // 8


_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}

# Decoded-sample magnitude bound: valid FLAC samples fit 32 signed bits
# (before wasted-bit restoration), so anything past 2^35 is a corrupt
# stream's divergent predictor.  Rejecting at 2^35 also guarantees the
# NEXT prediction (<= 32 coefs x 2^14 x 2^35 = 2^54) stays far inside
# int64, so the exact-int accumulator can never overflow the output
# array assignment.
_SAMPLE_BOUND = 1 << 35

_CRC8_TABLE = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TABLE.append(_c)

_CRC16_TABLE = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _CRC16_TABLE.append(_c)


def _crc8(data: bytes) -> int:
    c = 0
    for byte in data:
        c = _CRC8_TABLE[c ^ byte]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for byte in data:
        c = _CRC16_TABLE[(c >> 8) ^ byte] ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode_flac(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a FLAC stream to (samples int32 [n, channels], rate, bps)."""
    if not is_flac(payload):
        raise ValueError("flac: missing fLaC magic")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("flac: truncated metadata block header")
        head = payload[pos]
        last, btype = head >> 7, head & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + blen]
        if len(body) < blen:
            raise ValueError("flac: truncated metadata block")
        if btype == 0:
            if blen < 34:
                raise ValueError("flac: short STREAMINFO")
            bits = _Bits(body)
            bits.read(16)  # min blocksize
            bits.read(16)  # max blocksize
            bits.read(24)
            bits.read(24)
            rate = bits.read(20)
            nch = bits.read(3) + 1
            bps = bits.read(5) + 1
            total = bits.read(36)
            info = (rate, nch, bps, total)
        elif btype == 127:
            raise ValueError("flac: invalid metadata block type 127")
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("flac: no STREAMINFO")
    rate, nch, bps, total = info
    if rate == 0 or nch < 1:
        raise ValueError("flac: bad STREAMINFO")

    out: list[np.ndarray] = []
    got = 0
    while pos < len(payload) and (total == 0 or got < total):
        block, pos = _decode_frame(payload, pos, nch, bps, rate)
        out.append(block)
        got += len(block)
    if total and got < total:
        raise ValueError("flac: stream ends before total_samples")
    samples = (
        np.concatenate(out, axis=0) if out else np.zeros((0, nch), np.int32)
    )
    if total:
        samples = samples[: int(total)]
    return samples, rate, bps


def _decode_frame(
    data: bytes, start: int, nch: int, bps: int, rate: int
) -> tuple[np.ndarray, int]:
    bits = _Bits(data, start)
    sync = bits.read(14)
    if sync != 0b11111111111110:
        raise ValueError("flac: bad frame sync")
    bits.read(1)  # reserved
    bits.read(1)  # blocking strategy
    bs_code = bits.read(4)
    sr_code = bits.read(4)
    ch_code = bits.read(4)
    ss_code = bits.read(3)
    bits.read(1)  # reserved

    # UTF-8 coded frame/sample number
    lead = bits.read(8)
    if lead < 0x80:
        extra = 0
    elif lead >> 5 == 0b110:
        extra = 1
    elif lead >> 4 == 0b1110:
        extra = 2
    elif lead >> 3 == 0b11110:
        extra = 3
    elif lead >> 2 == 0b111110:
        extra = 4
    elif lead >> 1 == 0b1111110:
        extra = 5
    elif lead == 0xFE:
        extra = 6
    else:
        raise ValueError("flac: bad UTF-8 frame number")
    for _ in range(extra):
        if bits.read(8) >> 6 != 0b10:
            raise ValueError("flac: bad UTF-8 continuation")

    if bs_code == 0:
        raise ValueError("flac: reserved block size code")
    elif bs_code == 1:
        blocksize = 192
    elif bs_code <= 5:
        blocksize = 576 << (bs_code - 2)
    elif bs_code == 6:
        blocksize = bits.read(8) + 1
    elif bs_code == 7:
        blocksize = bits.read(16) + 1
    else:
        blocksize = 256 << (bs_code - 8)

    if sr_code == 12:
        bits.read(8)
    elif sr_code in (13, 14):
        bits.read(16)
    elif sr_code == 15:
        raise ValueError("flac: invalid sample rate code")

    _SS = {0: bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
    if ss_code == 3:
        raise ValueError("flac: reserved sample size code")
    fbps = _SS[ss_code]

    # CRC-8 covers the header bytes up to (not incl.) the CRC byte
    hdr_end = bits.byte_pos()
    if _crc8(data[start:hdr_end]) != bits.read(8):
        raise ValueError("flac: frame header CRC mismatch")

    if ch_code <= 7:
        if ch_code + 1 != nch:
            raise ValueError("flac: frame channel count != STREAMINFO")
        chans = [
            _decode_subframe(bits, blocksize, fbps) for _ in range(nch)
        ]
        stacked = np.stack(chans, axis=1)
    elif ch_code in (8, 9, 10):
        if nch != 2:
            raise ValueError("flac: stereo decorrelation needs 2 channels")
        if ch_code == 8:  # left/side
            left = _decode_subframe(bits, blocksize, fbps)
            side = _decode_subframe(bits, blocksize, fbps + 1)
            right = left - side
            stacked = np.stack([left, right], axis=1)
        elif ch_code == 9:  # right/side
            side = _decode_subframe(bits, blocksize, fbps + 1)
            right = _decode_subframe(bits, blocksize, fbps)
            stacked = np.stack([right + side, right], axis=1)
        else:  # mid/side
            mid = _decode_subframe(bits, blocksize, fbps)
            side = _decode_subframe(bits, blocksize, fbps + 1)
            m2 = (mid.astype(np.int64) << 1) | (side & 1)
            left = (m2 + side) >> 1
            right = (m2 - side) >> 1
            stacked = np.stack([left, right], axis=1)
    else:
        raise ValueError("flac: reserved channel assignment")

    bits.align()
    crc_end = bits.byte_pos()
    if crc_end + 2 > len(data):
        raise ValueError("flac: truncated frame CRC")
    (want,) = struct.unpack(">H", data[crc_end : crc_end + 2])
    if _crc16(data[start:crc_end]) != want:
        raise ValueError("flac: frame CRC-16 mismatch")
    return stacked.astype(np.int32), crc_end + 2


def _decode_subframe(bits: _Bits, n: int, fbps: int) -> np.ndarray:
    if bits.read(1):
        raise ValueError("flac: subframe padding bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
    eff = fbps - wasted
    if eff <= 0:
        raise ValueError("flac: wasted bits exhaust sample size")

    if stype == 0:  # CONSTANT
        v = bits.read_signed(eff)
        out = np.full(n, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([bits.read_signed(eff) for _ in range(n)], dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        out = _predict(bits, n, eff, order, _FIXED_COEF[order], 0)
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        warm = [bits.read_signed(eff) for _ in range(order)]
        prec = bits.read(4)
        if prec == 15:
            raise ValueError("flac: invalid LPC precision code")
        prec += 1
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        resid = _residuals(bits, n, order)
        # exact Python-int accumulator over a plain list: numpy int64
        # scalars wrap silently on overflow, and 32-bit samples x
        # order-32 coefs leave only ~11 bits of int64 headroom; a
        # divergent filter from a corrupt-but-CRC-colliding frame must
        # error, not wrap (valid samples fit eff<=32 bits)
        hist = list(warm)
        push = hist.append
        bound = _SAMPLE_BOUND
        if order == 2:
            c0, c1 = coefs
            p2, p1 = hist[-2], hist[-1]
            for r in resid.tolist():
                v = r + ((c0 * p1 + c1 * p2) >> shift)
                if not -bound <= v <= bound:
                    raise ValueError(
                        "flac: LPC sample overflow (corrupt stream)"
                    )
                p2 = p1
                p1 = v
                push(v)
        else:
            for r in resid.tolist():
                acc = 0
                for j in range(order):
                    acc += coefs[j] * hist[-1 - j]
                v = r + (acc >> shift)
                if not -bound <= v <= bound:
                    raise ValueError(
                        "flac: LPC sample overflow (corrupt stream)"
                    )
                push(v)
        out = np.array(hist, dtype=np.int64)
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")

    if wasted:
        out = out << wasted
    return out


def _predict(
    bits: _Bits, n: int, eff: int, order: int, coefs: list[int], shift: int
) -> np.ndarray:
    warm = [bits.read_signed(eff) for _ in range(order)]
    resid = _residuals(bits, n, order)
    if order == 0:
        return resid
    # The FIXED order-o residual IS the o-th finite difference of the
    # samples (shift is always 0), so reconstruction is o staged exact
    # cumsums seeded from the warm-up samples' difference pyramid.
    # Guards: (a) before each cumsum, every value must fit 2^62/n so
    # the int64 running sum cannot wrap (streams the serial decoder
    # accepted keep stage values under 2^(36+order) — far below); (b)
    # the final samples must stay inside the +-2^35 envelope, matching
    # the serial per-sample check.  Either violation is a corrupt
    # stream and raises the same error the serial loop raised.
    warm_arr = np.array(warm, dtype=np.int64)
    stages = [warm_arr]
    for _ in range(order - 1):
        stages.append(np.diff(stages[-1]))
    cur = resid
    lim = (1 << 62) // n
    for s in range(order - 1, -1, -1):
        if len(cur) and (int(cur.max()) > lim or int(cur.min()) < -lim):
            raise ValueError(
                "flac: predictor sample overflow (corrupt stream)"
            )
        cur = np.cumsum(cur) + int(stages[s][-1])
    if len(cur) and (
        int(cur.max()) > _SAMPLE_BOUND or int(cur.min()) < -_SAMPLE_BOUND
    ):
        raise ValueError("flac: predictor sample overflow (corrupt stream)")
    out = np.empty(n, dtype=np.int64)
    out[:order] = warm_arr
    out[order:] = cur
    return out


def _residuals(bits: _Bits, blocksize: int, order: int) -> np.ndarray:
    method = bits.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("flac: partition order does not divide blocksize")
    vals: list[int] = []
    push = vals.append
    unary = bits.unary
    read = bits.read
    read_signed = bits.read_signed
    for p in range(nparts):
        cnt = (blocksize >> porder) - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("flac: partition smaller than predictor order")
        k = read(pbits)
        if k == escape:
            raw = read(5)
            if raw:
                for _ in range(cnt):
                    push(read_signed(raw))
            else:
                vals.extend([0] * cnt)
        else:
            for _ in range(cnt):
                u = (unary() << k) | read(k)
                push((u >> 1) ^ -(u & 1))  # unzigzag
    return np.array(vals, dtype=np.int64)


# ---------------------------------------------------------------------------
# encoder twin
# ---------------------------------------------------------------------------


class _BitW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, v: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (v & ((1 << nbits) - 1))
        self.nacc += nbits
        if self.nacc >= 8:
            nb = self.nacc >> 3
            self.nacc &= 7
            self.buf += (self.acc >> self.nacc).to_bytes(nb, "big")
            self.acc &= (1 << self.nacc) - 1

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def write_bytes(self, b: bytes) -> None:
        """Append whole bytes to an ALIGNED writer (skips the per-byte
        bit accounting — byte-identical to 8-bit write() calls)."""
        assert self.nacc == 0
        self.buf += b

    def bytes(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.buf)


def _utf8_num(n: int) -> bytes:
    """FLAC's UTF-8-style number coding (up to 36 bits / 7 bytes)."""
    if n < 0x80:
        return bytes([n])
    caps = {2: 11, 3: 16, 4: 21, 5: 26, 6: 31, 7: 36}
    nbytes = next(b for b, c in caps.items() if n.bit_length() <= c)
    payload = n
    tail = []
    for _ in range(nbytes - 1):
        tail.append(0x80 | (payload & 0x3F))
        payload >>= 6
    lead = ((0xFF << (8 - nbytes)) & 0xFF) | payload
    return bytes([lead] + tail[::-1])


def _rice_write(w: _BitW, vals: np.ndarray, k: int) -> None:
    stop = 1 << k
    kmask = stop - 1
    for v in np.asarray(vals).tolist():
        u = -2 * v - 1 if v < 0 else 2 * v  # zigzag
        q = u >> k
        if q > 1 << 16:
            raise ValueError("encode_flac: residual too large for rice k")
        # q zero bits, the stop bit, then the k low bits — one write
        w.write(stop | (u & kmask), q + 1 + k)


def _best_k(vals: np.ndarray) -> int:
    u = np.abs(vals.astype(np.int64)) * 2
    ks = np.arange(15, dtype=np.int64)
    costs = (u[:, None] >> ks).sum(axis=0) + len(vals) * (1 + ks)
    return int(costs.argmin())  # argmin keeps the lowest-k tie-break


def encode_flac(
    samples: np.ndarray,
    rate: int = 8000,
    bps: int = 16,
    blocksize: int = 4096,
    mode: str = "fixed",
    stereo_mode: str = "independent",
) -> bytes:
    """Spec-valid FLAC stream from int samples [n] or [n, channels].

    ``mode``: "fixed" picks the best FIXED predictor order (0-4) per
    subframe with Rice-coded residuals (real compression); "verbatim"
    stores raw samples; "lpc" codes order-2 LPC subframes (real
    quantized-coefficient prediction — lossless since the residual is
    exact); "constant" is chosen automatically whenever a block's
    channel is flat.

    ``stereo_mode`` (2-channel input only): "independent" codes L and R
    separately; "decorr" cycles the frame channel assignment through
    left/side → right/side → mid/side → independent so every stereo
    decorrelation decode path is exercised by one stream (side channels
    carry bps+1 as the spec requires)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, nch = s.shape
    if not 1 <= nch <= 8:
        raise ValueError("encode_flac: 1-8 channels")
    if stereo_mode not in ("independent", "decorr"):
        raise ValueError("encode_flac: unknown stereo_mode")
    if stereo_mode == "decorr" and nch != 2:
        raise ValueError("encode_flac: stereo_mode='decorr' needs 2 channels")
    lim = 1 << (bps - 1)
    if s.min(initial=0) < -lim or s.max(initial=0) >= lim:
        raise ValueError("encode_flac: samples exceed bps range")

    head = bytearray(b"fLaC")
    si = _BitW()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.bytes() + bytes(16)  # zero MD5 (unverified by spec readers)
    head += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    out = bytearray(head)
    frame_no = 0
    for off in range(0, max(n, 1), blocksize):
        blk = s[off : off + blocksize]
        if len(blk) == 0:
            break
        out += _encode_frame(blk, frame_no, rate, bps, mode, stereo_mode)
        frame_no += 1
    return bytes(out)


# order-2 LPC used by mode="lpc": ~1.6/-0.8 at shift 10, 12-bit
# quantized coefficients.  Any coefficients are lossless (the residual
# is exact); these keep residuals small on smooth signals.
_LPC2_COEFS = [1638, -819]
_LPC2_SHIFT = 10
_LPC2_PREC = 12


def _encode_subframe(
    w: _BitW, chan: np.ndarray, sbps: int, mode: str, nb: int
) -> None:
    """One subframe at ``sbps`` bits (side channels carry bps+1)."""
    w.write(0, 1)  # padding
    if np.all(chan == chan[0]):
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)  # no wasted bits
        w.write(int(chan[0]) & ((1 << sbps) - 1), sbps)
        return
    if mode == "verbatim":
        w.write(1, 6)
        w.write(0, 1)
        for v in chan:
            w.write(int(v) & ((1 << sbps) - 1), sbps)
        return
    if mode == "lpc" and nb >= 3:
        order = 2
        c0, c1 = _LPC2_COEFS
        prev1 = chan[order - 1 : -1].astype(np.int64)  # s[i-1]
        prev2 = chan[order - 2 : -2].astype(np.int64)  # s[i-2]
        # exact in int64: |c| < 2^12, |s| < 2^33, and numpy's >> on
        # int64 is the same arithmetic (floor) shift as Python's
        pred = (c0 * prev1 + c1 * prev2) >> _LPC2_SHIFT
        resid = chan[order:].astype(np.int64) - pred
        w.write(32 + (order - 1), 6)  # LPC subframe type
        w.write(0, 1)
        for v in chan[:order]:
            w.write(int(v) & ((1 << sbps) - 1), sbps)
        w.write(_LPC2_PREC - 1, 4)
        w.write(_LPC2_SHIFT & 0x1F, 5)
        for c in _LPC2_COEFS:
            w.write(c & ((1 << _LPC2_PREC) - 1), _LPC2_PREC)
        w.write(0, 2)  # rice method 0
        w.write(0, 4)  # partition order 0
        k = _best_k(resid)
        w.write(k, 4)
        _rice_write(w, resid, k)
        return
    # best fixed order by residual magnitude (also the mode="lpc"
    # fallback for blocks too short to carry order-2 warm-up)
    best = None
    for order in range(5):
        if order >= nb:
            break
        resid = chan.copy()
        for _ in range(order):
            resid = np.diff(resid)
        cost = int(np.abs(resid).sum())
        if best is None or cost < best[1]:
            best = (order, cost, resid)
    order, _cost, resid = best  # resid length is nb - order
    w.write(8 + order, 6)
    w.write(0, 1)
    for v in chan[:order]:
        w.write(int(v) & ((1 << sbps) - 1), sbps)
    w.write(0, 2)  # rice method 0
    w.write(0, 4)  # partition order 0
    k = _best_k(resid)
    w.write(k, 4)
    _rice_write(w, resid, k)


def _encode_frame(
    blk: np.ndarray,
    frame_no: int,
    rate: int,
    bps: int,
    mode: str,
    stereo_mode: str = "independent",
) -> bytes:
    nb, nch = blk.shape
    # frame channel assignment: independent (code nch-1) or, under
    # stereo_mode="decorr", cycle left/side(8) right/side(9)
    # mid/side(10) independent(1) so one stream hits every decode path
    assign = nch - 1
    if stereo_mode == "decorr" and nch == 2:
        assign = (8, 9, 10, 1)[frame_no % 4]
    w = _BitW()
    w.write(0b11111111111110, 14)
    w.write(0, 1)
    w.write(0, 1)  # fixed blocking
    w.write(7, 4)  # 16-bit blocksize-1 at end of header
    w.write(0, 4)  # rate from STREAMINFO
    w.write(assign, 4)
    w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
    w.write(0, 1)
    hdr_tail = _utf8_num(frame_no)
    for byte in hdr_tail:
        w.write(byte, 8)
    w.write(nb - 1, 16)
    w.align()
    hdr = w.bytes()
    hdr += bytes([_crc8(hdr)])

    w = _BitW()
    if assign in (8, 9, 10):
        left = blk[:, 0].astype(np.int64)
        right = blk[:, 1].astype(np.int64)
        side = left - right  # fits bps+1 bits
        if assign == 8:  # left/side
            chans = [(left, bps), (side, bps + 1)]
        elif assign == 9:  # right/side
            chans = [(side, bps + 1), (right, bps)]
        else:  # mid/side: mid = (L+R)>>1, side's low bit restores parity
            mid = (left + right) >> 1
            chans = [(mid, bps), (side, bps + 1)]
        for chan, sbps in chans:
            _encode_subframe(w, chan, sbps, mode, nb)
    else:
        for c in range(nch):
            _encode_subframe(w, blk[:, c].astype(np.int64), bps, mode, nb)
    w.align()
    body = w.bytes()
    crc = _crc16(hdr + body)
    return hdr + body + struct.pack(">H", crc)
