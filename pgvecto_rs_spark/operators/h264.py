"""H.264/AVC constrained-baseline IDR (I-frame) decoder + encoder twin.

Closes the last honest gap in the video path: ``operators.mp4`` (r8)
extracts real AVC access units at exact byte extents, and this module
decodes the KEYFRAME subset of them to pixels — the part of H.264 a
frame-sampling curation pipeline actually consumes.  Scope, chosen so
every implemented path is complete rather than approximate:

- NAL layer: Annex-B start-code scan and avcC length-prefixed sample
  bodies, emulation-prevention (0x000003) removal, SPS/PPS parse
  (Exp-Golomb), slice-header parse.
- IDR / I slices only, CAVLC entropy coding (``entropy_coding_mode=0``
  — the constrained-baseline requirement), progressive frames
  (``frame_mbs_only=1``), 4:2:0 8-bit.
- All three I-macroblock classes: I_4x4 (9 prediction modes), I_16x16
  (4 modes incl. plane), I_PCM; chroma intra (DC/H/V/plane); full
  CAVLC residual decode (coeff_token all four nC classes + chroma-DC
  table, level prefix/suffix with both escape forms, total_zeros,
  run_before); exact integer dequant + inverse 4x4 core transform,
  4x4 luma-DC Hadamard, 2x2 chroma-DC Hadamard (ITU-T H.264 §8.5).

OUT of scope, rejected loudly (never wrong pixels): P/B slices, CABAC,
FMO/ASO, interlace, high-profile 8x8 transform, and the in-loop
deblocking filter — streams must set ``disable_deblocking_filter_idc
== 1`` (the encoder twin always does); anything else raises
``NotImplementedError`` into the documented ``on_error`` ingest
policy.  Inter-frame decode genuinely needs a compiled codec and stays
behind the existing ffmpeg seam in ``operators.multimodal``.

The encoder twin (``encode_idr_stream``) writes spec-valid Annex-B
streams (SPS+PPS+IDR) from an explicit per-macroblock plan of
prediction modes and QUANTIZED coefficients, sharing the prediction/
transform primitives with the decoder; ``reconstruct_plan`` computes
the exact pixels the decoder must produce.  Tests therefore verify in
layers: transforms against an independent matrix implementation,
prediction against the spec formulas, and the full bitstream path by
encode→decode round-trip over randomized plans.  CAVLC code tables
are transcribed from ITU-T H.264 (2021) Tables 9-5/9-7/9-8/9-9/9-10.

Reference parity: N/A — /root/reference (pgvecto.rs) has no media
surface; this extends the engine for LLM-training-data work like the
rest of ``operators.multimodal``.
"""

from __future__ import annotations

import re

import numpy as np

from .flac import _BitW

__all__ = [
    "decode_idr_frame",
    "encode_idr_stream",
    "is_annexb",
    "parse_pps",
    "parse_sps",
    "reconstruct_plan",
    "split_annexb",
    "split_length_prefixed",
]


# ---------------------------------------------------------------------------
# NAL layer
# ---------------------------------------------------------------------------


def is_annexb(data: bytes) -> bool:
    return data[:3] == b"\x00\x00\x01" or data[:4] == b"\x00\x00\x00\x01"


def split_annexb(data: bytes) -> list[bytes]:
    """NAL unit payloads (header byte included, EP bytes still in) from
    an Annex-B byte stream."""
    if not is_annexb(data):
        raise ValueError("h264: no Annex-B start code")
    nals: list[bytes] = []
    n = len(data)
    starts: list[int] = []
    i = data.find(b"\x00\x00\x01")
    while i != -1:
        starts.append(i + 3)
        i = data.find(b"\x00\x00\x01", i + 3)
    for j, s in enumerate(starts):
        e = starts[j + 1] - 3 if j + 1 < len(starts) else n
        # trim the 0x00 that belonged to a 4-byte start code / trailing
        # zero padding (spec: trailing_zero_8bits)
        while e > s and data[e - 1] == 0:
            e -= 1
        if e > s:
            nals.append(data[s:e])
    if not nals:
        raise ValueError("h264: empty Annex-B stream")
    return nals


def split_length_prefixed(data: bytes, nal_length_size: int = 4) -> list[bytes]:
    """NAL unit payloads from an avcC-format (length-prefixed) sample."""
    if nal_length_size not in (1, 2, 4):
        raise ValueError("h264: nal_length_size must be 1, 2 or 4")
    nals: list[bytes] = []
    pos, n = 0, len(data)
    while pos < n:
        if pos + nal_length_size > n:
            raise ValueError("h264: truncated NAL length prefix")
        ln = int.from_bytes(data[pos : pos + nal_length_size], "big")
        pos += nal_length_size
        if ln == 0 or pos + ln > n:
            raise ValueError("h264: NAL length overruns sample")
        nals.append(data[pos : pos + ln])
        pos += ln
    if not nals:
        raise ValueError("h264: empty sample")
    return nals


def _strip_ep(nal: bytes) -> bytes:
    """Remove emulation-prevention bytes: 00 00 03 -> 00 00.

    ``bytes.replace`` is exactly the spec's stateful scan: both perform
    left-to-right NON-overlapping replacement of ``00 00 03``, and the
    spec scan's zeros-reset after a strip is precisely "resume matching
    after the replaced pair" (pinned against the loop form by
    ``test_ep_round_trip`` + the byte-flip fuzz contract)."""
    if b"\x00\x00\x03" not in nal:
        return nal
    return nal.replace(b"\x00\x00\x03", b"\x00\x00")


# the EP inserter's stateful scan as a regex: a 00 00 pair followed by a
# byte <= 3 gets an 03 appended; sub() resumes after the consumed pair,
# which is the loop's zeros-reset
_EP_INS_RE = re.compile(rb"\x00\x00(?=[\x00-\x03])")


def _insert_ep(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes so no 00 00 0x (x<=3) runs."""
    return _EP_INS_RE.sub(b"\x00\x00\x03", rbsp)


class _Bits:
    """MSB-first bit reader over an RBSP (EP bytes already stripped).

    Same windowed-integer design as ``flac._Bits`` (the r13 codec
    lesson): ``acc`` caches the next ``nacc`` unread bits top-aligned,
    with ``pos + nacc`` always byte-aligned so refills gulp whole
    bytes; ``ue`` counts leading zeros in O(1) per window via
    ``int.bit_length`` instead of one ``u(1)`` call per zero bit.
    ``pos`` (bits consumed) stays the source of truth — the PCM
    byte-skip in ``_parse_mb`` resets the window after moving it."""

    __slots__ = ("data", "pos", "nbits", "acc", "nacc", "_last")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = 8 * len(data)
        self.acc = 0
        self.nacc = 0
        self._last = -2  # lazily computed index of the last 1 bit

    def _fill(self, need: int) -> None:
        a, na = self.acc, self.nacc
        byte = (self.pos + na) >> 3
        data = self.data
        while na < need:
            chunk = data[byte : byte + 8]
            if not chunk:
                raise ValueError("h264: bitstream exhausted")
            a = (a << (len(chunk) * 8)) | int.from_bytes(chunk, "big")
            na += len(chunk) * 8
            byte += len(chunk)
        self.acc, self.nacc = a, na

    def u(self, n: int) -> int:
        if self.nacc < n:
            if self.pos + n > self.nbits:
                raise ValueError("h264: bitstream exhausted")
            self._fill(n)
        na = self.nacc - n
        v = self.acc >> na
        self.acc &= (1 << na) - 1
        self.nacc = na
        self.pos += n
        return v

    def ue(self) -> int:
        zeros = 0
        while True:
            if self.nacc == 0:
                if self.pos >= self.nbits:
                    raise ValueError("h264: bitstream exhausted")
                self._fill(1)
            if self.acc:
                lead = self.nacc - self.acc.bit_length()
                zeros += lead
                if zeros > 31:
                    raise ValueError("h264: Exp-Golomb code too long")
                na = self.nacc - lead - 1  # consume the zeros + stop 1
                self.acc &= (1 << na) - 1
                self.nacc = na
                self.pos += lead + 1
                break
            zeros += self.nacc
            if zeros > 31:
                raise ValueError("h264: Exp-Golomb code too long")
            self.pos += self.nacc
            self.nacc = 0
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) >> 1 if k & 1 else -(k >> 1)

    def align(self) -> None:
        # pos + nacc is byte-aligned, so the bits to drop are nacc & 7
        d = self.nacc & 7
        if d:
            na = self.nacc - d
            self.acc &= (1 << na) - 1
            self.nacc = na
            self.pos += d
        elif self.pos & 7:  # empty window, unaligned pos (post-skip)
            self.pos = (self.pos + 7) & ~7

    def more_rbsp_data(self) -> bool:
        """True while payload bits remain before rbsp_stop_one_bit."""
        if self.pos >= self.nbits:
            return False
        # find last 1 bit in the stream — everything at/after it is
        # rbsp_trailing_bits; data is immutable, so compute it once
        last = self._last
        if last == -2:
            d = self.data
            i = len(d) - 1
            while i >= 0 and d[i] == 0:
                i -= 1
            last = (-1 if i < 0
                    else i * 8 + 8 - (d[i] & -d[i]).bit_length())
            self._last = last
        return self.pos < last


# ---------------------------------------------------------------------------
# SPS / PPS / slice header
# ---------------------------------------------------------------------------


def parse_sps(nal: bytes) -> dict:
    """seq_parameter_set_rbsp (§7.3.2.1.1), baseline/main subset."""
    r = _Bits(_strip_ep(nal))
    if r.u(1) != 0:
        raise ValueError("h264: forbidden_zero_bit set")
    r.u(2)  # nal_ref_idc
    if r.u(5) != 7:
        raise ValueError("h264: not an SPS NAL")
    profile = r.u(8)
    r.u(8)  # constraint flags + reserved
    level = r.u(8)
    sps_id = r.ue()
    if profile not in (66, 77):  # baseline, main
        raise NotImplementedError(
            f"h264: profile_idc {profile} not supported (baseline/main only)"
        )
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    log2_max_poc_lsb = 0
    if poc_type == 0:
        log2_max_poc_lsb = r.ue() + 4
    elif poc_type == 1:
        raise NotImplementedError("h264: pic_order_cnt_type 1 not supported")
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    width_mbs = r.ue() + 1
    height_map_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        raise NotImplementedError("h264: interlace not supported")
    r.u(1)  # direct_8x8_inference_flag
    crop = (0, 0, 0, 0)
    if r.u(1):  # frame_cropping_flag
        crop = (r.ue(), r.ue(), r.ue(), r.ue())
    # vui ignored
    return {
        "profile_idc": profile,
        "level_idc": level,
        "sps_id": sps_id,
        "log2_max_frame_num": log2_max_frame_num,
        "poc_type": poc_type,
        "log2_max_poc_lsb": log2_max_poc_lsb,
        "width_mbs": width_mbs,
        "height_mbs": height_map_units,
        "crop": crop,  # (left, right, top, bottom) in chroma units
    }


def parse_pps(nal: bytes) -> dict:
    """pic_parameter_set_rbsp (§7.3.2.2), CAVLC baseline subset."""
    r = _Bits(_strip_ep(nal))
    if r.u(1) != 0:
        raise ValueError("h264: forbidden_zero_bit set")
    r.u(2)
    if r.u(5) != 8:
        raise ValueError("h264: not a PPS NAL")
    pps_id = r.ue()
    sps_id = r.ue()
    entropy = r.u(1)
    if entropy:
        raise NotImplementedError("h264: CABAC not supported (CAVLC only)")
    bottom_poc_present = r.u(1)
    if r.ue() != 0:  # num_slice_groups_minus1
        raise NotImplementedError("h264: FMO (slice groups) not supported")
    r.ue()  # num_ref_idx_l0_default_active_minus1
    r.ue()  # num_ref_idx_l1_default_active_minus1
    r.u(1)  # weighted_pred_flag
    r.u(2)  # weighted_bipred_idc
    pic_init_qp = 26 + r.se()
    r.se()  # pic_init_qs
    chroma_qp_offset = r.se()
    deblock_present = r.u(1)
    constrained_intra = r.u(1)
    r.u(1)  # redundant_pic_cnt_present_flag
    return {
        "pps_id": pps_id,
        "sps_id": sps_id,
        "bottom_poc_present": bottom_poc_present,
        "pic_init_qp": pic_init_qp,
        "chroma_qp_offset": chroma_qp_offset,
        "deblock_present": deblock_present,
        "constrained_intra": constrained_intra,
    }


_PS_CACHE: dict[tuple[int, bytes], dict] = {}


def _parse_ps_cached(kind: int, nal: bytes) -> dict:
    """Memoized parse_sps/parse_pps (pure functions of the NAL bytes;
    the per-frame decode path re-sees the same parameter sets for every
    sample of a stream).  Successful parses only; callers never mutate
    the returned dicts.  Bounded: cleared at 128 distinct sets."""
    key = (kind, nal)
    d = _PS_CACHE.get(key)
    if d is None:
        if len(_PS_CACHE) >= 128:
            _PS_CACHE.clear()
        d = parse_sps(nal) if kind == 7 else parse_pps(nal)
        _PS_CACHE[key] = d
    return d


def _parse_slice_header(r: _Bits, nal_type: int, sps: dict, pps: dict) -> dict:
    first_mb = r.ue()
    if first_mb != 0:
        raise NotImplementedError("h264: multi-slice frames not supported")
    slice_type = r.ue()
    if slice_type % 5 != 2:  # I slice
        raise NotImplementedError("h264: only I slices supported (IDR decode)")
    pps_id = r.ue()
    if pps_id != pps["pps_id"]:
        raise ValueError("h264: slice references unknown PPS")
    r.u(sps["log2_max_frame_num"])  # frame_num
    if nal_type == 5:
        r.ue()  # idr_pic_id
    if sps["poc_type"] == 0:
        r.u(sps["log2_max_poc_lsb"])  # pic_order_cnt_lsb
        if pps["bottom_poc_present"]:
            r.se()
    # I slice: no ref pic list modification
    if nal_type == 5:
        r.u(1)  # no_output_of_prior_pics_flag
        r.u(1)  # long_term_reference_flag
    qp = pps["pic_init_qp"] + r.se()
    if pps["deblock_present"]:
        if r.ue() != 1:  # disable_deblocking_filter_idc
            raise NotImplementedError(
                "h264: in-loop deblocking filter not implemented — "
                "streams must code disable_deblocking_filter_idc=1"
            )
    else:
        raise NotImplementedError(
            "h264: deblocking filter not implemented — streams must carry "
            "deblocking_filter_control_present_flag=1 and disable it"
        )
    return {"qp": qp}


# ---------------------------------------------------------------------------
# CAVLC tables (ITU-T H.264 Tables 9-5, 9-7/9-8, 9-9(a), 9-10)
# ---------------------------------------------------------------------------

# coeff_token: per nC class, rows = TotalCoeff 0..16 (chroma DC 0..4),
# 4 columns = TrailingOnes 0..3, entries (length, bits); 0-length =
# impossible combination.
_CT_LEN = [
    # 0 <= nC < 2
    [(1, 1), (0, 0), (0, 0), (0, 0),
     (6, 5), (2, 1), (0, 0), (0, 0),
     (8, 7), (6, 4), (3, 1), (0, 0),
     (9, 7), (8, 6), (7, 5), (5, 3),
     (10, 7), (9, 6), (8, 5), (6, 3),
     (11, 7), (10, 6), (9, 5), (7, 4),
     (13, 15), (11, 6), (10, 5), (8, 4),
     (13, 11), (13, 14), (11, 5), (9, 4),
     (13, 8), (13, 10), (13, 13), (10, 4),
     (14, 15), (14, 14), (13, 9), (11, 4),
     (14, 11), (14, 10), (14, 13), (13, 12),
     (15, 15), (15, 14), (14, 9), (14, 12),
     (15, 11), (15, 10), (15, 13), (14, 8),
     (16, 15), (15, 1), (15, 9), (15, 12),
     (16, 11), (16, 14), (16, 13), (15, 8),
     (16, 7), (16, 10), (16, 9), (16, 12),
     (16, 4), (16, 6), (16, 5), (16, 8)],
    # 2 <= nC < 4
    [(2, 3), (0, 0), (0, 0), (0, 0),
     (6, 11), (2, 2), (0, 0), (0, 0),
     (6, 7), (5, 7), (3, 3), (0, 0),
     (7, 7), (6, 10), (6, 9), (4, 5),
     (8, 7), (6, 6), (6, 5), (4, 4),
     (8, 4), (7, 6), (7, 5), (5, 6),
     (9, 7), (8, 6), (8, 5), (6, 8),
     (11, 15), (9, 6), (9, 5), (6, 4),
     (11, 11), (11, 14), (11, 13), (7, 4),
     (12, 15), (11, 10), (11, 9), (9, 4),
     (12, 11), (12, 14), (12, 13), (11, 12),
     (12, 8), (12, 10), (12, 9), (11, 8),
     (13, 15), (13, 14), (13, 13), (12, 12),
     (13, 11), (13, 10), (13, 9), (13, 12),
     (13, 7), (14, 11), (13, 6), (13, 8),
     (14, 9), (14, 8), (14, 10), (13, 1),
     (14, 7), (14, 6), (14, 5), (14, 4)],
    # 4 <= nC < 8
    [(4, 15), (0, 0), (0, 0), (0, 0),
     (6, 15), (4, 14), (0, 0), (0, 0),
     (6, 11), (5, 15), (4, 13), (0, 0),
     (6, 8), (5, 12), (5, 14), (4, 12),
     (7, 15), (5, 10), (5, 11), (4, 11),
     (7, 11), (5, 8), (5, 9), (4, 10),
     (7, 9), (6, 14), (6, 13), (4, 9),
     (7, 8), (6, 10), (6, 9), (4, 8),
     (8, 15), (7, 14), (7, 13), (5, 13),
     (8, 11), (8, 14), (7, 10), (6, 12),
     (9, 15), (8, 10), (8, 13), (7, 12),
     (9, 11), (9, 14), (8, 9), (8, 12),
     (9, 8), (9, 10), (9, 13), (8, 8),
     (10, 13), (9, 7), (9, 9), (9, 12),
     (10, 9), (10, 12), (10, 11), (10, 10),
     (10, 5), (10, 8), (10, 7), (10, 6),
     (10, 1), (10, 4), (10, 3), (10, 2)],
    # nC == -1 (chroma DC, 4:2:0)
    [(2, 1), (0, 0), (0, 0), (0, 0),
     (6, 7), (1, 1), (0, 0), (0, 0),
     (6, 4), (6, 6), (3, 1), (0, 0),
     (6, 3), (7, 3), (7, 2), (6, 5),
     (6, 2), (8, 3), (8, 2), (7, 0)],
]


def _prefix_decoder(entries):
    """(length,bits) rows -> dict[(length, bits)] -> (T1s, TotalCoeff)."""
    d = {}
    for i, (ln, bits) in enumerate(entries):
        if ln == 0:
            continue
        tc, t1 = divmod(i, 4)
        d[(ln, bits)] = (t1, tc)
    return d


_CT_DEC = [_prefix_decoder(t) for t in _CT_LEN]
_CT_ENC = [
    {(t1, tc): (ln, bits)
     for (ln, bits), (t1, tc) in _prefix_decoder(t).items()}
    for t in _CT_LEN
]

# total_zeros for 4x4 blocks: row = TotalCoeff-1 (1..15), col =
# total_zeros; entries (length, bits)
_TZ_LEN = [
    [1, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 9],
    [3, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 6, 6, 6, 6],
    [4, 3, 3, 3, 4, 4, 3, 3, 4, 5, 5, 6, 5, 6],
    [5, 3, 4, 4, 3, 3, 3, 4, 3, 4, 5, 5, 5],
    [4, 4, 4, 3, 3, 3, 3, 3, 4, 5, 4, 5],
    [6, 5, 3, 3, 3, 3, 3, 3, 4, 3, 6],
    [6, 5, 3, 3, 3, 2, 3, 4, 3, 6],
    [6, 4, 5, 3, 2, 2, 3, 3, 6],
    [6, 6, 4, 2, 2, 3, 2, 5],
    [5, 5, 3, 2, 2, 2, 4],
    [4, 4, 3, 3, 1, 3],
    [4, 4, 2, 1, 3],
    [3, 3, 1, 2],
    [2, 2, 1],
    [1, 1],
]
_TZ_BITS = [
    [1, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 1],
    [7, 6, 5, 4, 3, 5, 4, 3, 2, 3, 2, 3, 2, 1, 0],
    [5, 7, 6, 5, 4, 3, 4, 3, 2, 3, 2, 1, 1, 0],
    [3, 7, 5, 4, 6, 5, 4, 3, 3, 2, 2, 1, 0],
    [5, 4, 3, 7, 6, 5, 4, 3, 2, 1, 1, 0],
    [1, 1, 7, 6, 5, 4, 3, 2, 1, 1, 0],
    [1, 1, 5, 4, 3, 3, 2, 1, 1, 0],
    [1, 1, 1, 3, 3, 2, 2, 1, 0],
    [1, 0, 1, 3, 2, 1, 1, 1],
    [1, 0, 1, 3, 2, 1, 1],
    [0, 1, 1, 2, 1, 3],
    [0, 1, 1, 1, 1],
    [0, 1, 1, 1],
    [0, 1, 1],
    [0, 1],
]

# chroma-DC total_zeros (maxNumCoeff 4): row = TotalCoeff-1
_TZC_LEN = [[1, 2, 3, 3], [1, 2, 2], [1, 1]]
_TZC_BITS = [[1, 1, 1, 0], [1, 1, 0], [1, 0]]

# run_before: row = min(zerosLeft,7)-1, col = run_before
_RUN_LEN = [
    [1, 1],
    [1, 2, 2],
    [2, 2, 2, 2],
    [2, 2, 2, 3, 3],
    [2, 2, 3, 3, 3, 3],
    [2, 3, 3, 3, 3, 3, 3],
    [3, 3, 3, 3, 3, 3, 3, 4, 5, 6, 7, 8, 9, 10, 11],
]
_RUN_BITS = [
    [1, 0],
    [1, 1, 0],
    [3, 2, 1, 0],
    [3, 2, 1, 1, 0],
    [3, 2, 3, 2, 1, 0],
    [3, 0, 1, 3, 2, 5, 4],
    [7, 6, 5, 4, 3, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1],
]


def _read_vlc(r: _Bits, table: dict, what: str):
    """Match a (length,bits)-keyed prefix table bit by bit."""
    code, ln = 0, 0
    while ln < 20:
        code = (code << 1) | r.u(1)
        ln += 1
        hit = table.get((ln, code))
        if hit is not None:
            return hit
    raise ValueError(f"h264: invalid {what} code")


_LEN_BITS_PAIRS: dict[tuple[int, int], dict] = {}


def _read_len_bits(r: _Bits, lens: list, bits: list, what: str) -> int:
    code, ln = 0, 0
    # lens/bits are module-level constant tables — build each pair dict
    # once (keyed by identity) instead of per decoded block
    pairs = _LEN_BITS_PAIRS.get((id(lens), id(bits)))
    if pairs is None:
        pairs = {(lens[i], bits[i]): i for i in range(len(lens))}
        _LEN_BITS_PAIRS[(id(lens), id(bits))] = pairs
    while ln < 12:
        code = (code << 1) | r.u(1)
        ln += 1
        if (ln, code) in pairs:
            return pairs[(ln, code)]
    raise ValueError(f"h264: invalid {what} code")


def _coeff_token_class(nC: int) -> int:
    if nC == -1:
        return 3
    if nC < 2:
        return 0
    if nC < 4:
        return 1
    if nC < 8:
        return 2
    return -1  # FLC


def _residual_block_cavlc(r: _Bits, nC: int, max_coeff: int) -> list[int]:
    """§9.2: one CAVLC residual block -> coefficient levels in scan
    order (list of length max_coeff)."""
    cls = _coeff_token_class(nC)
    if cls >= 0:
        t1s, total = _read_vlc(r, _CT_DEC[cls], "coeff_token")
    else:  # nC >= 8: 6-bit FLC, code = (TotalCoeff-1)<<2 | T1s; 3 = empty
        code = r.u(6)
        if code == 3:
            t1s, total = 0, 0
        else:
            total, t1s = (code >> 2) + 1, code & 3
            if t1s > min(3, total):
                raise ValueError("h264: invalid FLC coeff_token")
    if total > max_coeff:
        raise ValueError("h264: coeff_token exceeds block size")
    coeffs = [0] * max_coeff
    if total == 0:
        return coeffs

    levels = [0] * total
    for i in range(t1s):  # trailing ones: sign bits
        levels[i] = -1 if r.u(1) else 1
    suffix_len = 1 if (total > 10 and t1s < 3) else 0
    for i in range(t1s, total):
        prefix = 0
        while r.u(1) == 0:
            prefix += 1
            if prefix > 32:
                raise ValueError("h264: level_prefix too long")
        size = suffix_len
        if prefix == 14 and suffix_len == 0:
            size = 4
        elif prefix >= 15:
            size = prefix - 3
        code = min(15, prefix) << suffix_len
        if size:
            code += r.u(size)
        if prefix >= 15 and suffix_len == 0:
            code += 15
        if prefix >= 16:
            code += (1 << (prefix - 3)) - 4096
        if i == t1s and t1s < 3:
            code += 2
        levels[i] = (code + 2) >> 1 if code % 2 == 0 else (-code - 1) >> 1
        if suffix_len == 0:
            suffix_len = 1
        if abs(levels[i]) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1

    if total < max_coeff:
        if nC == -1:
            tz = _read_len_bits(
                r, _TZC_LEN[total - 1], _TZC_BITS[total - 1], "total_zeros"
            )
        else:
            tz = _read_len_bits(
                r, _TZ_LEN[total - 1], _TZ_BITS[total - 1], "total_zeros"
            )
    else:
        tz = 0
    if tz > max_coeff - total:
        raise ValueError("h264: total_zeros exceeds block")

    runs = [0] * total
    zeros_left = tz
    for i in range(total - 1):
        if zeros_left > 0:
            row = min(zeros_left, 7) - 1
            run = _read_len_bits(r, _RUN_LEN[row], _RUN_BITS[row], "run_before")
        else:
            run = 0
        if run > zeros_left:
            raise ValueError("h264: run_before exceeds zeros_left")
        runs[i] = run
        zeros_left -= run
    runs[total - 1] = zeros_left

    # place levels: levels[0] is the HIGHEST-frequency coefficient
    pos = total - 1 + tz
    for i in range(total):
        if pos >= max_coeff:
            raise ValueError("h264: coefficient position out of range")
        coeffs[pos] = levels[i]
        pos -= 1 + runs[i]
    return coeffs


def _write_vlc(w: _BitW, ln: int, bits: int) -> None:
    w.write(bits, ln)


def _encode_residual_block(
    w: _BitW, coeffs: list[int], nC: int, max_coeff: int
) -> int:
    """Encoder-twin inverse of ``_residual_block_cavlc``; returns
    TotalCoeff for context bookkeeping."""
    nz = [(i, c) for i, c in enumerate(coeffs[:max_coeff]) if c != 0]
    total = len(nz)
    # trailing ones: up to 3 |c|==1 at the high-frequency end
    t1s = 0
    for _i, c in reversed(nz):
        if abs(c) == 1 and t1s < 3:
            t1s += 1
        else:
            break
    cls = _coeff_token_class(nC)
    if cls >= 0:
        ln, bits = _CT_ENC[cls][(t1s, total)]
        _write_vlc(w, ln, bits)
    else:
        _write_vlc(w, 6, 3 if total == 0 else ((total - 1) << 2) | t1s)
    if total == 0:
        return 0

    ordered = [c for _i, c in reversed(nz)]  # high freq first
    for i in range(t1s):
        w.write(1 if ordered[i] < 0 else 0, 1)
    suffix_len = 1 if (total > 10 and t1s < 3) else 0
    for i in range(t1s, total):
        level = ordered[i]
        code = 2 * level - 2 if level > 0 else -2 * level - 1
        if i == t1s and t1s < 3:
            code -= 2
        if suffix_len == 0:
            if code < 14:
                _write_vlc(w, code + 1, 1)  # prefix zeros + stop 1
            elif code < 30:
                _write_vlc(w, 15, 1)  # prefix 14
                w.write(code - 14, 4)
            else:
                esc = code - 30
                if esc >= 1 << 12:
                    raise ValueError("h264 twin: level too large to encode")
                _write_vlc(w, 16, 1)  # prefix 15
                w.write(esc, 12)
        else:
            if (code >> suffix_len) < 15:
                _write_vlc(w, (code >> suffix_len) + 1, 1)
                w.write(code & ((1 << suffix_len) - 1), suffix_len)
            else:
                esc = code - (15 << suffix_len)
                if esc >= 1 << 12:
                    raise ValueError("h264 twin: level too large to encode")
                _write_vlc(w, 16, 1)
                w.write(esc, 12)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1

    highest = nz[-1][0]
    tz = highest + 1 - total
    if total < max_coeff:
        if nC == -1:
            _write_vlc(w, _TZC_LEN[total - 1][tz], _TZC_BITS[total - 1][tz])
        else:
            _write_vlc(w, _TZ_LEN[total - 1][tz], _TZ_BITS[total - 1][tz])
    zeros_left = tz
    positions = [i for i, _c in reversed(nz)]
    for i in range(total - 1):
        run = positions[i] - positions[i + 1] - 1
        if zeros_left > 0:
            row = min(zeros_left, 7) - 1
            _write_vlc(w, _RUN_LEN[row][run], _RUN_BITS[row][run])
        zeros_left -= run
    return total


# ---------------------------------------------------------------------------
# scans, dequant, inverse transforms (§8.5)
# ---------------------------------------------------------------------------

# 4x4 zigzag scan: list of (row, col)
_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (3, 1), (2, 2), (1, 3), (2, 3), (3, 2), (3, 3),
]
# luma 4x4 block scan within a MB (§6.4.3): idx -> (blk_x, blk_y)
_BLK4 = [
    (0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1), (3, 1),
    (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2), (2, 3), (3, 3),
]
# normAdjust4x4 (§8.5.9), per qp%6: (v for pos-class 0, 1, 2) where
# class 0 = (0,0),(0,2),(2,0),(2,2); class 1 = (1,1),(1,3),(3,1),(3,3)
_NORM_ADJ = [(10, 16, 13), (11, 18, 14), (13, 20, 16),
             (14, 23, 18), (16, 25, 20), (18, 29, 23)]
_POS_CLASS = [[0, 2, 0, 2], [2, 1, 2, 1], [0, 2, 0, 2], [2, 1, 2, 1]]

# QPc from qPi (Table 8-15)
_CHROMA_QP = list(range(30)) + [29, 30, 31, 32, 32, 33, 34, 34, 35, 35,
                                36, 36, 37, 37, 37, 38, 38, 38, 39, 39,
                                39, 39]


def _chroma_qp(qp_y: int, offset: int) -> int:
    return _CHROMA_QP[max(0, min(51, qp_y + offset))]


# flat zigzag index (k -> i*4+j) and per-qp%6 normAdjust aligned to the
# zigzag SCAN order, so dequant is one vectorized multiply + scatter
_ZZ_FLAT = np.array([i * 4 + j for (i, j) in _ZIGZAG], dtype=np.int64)
_NORM_SCAN = np.array(
    [[_NORM_ADJ[m][_POS_CLASS[i][j]] for (i, j) in _ZIGZAG]
     for m in range(6)], dtype=np.int64)


def _dequant4x4(coeffs: list[int], qp: int) -> np.ndarray:
    """Flat-matrix §8.5.12.1: d = c * normAdjust << (qp/6); ``coeffs``
    in zigzag scan order (16 entries; AC-only blocks pass a leading 0)."""
    d = np.zeros(16, dtype=np.int64)
    d[_ZZ_FLAT] = (np.asarray(coeffs, dtype=np.int64)
                   * _NORM_SCAN[qp % 6]) << (qp // 6)
    return d.reshape(4, 4)


def _itrans4x4(d: np.ndarray) -> np.ndarray:
    """§8.5.12.2 core inverse transform; output residual (already
    (x+32)>>6 rounded)."""
    e = np.empty((4, 4), dtype=np.int64)
    for i in range(4):  # rows
        d0, d1, d2, d3 = d[i]
        a, b = d0 + d2, d0 - d2
        c, f = (d1 >> 1) - d3, d1 + (d3 >> 1)
        e[i] = (a + f, b + c, b - c, a - f)
    g = np.empty((4, 4), dtype=np.int64)
    for j in range(4):  # columns
        d0, d1, d2, d3 = e[:, j]
        a, b = d0 + d2, d0 - d2
        c, f = (d1 >> 1) - d3, d1 + (d3 >> 1)
        g[:, j] = (a + f, b + c, b - c, a - f)
    return (g + 32) >> 6


_HAD4 = np.array([[1, 1, 1, 1], [1, 1, -1, -1],
                  [1, -1, -1, 1], [1, -1, 1, -1]], dtype=np.int64)


def _luma_dc(levels: list[int], qp: int) -> np.ndarray:
    """§8.5.10: inverse 4x4 Hadamard + DC scaling; ``levels`` in zigzag
    scan; returns the 4x4 matrix of per-block DC values d00 (matrix
    index [blk_y][blk_x])."""
    c = np.zeros(16, dtype=np.int64)
    c[_ZZ_FLAT] = levels
    f = _HAD4 @ c.reshape(4, 4) @ _HAD4
    ls16 = 16 * _NORM_ADJ[qp % 6][0]
    if qp >= 36:
        return (f * ls16) << (qp // 6 - 6)
    return (f * ls16 + (1 << (5 - qp // 6))) >> (6 - qp // 6)


_HAD2 = np.array([[1, 1], [1, -1]], dtype=np.int64)


def _chroma_dc_vals(levels: list[int], qp: int) -> tuple[int, int, int, int]:
    """§8.5.11 as plain ints (raster f00,f01,f10,f11): the 2x2 inverse
    Hadamard H@C@H written out (exact — |level| < 2^29 from the CAVLC
    prefix cap, so ls16<<sh stays far inside int64)."""
    c00, c01, c10, c11 = levels
    ls16 = 16 * _NORM_ADJ[qp % 6][0]
    sh = qp // 6
    return ((((c00 + c01 + c10 + c11) * ls16) << sh) >> 5,
            (((c00 - c01 + c10 - c11) * ls16) << sh) >> 5,
            (((c00 + c01 - c10 - c11) * ls16) << sh) >> 5,
            (((c00 - c01 - c10 + c11) * ls16) << sh) >> 5)


def _chroma_dc(levels: list[int], qp: int) -> np.ndarray:
    """§8.5.11: 2x2 inverse Hadamard + scaling; ``levels`` raster
    [c00, c01, c10, c11]; returns 2x2 of per-block DC values."""
    return np.array(_chroma_dc_vals(levels, qp),
                    dtype=np.int64).reshape(2, 2)


def _block_residual(ac_scan: list[int], dc: int | None, qp: int):
    """Residual of one 4x4 block: AC levels (15-entry scan, positions
    1..15) dequantized at ``qp``; ``dc`` (if not None) is a pre-scaled
    DC from the Hadamard path injected unscaled at d00.

    DC-only blocks (the overwhelmingly common case in intra video:
    flat regions quantize all AC away) skip the transform — the core
    inverse of a lone d00 is the constant (d00 + 32) >> 6 (row pass
    spreads d00 to e0..e3, column pass again, final rounding shift) —
    and all-zero blocks return scalar 0 so callers can skip the add."""
    if not any(ac_scan):
        if not dc:
            return 0
        return (int(dc) + 32) >> 6
    d = _dequant4x4([0] + list(ac_scan), qp)
    if dc is not None:
        d[0, 0] = dc
    return _itrans4x4(d)


# ---------------------------------------------------------------------------
# intra prediction (§8.3)
# ---------------------------------------------------------------------------


def _pred4x4(plane, x, y, mode, avail_l, avail_u, avail_ul, avail_ur):
    """§8.3.1.2 modes 0-8 for the 4x4 at pixel (x, y); neighbors read
    from the partially reconstructed ``plane`` (int array)."""
    if avail_u:
        top = plane[y - 1, x : x + 4].tolist()
        if avail_ur:  # avail_ur implies x + 8 <= plane width
            top += plane[y - 1, x + 4 : x + 8].tolist()
        else:
            top += [top[3]] * 4  # §8.3.1.2: substitute p[3,-1]
    else:
        top = None
    left = plane[y : y + 4, x - 1].tolist() if avail_l else None
    tl = int(plane[y - 1, x - 1]) if avail_ul else None
    p = np.empty((4, 4), dtype=np.int64)

    if mode == 0:  # Vertical
        if top is None:
            raise ValueError("h264: vertical pred without top samples")
        p[:] = np.array(top[:4], dtype=np.int64)[None, :]
    elif mode == 1:  # Horizontal
        if left is None:
            raise ValueError("h264: horizontal pred without left samples")
        p[:] = np.array(left, dtype=np.int64)[:, None]
    elif mode == 2:  # DC
        if top is not None and left is not None:
            p[:] = (sum(top[:4]) + sum(left) + 4) >> 3
        elif left is not None:
            p[:] = (sum(left) + 2) >> 2
        elif top is not None:
            p[:] = (sum(top[:4]) + 2) >> 2
        else:
            p[:] = 128
    elif mode == 3:  # Diagonal_Down_Left
        if top is None:
            raise ValueError("h264: DDL pred without top samples")
        for yy in range(4):
            for xx in range(4):
                if xx == 3 and yy == 3:
                    p[yy, xx] = (top[6] + 3 * top[7] + 2) >> 2
                else:
                    k = xx + yy
                    p[yy, xx] = (top[k] + 2 * top[k + 1] + top[k + 2] + 2) >> 2
    elif mode in (4, 5, 6):  # DDR / VR / HD need left+top+topleft
        if top is None or left is None or tl is None:
            raise ValueError("h264: diagonal pred without full neighbors")

        def pr(px, py):  # p[x, y] accessor with -1 borders
            if px == -1 and py == -1:
                return tl
            if py == -1:
                return top[px]
            return left[py]

        for yy in range(4):
            for xx in range(4):
                if mode == 4:  # Diagonal_Down_Right
                    if xx > yy:
                        p[yy, xx] = (pr(xx - yy - 2, -1) + 2 * pr(xx - yy - 1, -1)
                                     + pr(xx - yy, -1) + 2) >> 2
                    elif xx < yy:
                        p[yy, xx] = (pr(-1, yy - xx - 2) + 2 * pr(-1, yy - xx - 1)
                                     + pr(-1, yy - xx) + 2) >> 2
                    else:
                        p[yy, xx] = (pr(0, -1) + 2 * tl + pr(-1, 0) + 2) >> 2
                elif mode == 5:  # Vertical_Right
                    z = 2 * xx - yy
                    if z >= 0 and z % 2 == 0:
                        p[yy, xx] = (pr(xx - (yy >> 1) - 1, -1)
                                     + pr(xx - (yy >> 1), -1) + 1) >> 1
                    elif z >= 0:
                        p[yy, xx] = (pr(xx - (yy >> 1) - 2, -1)
                                     + 2 * pr(xx - (yy >> 1) - 1, -1)
                                     + pr(xx - (yy >> 1), -1) + 2) >> 2
                    elif z == -1:
                        p[yy, xx] = (pr(-1, 0) + 2 * tl + pr(0, -1) + 2) >> 2
                    else:
                        p[yy, xx] = (pr(-1, yy - 1) + 2 * pr(-1, yy - 2)
                                     + pr(-1, yy - 3) + 2) >> 2
                else:  # Horizontal_Down
                    z = 2 * yy - xx
                    if z >= 0 and z % 2 == 0:
                        p[yy, xx] = (pr(-1, yy - (xx >> 1) - 1)
                                     + pr(-1, yy - (xx >> 1)) + 1) >> 1
                    elif z >= 0:
                        p[yy, xx] = (pr(-1, yy - (xx >> 1) - 2)
                                     + 2 * pr(-1, yy - (xx >> 1) - 1)
                                     + pr(-1, yy - (xx >> 1)) + 2) >> 2
                    elif z == -1:
                        p[yy, xx] = (pr(-1, 0) + 2 * tl + pr(0, -1) + 2) >> 2
                    else:
                        p[yy, xx] = (pr(xx - 1, -1) + 2 * pr(xx - 2, -1)
                                     + pr(xx - 3, -1) + 2) >> 2
    elif mode == 7:  # Vertical_Left
        if top is None:
            raise ValueError("h264: VL pred without top samples")
        for yy in range(4):
            for xx in range(4):
                k = xx + (yy >> 1)
                if yy % 2 == 0:
                    p[yy, xx] = (top[k] + top[k + 1] + 1) >> 1
                else:
                    p[yy, xx] = (top[k] + 2 * top[k + 1] + top[k + 2] + 2) >> 2
    elif mode == 8:  # Horizontal_Up
        if left is None:
            raise ValueError("h264: HU pred without left samples")
        for yy in range(4):
            for xx in range(4):
                z = xx + 2 * yy
                if z > 5:
                    p[yy, xx] = left[3]
                elif z == 5:
                    p[yy, xx] = (left[2] + 3 * left[3] + 2) >> 2
                elif z % 2 == 0:
                    p[yy, xx] = (left[yy + (xx >> 1)]
                                 + left[yy + (xx >> 1) + 1] + 1) >> 1
                else:
                    p[yy, xx] = (left[yy + (xx >> 1)]
                                 + 2 * left[yy + (xx >> 1) + 1]
                                 + left[yy + (xx >> 1) + 2] + 2) >> 2
    else:
        raise ValueError(f"h264: invalid intra 4x4 mode {mode}")
    return p


def _pred16x16(plane, x, y, mode, avail_l, avail_u):
    """§8.3.3 Intra_16x16 prediction (0=V, 1=H, 2=DC, 3=Plane)."""
    p = np.empty((16, 16), dtype=np.int64)
    top = plane[y - 1, x : x + 16].astype(np.int64) if avail_u else None
    left = plane[y : y + 16, x - 1].astype(np.int64) if avail_l else None
    if mode == 0:
        if top is None:
            raise ValueError("h264: I16 vertical without top MB")
        p[:] = top[None, :]
    elif mode == 1:
        if left is None:
            raise ValueError("h264: I16 horizontal without left MB")
        p[:] = left[:, None]
    elif mode == 2:
        if top is not None and left is not None:
            p[:] = (int(top.sum()) + int(left.sum()) + 16) >> 5
        elif left is not None:
            p[:] = (int(left.sum()) + 8) >> 4
        elif top is not None:
            p[:] = (int(top.sum()) + 8) >> 4
        else:
            p[:] = 128
    elif mode == 3:  # Plane
        if top is None or left is None or not (avail_l and avail_u):
            raise ValueError("h264: I16 plane without full neighbors")
        tl = int(plane[y - 1, x - 1])
        hh = sum((i + 1) * (int(top[8 + i]) - int(top[6 - i]) if 6 - i >= 0
                            else int(top[8 + i]) - tl) for i in range(8))
        vv = sum((i + 1) * (int(left[8 + i]) - (int(left[6 - i]) if 6 - i >= 0
                            else tl)) for i in range(8))
        a = 16 * (int(left[15]) + int(top[15]))
        b = (5 * hh + 32) >> 6
        c = (5 * vv + 32) >> 6
        d = np.arange(16, dtype=np.int64) - 7
        p = (a + 16 + b * d[None, :] + c * d[:, None]) >> 5
        np.minimum(p, 255, out=p)
        np.maximum(p, 0, out=p)
    else:
        raise ValueError(f"h264: invalid intra 16x16 mode {mode}")
    return p


def _pred_chroma(plane, x, y, mode, avail_l, avail_u):
    """§8.3.4 chroma 8x8 prediction (0=DC, 1=H, 2=V, 3=Plane)."""
    p = np.empty((8, 8), dtype=np.int64)
    top = plane[y - 1, x : x + 8].astype(np.int64) if avail_u else None
    left = plane[y : y + 8, x - 1].astype(np.int64) if avail_l else None
    if mode == 0:  # DC, per 4x4 sub-block (§8.3.4.1)
        for by in (0, 1):
            for bx in (0, 1):
                t = top[4 * bx : 4 * bx + 4] if top is not None else None
                lf = left[4 * by : 4 * by + 4] if left is not None else None
                if bx == by:  # corner blocks: both groups when available
                    if t is not None and lf is not None:
                        v = (int(t.sum()) + int(lf.sum()) + 4) >> 3
                    elif lf is not None:
                        v = (int(lf.sum()) + 2) >> 2
                    elif t is not None:
                        v = (int(t.sum()) + 2) >> 2
                    else:
                        v = 128
                elif bx == 1:  # top-right block prefers top
                    if t is not None:
                        v = (int(t.sum()) + 2) >> 2
                    elif lf is not None:
                        v = (int(lf.sum()) + 2) >> 2
                    else:
                        v = 128
                else:  # bottom-left block prefers left
                    if lf is not None:
                        v = (int(lf.sum()) + 2) >> 2
                    elif t is not None:
                        v = (int(t.sum()) + 2) >> 2
                    else:
                        v = 128
                p[4 * by : 4 * by + 4, 4 * bx : 4 * bx + 4] = v
    elif mode == 1:
        if left is None:
            raise ValueError("h264: chroma horizontal without left MB")
        p[:] = left[:, None]
    elif mode == 2:
        if top is None:
            raise ValueError("h264: chroma vertical without top MB")
        p[:] = top[None, :]
    elif mode == 3:
        if top is None or left is None:
            raise ValueError("h264: chroma plane without full neighbors")
        tl = int(plane[y - 1, x - 1])
        hh = sum((i + 1) * (int(top[4 + i]) - (int(top[2 - i]) if 2 - i >= 0
                            else tl)) for i in range(4))
        vv = sum((i + 1) * (int(left[4 + i]) - (int(left[2 - i]) if 2 - i >= 0
                            else tl)) for i in range(4))
        a = 16 * (int(left[7]) + int(top[7]))
        b = (17 * hh + 16) >> 5
        c = (17 * vv + 16) >> 5
        d = np.arange(8, dtype=np.int64) - 3
        p = (a + 16 + b * d[None, :] + c * d[:, None]) >> 5
        np.minimum(p, 255, out=p)
        np.maximum(p, 0, out=p)
    else:
        raise ValueError(f"h264: invalid chroma pred mode {mode}")
    return p


# ---------------------------------------------------------------------------
# macroblock layer (§7.3.5) — parse -> mb spec -> shared reconstruction
# ---------------------------------------------------------------------------

# Table 9-4, intra column: codeNum -> coded_block_pattern
_CBP_INTRA = [
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41,
]
_CBP_INTRA_INV = {cbp: i for i, cbp in enumerate(_CBP_INTRA)}


class _FrameState:
    """Reconstruction + entropy-context state shared by decoder and
    encoder twin: pixel planes, per-4x4 nonzero-coefficient grids (nC
    context, §9.2.1), the intra-4x4 mode grid (mode prediction,
    §8.3.1.1) and the decoded-block grid (sample availability)."""

    def __init__(self, wmb: int, hmb: int):
        self.wmb, self.hmb = wmb, hmb
        self.y = np.zeros((hmb * 16, wmb * 16), dtype=np.int64)
        self.cb = np.zeros((hmb * 8, wmb * 8), dtype=np.int64)
        self.cr = np.zeros((hmb * 8, wmb * 8), dtype=np.int64)
        self.nzl = np.full((hmb * 4, wmb * 4), -1, dtype=np.int64)
        self.nzcb = np.full((hmb * 2, wmb * 2), -1, dtype=np.int64)
        self.nzcr = np.full((hmb * 2, wmb * 2), -1, dtype=np.int64)
        self.mode4 = np.full((hmb * 4, wmb * 4), -1, dtype=np.int64)
        self.done4 = np.zeros((hmb * 4, wmb * 4), dtype=bool)


def _nc(grid: np.ndarray, bx: int, by: int) -> int:
    """§9.2.1 nC from left/up neighbor total-coefficient counts; -1 in
    the grid means unavailable (outside picture / not yet decoded)."""
    na = int(grid[by, bx - 1]) if bx > 0 else -1
    nb = int(grid[by - 1, bx]) if by > 0 else -1
    if na >= 0 and nb >= 0:
        return (na + nb + 1) >> 1
    if na >= 0:
        return na
    if nb >= 0:
        return nb
    return 0


def _pred_mode4(st: _FrameState, gbx: int, gby: int) -> int:
    """§8.3.1.1 predIntra4x4PredMode: DC if either neighbor block is
    unavailable, else min of the neighbor modes (non-I4x4 intra MBs
    contribute 2)."""
    ma = int(st.mode4[gby, gbx - 1]) if gbx > 0 else -1
    mb = int(st.mode4[gby - 1, gbx]) if gby > 0 else -1
    if ma < 0 or mb < 0:
        return 2
    return min(ma, mb)


def _parse_mb(r: _Bits, st: _FrameState, mbx: int, mby: int, qp: int):
    """One macroblock_layer() -> (mb spec dict, updated QPy); updates
    the entropy-context grids as it parses."""
    bx0, by0 = mbx * 4, mby * 4
    cx0, cy0 = mbx * 2, mby * 2
    mb_type = r.ue()
    if mb_type > 25:
        raise ValueError(f"h264: invalid I-slice mb_type {mb_type}")
    if mb_type == 25:  # I_PCM
        r.align()
        start = r.pos >> 3
        raw = np.frombuffer(r.data, dtype=np.uint8, count=-1)[start : start + 384]
        if raw.size < 384:
            raise ValueError("h264: bitstream exhausted in PCM samples")
        r.pos += 384 * 8
        r.acc = 0  # moving pos invalidates the cached bit window
        r.nacc = 0
        y = raw[:256].astype(np.int64).reshape(16, 16)
        cb = raw[256:320].astype(np.int64).reshape(8, 8)
        cr = raw[320:384].astype(np.int64).reshape(8, 8)
        st.nzl[by0 : by0 + 4, bx0 : bx0 + 4] = 16
        st.nzcb[cy0 : cy0 + 2, cx0 : cx0 + 2] = 16
        st.nzcr[cy0 : cy0 + 2, cx0 : cx0 + 2] = 16
        st.mode4[by0 : by0 + 4, bx0 : bx0 + 4] = 2
        return {"type": "pcm", "y": y, "cb": cb, "cr": cr}, qp

    if mb_type == 0:  # I_4x4
        modes = []
        for i in range(16):
            bx, by = _BLK4[i]
            gbx, gby = bx0 + bx, by0 + by
            pred = _pred_mode4(st, gbx, gby)
            if r.u(1):  # prev_intra4x4_pred_mode_flag
                mode = pred
            else:
                rem = r.u(3)
                mode = rem if rem < pred else rem + 1
            modes.append(mode)
            st.mode4[gby, gbx] = mode
        chroma_mode = r.ue()
        if chroma_mode > 3:
            raise ValueError("h264: invalid intra_chroma_pred_mode")
        code = r.ue()
        if code >= 48:
            raise ValueError("h264: invalid coded_block_pattern code")
        cbp = _CBP_INTRA[code]
        if cbp:
            qp = (qp + r.se() + 52) % 52
        coeffs = []
        for i in range(16):
            bx, by = _BLK4[i]
            gbx, gby = bx0 + bx, by0 + by
            s8 = (by >> 1) * 2 + (bx >> 1)
            if cbp & (1 << s8):
                blk = _residual_block_cavlc(r, _nc(st.nzl, gbx, gby), 16)
                st.nzl[gby, gbx] = len(blk) - blk.count(0)
            else:
                blk = [0] * 16
                st.nzl[gby, gbx] = 0
            coeffs.append(blk)
        spec = {"type": "i4", "modes": modes, "chroma_mode": chroma_mode,
                "coeffs": coeffs}
    else:  # I_16x16
        m = mb_type - 1
        cbp = (15 if m >= 12 else 0) | (((m // 4) % 3) << 4)
        spec = {"type": "i16", "pred": m % 4}
        st.mode4[by0 : by0 + 4, bx0 : bx0 + 4] = 2
        chroma_mode = r.ue()
        if chroma_mode > 3:
            raise ValueError("h264: invalid intra_chroma_pred_mode")
        spec["chroma_mode"] = chroma_mode
        qp = (qp + r.se() + 52) % 52
        spec["dc"] = _residual_block_cavlc(r, _nc(st.nzl, bx0, by0), 16)
        ac = []
        for i in range(16):
            bx, by = _BLK4[i]
            gbx, gby = bx0 + bx, by0 + by
            if cbp & 15:
                blk = _residual_block_cavlc(r, _nc(st.nzl, gbx, gby), 15)
                st.nzl[gby, gbx] = len(blk) - blk.count(0)
            else:
                blk = [0] * 15
                st.nzl[gby, gbx] = 0
            ac.append(blk)
        spec["ac"] = ac

    # chroma residual, shared by I_4x4 / I_16x16
    cbp_c = cbp >> 4
    if cbp_c > 2:
        raise ValueError("h264: invalid chroma coded_block_pattern")
    for key_dc, key_ac, grid in (("cb_dc", "cb_ac", st.nzcb),
                                 ("cr_dc", "cr_ac", st.nzcr)):
        spec[key_dc] = (_residual_block_cavlc(r, -1, 4) if cbp_c
                        else [0, 0, 0, 0])
    for key_ac, grid in (("cb_ac", st.nzcb), ("cr_ac", st.nzcr)):
        acs = []
        for bi in range(4):
            gbx, gby = cx0 + bi % 2, cy0 + bi // 2
            if cbp_c == 2:
                blk = _residual_block_cavlc(r, _nc(grid, gbx, gby), 15)
                grid[gby, gbx] = len(blk) - blk.count(0)
            else:
                blk = [0] * 15
                grid[gby, gbx] = 0
            acs.append(blk)
        spec[key_ac] = acs
    return spec, qp


def _recon_mb(st: _FrameState, mbx: int, mby: int, spec: dict, qp: int,
              chroma_qp_off: int) -> None:
    """Shared exact reconstruction of one mb spec (§8.3 prediction +
    §8.5 transforms) into the frame state."""
    x0, y0 = mbx * 16, mby * 16
    cx0, cy0 = mbx * 8, mby * 8
    if spec["type"] == "pcm":
        st.y[y0 : y0 + 16, x0 : x0 + 16] = spec["y"]
        st.cb[cy0 : cy0 + 8, cx0 : cx0 + 8] = spec["cb"]
        st.cr[cy0 : cy0 + 8, cx0 : cx0 + 8] = spec["cr"]
        st.done4[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = True
        return
    avail_l, avail_u = mbx > 0, mby > 0
    qpc = _chroma_qp(qp, chroma_qp_off)
    if spec["type"] == "i16":
        pred = _pred16x16(st.y, x0, y0, spec["pred"], avail_l, avail_u)
        dcmat = _luma_dc(spec.get("dc") or [0] * 16, qp)
        ac = spec.get("ac")
        if ac is None or not any(any(b) for b in ac):
            # DC-only blocks: each residual is the constant
            # (dc + 32) >> 6 (== _block_residual with no AC, incl. the
            # dc == 0 -> 0 case) — add all 16 at once
            out = pred
            # add each block's constant via the (blkrow, row, blkcol,
            # col) view of the C-contiguous 16x16 (every _pred16x16
            # output is freshly allocated) — no repeat() allocations
            v = out.reshape(4, 4, 4, 4)
            v += ((dcmat + 32) >> 6)[:, None, :, None]
        else:
            out = pred
            for i in range(16):
                bx, by = _BLK4[i]
                res = _block_residual(ac[i], int(dcmat[by, bx]), qp)
                if not (type(res) is int and res == 0):  # scalar-0 skip
                    out[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] += res
        np.minimum(out, 255, out=out)
        np.maximum(out, 0, out=out)
        st.y[y0 : y0 + 16, x0 : x0 + 16] = out
        st.done4[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = True
    else:  # i4
        modes = spec["modes"]
        coeffs = spec.get("coeffs")
        for i in range(16):
            bx, by = _BLK4[i]
            gx, gy = x0 + bx * 4, y0 + by * 4
            gbx, gby = mbx * 4 + bx, mby * 4 + by
            al = gbx > 0 and bool(st.done4[gby, gbx - 1])
            au = gby > 0 and bool(st.done4[gby - 1, gbx])
            aul = gbx > 0 and gby > 0 and bool(st.done4[gby - 1, gbx - 1])
            aur = (gby > 0 and gbx + 1 < st.wmb * 4
                   and bool(st.done4[gby - 1, gbx + 1]))
            pred = _pred4x4(st.y, gx, gy, modes[i], al, au, aul, aur)
            cs = coeffs[i] if coeffs else None
            if cs and any(cs):
                pred = pred + _itrans4x4(_dequant4x4(cs, qp))
            np.minimum(pred, 255, out=pred)
            np.maximum(pred, 0, out=pred)
            st.y[gy : gy + 4, gx : gx + 4] = pred
            st.done4[gby, gbx] = True
    for plane, kd, ka in ((st.cb, "cb_dc", "cb_ac"),
                          (st.cr, "cr_dc", "cr_ac")):
        out = _pred_chroma(plane, cx0, cy0, spec["chroma_mode"],
                           avail_l, avail_u)
        dcv = _chroma_dc_vals(spec.get(kd) or (0, 0, 0, 0), qpc)
        acs = spec.get(ka)
        if acs is None or not any(any(b) for b in acs):
            r00, r01, r10, r11 = ((dcv[0] + 32) >> 6, (dcv[1] + 32) >> 6,
                                  (dcv[2] + 32) >> 6, (dcv[3] + 32) >> 6)
            if r00 or r01 or r10 or r11:
                out[:4, :4] += r00
                out[:4, 4:] += r01
                out[4:, :4] += r10
                out[4:, 4:] += r11
        else:
            for bi in range(4):
                bx, by = bi % 2, bi // 2
                res = _block_residual(acs[bi], dcv[bi], qpc)
                if not (type(res) is int and res == 0):  # scalar-0 skip
                    out[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] += res
        np.minimum(out, 255, out=out)
        np.maximum(out, 0, out=out)
        plane[cy0 : cy0 + 8, cx0 : cx0 + 8] = out


# ---------------------------------------------------------------------------
# frame decode
# ---------------------------------------------------------------------------


def decode_idr_frame(
    payload: bytes,
    *,
    sps_bytes: bytes | None = None,
    pps_bytes: bytes | None = None,
    nal_length_size: int | None = None,
) -> dict:
    """Decode one IDR access unit to exact YCbCr 4:2:0 planes.

    ``payload`` is an Annex-B byte stream (SPS/PPS may be in-band) or,
    with ``nal_length_size``, an avcC-format MP4 sample whose SPS/PPS
    come from the container via ``sps_bytes``/``pps_bytes``.  Returns
    ``{"width", "height", "y", "cb", "cr", "qp"}`` with uint8 numpy
    planes (cropped per the SPS).  Raises ValueError on structural
    corruption and NotImplementedError on out-of-scope coding tools
    (CABAC, inter slices, deblocking, interlace, high profiles)."""
    if nal_length_size:
        nals = split_length_prefixed(payload, nal_length_size)
    else:
        nals = split_annexb(payload)
    sps = _parse_ps_cached(7, sps_bytes) if sps_bytes else None
    pps = _parse_ps_cached(8, pps_bytes) if pps_bytes else None
    slice_nal = None
    for nal in nals:
        if len(nal) < 2:
            raise ValueError("h264: runt NAL unit")
        t = nal[0] & 0x1F
        if t == 7:
            sps = _parse_ps_cached(7, nal)
        elif t == 8:
            pps = _parse_ps_cached(8, nal)
        elif t == 5:
            slice_nal = nal
            break
        elif t == 1:
            raise NotImplementedError(
                "h264: non-IDR slice (inter prediction) not supported"
            )
        # SEI / AUD / filler: skip
    if slice_nal is None:
        raise ValueError("h264: no IDR slice in access unit")
    if sps is None or pps is None:
        raise ValueError("h264: missing SPS/PPS for IDR decode")

    r = _Bits(_strip_ep(slice_nal))
    if r.u(1) != 0:
        raise ValueError("h264: forbidden_zero_bit set")
    r.u(2)
    nt = r.u(5)
    hdr = _parse_slice_header(r, nt, sps, pps)
    st = _FrameState(sps["width_mbs"], sps["height_mbs"])
    qp = hdr["qp"]
    if not 0 <= qp <= 51:
        raise ValueError("h264: slice QP out of range")
    for mby in range(sps["height_mbs"]):
        for mbx in range(sps["width_mbs"]):
            spec, qp = _parse_mb(r, st, mbx, mby, qp)
            _recon_mb(st, mbx, mby, spec, qp, pps["chroma_qp_offset"])
    cl, crr, ct, cbm = sps["crop"]
    wl, hl = st.wmb * 16, st.hmb * 16
    y = st.y[2 * ct : hl - 2 * cbm, 2 * cl : wl - 2 * crr]
    cb = st.cb[ct : hl // 2 - cbm, cl : wl // 2 - crr]
    cr = st.cr[ct : hl // 2 - cbm, cl : wl // 2 - crr]
    if y.size == 0:
        raise ValueError("h264: cropping removes the whole frame")
    return {
        "width": y.shape[1],
        "height": y.shape[0],
        "y": y.astype(np.uint8),
        "cb": cb.astype(np.uint8),
        "cr": cr.astype(np.uint8),
        "qp": qp,
    }


# ---------------------------------------------------------------------------
# encoder twin (fixtures / deterministic synthetic corpora)
# ---------------------------------------------------------------------------


class _RbspW(_BitW):
    """RBSP writer: ue/se on top of the MSB-first bit writer."""

    def ue(self, v: int) -> None:
        if v < 0:
            raise ValueError("ue(v) needs v >= 0")
        n = (v + 1).bit_length()
        self.write(0, n - 1)
        self.write(v + 1, n)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def nal(self, ref_idc: int, nal_type: int) -> bytes:
        """Close as a NAL: rbsp_stop_one_bit + align, EP-insert, header."""
        self.write(1, 1)
        self.align()
        hdr = bytes([(ref_idc << 5) | nal_type])
        return b"\x00\x00\x00\x01" + hdr + _insert_ep(self.bytes())


def _normalize_plan(plan: list, wmb: int, hmb: int) -> list[dict]:
    if len(plan) != wmb * hmb:
        raise ValueError("h264 twin: plan length must equal width*height MBs")
    out = []
    for spec in plan:
        t = spec.get("type")
        if t == "pcm":
            s = {"type": "pcm",
                 "y": np.asarray(spec["y"], dtype=np.int64),
                 "cb": np.asarray(spec["cb"], dtype=np.int64),
                 "cr": np.asarray(spec["cr"], dtype=np.int64)}
            for k, shape in (("y", (16, 16)), ("cb", (8, 8)), ("cr", (8, 8))):
                if s[k].shape != shape or s[k].min() < 0 or s[k].max() > 255:
                    raise ValueError(f"h264 twin: bad PCM {k} samples")
        elif t == "i16":
            s = {"type": "i16", "pred": int(spec.get("pred", 2)),
                 "chroma_mode": int(spec.get("chroma_mode", 0)),
                 "dc": list(spec.get("dc") or [0] * 16),
                 "ac": spec.get("ac"),
                 "cb_dc": list(spec.get("cb_dc") or [0] * 4),
                 "cr_dc": list(spec.get("cr_dc") or [0] * 4),
                 "cb_ac": spec.get("cb_ac"), "cr_ac": spec.get("cr_ac")}
            if len(s["dc"]) != 16:
                raise ValueError("h264 twin: i16 dc needs 16 levels")
        elif t == "i4":
            modes = spec.get("modes")
            if isinstance(modes, int):
                modes = [modes] * 16
            s = {"type": "i4", "modes": [int(m) for m in modes],
                 "chroma_mode": int(spec.get("chroma_mode", 0)),
                 "coeffs": spec.get("coeffs"),
                 "cb_dc": list(spec.get("cb_dc") or [0] * 4),
                 "cr_dc": list(spec.get("cr_dc") or [0] * 4),
                 "cb_ac": spec.get("cb_ac"), "cr_ac": spec.get("cr_ac")}
            if len(s["modes"]) != 16:
                raise ValueError("h264 twin: i4 needs 16 modes")
        else:
            raise ValueError(f"h264 twin: unknown mb type {t!r}")
        for k, n in (("ac", 15), ("cb_ac", 15), ("cr_ac", 15), ("coeffs", 16)):
            if k in s and s[k] is not None:
                s[k] = [list(b) for b in s[k]]
                want = 16 if k in ("ac", "coeffs") else 4
                if len(s[k]) != want or any(len(b) != n for b in s[k]):
                    raise ValueError(f"h264 twin: {k} needs {want} x {n} levels")
        out.append(s)
    return out


def _mb_cbp(spec: dict) -> int:
    """coded_block_pattern implied by a (normalized) i4/i16 spec."""
    cbp = 0
    if spec["type"] == "i4" and spec.get("coeffs"):
        for i in range(16):
            bx, by = _BLK4[i]
            if any(spec["coeffs"][i]):
                cbp |= 1 << ((by >> 1) * 2 + (bx >> 1))
    if spec["type"] == "i16":
        if spec.get("ac") and any(any(b) for b in spec["ac"]):
            cbp |= 15
    ac_nz = any(any(b) for b in (spec.get("cb_ac") or []) + (spec.get("cr_ac") or []))
    dc_nz = any(spec["cb_dc"]) or any(spec["cr_dc"])
    if ac_nz:
        cbp |= 2 << 4
    elif dc_nz:
        cbp |= 1 << 4
    return cbp


def _encode_mb(w: _RbspW, st: _FrameState, mbx: int, mby: int,
               spec: dict) -> None:
    """Twin of ``_parse_mb``: one macroblock_layer() onto ``w``,
    updating the same entropy-context grids."""
    bx0, by0 = mbx * 4, mby * 4
    cx0, cy0 = mbx * 2, mby * 2
    if spec["type"] == "pcm":
        w.ue(25)
        w.align()
        # samples are validated 0..255 by _normalize_plan; after align()
        # each 8-bit write IS the byte, so emit all 384 at once
        w.write_bytes(spec["y"].reshape(-1).astype(np.uint8).tobytes())
        w.write_bytes(spec["cb"].reshape(-1).astype(np.uint8).tobytes())
        w.write_bytes(spec["cr"].reshape(-1).astype(np.uint8).tobytes())
        st.nzl[by0 : by0 + 4, bx0 : bx0 + 4] = 16
        st.nzcb[cy0 : cy0 + 2, cx0 : cx0 + 2] = 16
        st.nzcr[cy0 : cy0 + 2, cx0 : cx0 + 2] = 16
        st.mode4[by0 : by0 + 4, bx0 : bx0 + 4] = 2
        return
    cbp = _mb_cbp(spec)
    cbp_c = cbp >> 4
    if spec["type"] == "i4":
        w.ue(0)
        for i in range(16):
            bx, by = _BLK4[i]
            gbx, gby = bx0 + bx, by0 + by
            mode = spec["modes"][i]
            if not 0 <= mode <= 8:
                raise ValueError(f"h264 twin: invalid intra4x4 mode {mode}")
            pred = _pred_mode4(st, gbx, gby)
            if mode == pred:
                w.write(1, 1)
            else:
                w.write(0, 1)
                w.write(mode if mode < pred else mode - 1, 3)
            st.mode4[gby, gbx] = mode
        w.ue(spec["chroma_mode"])
        w.ue(_CBP_INTRA_INV[cbp & 0x3F])
        if cbp:
            w.se(0)  # mb_qp_delta
        for i in range(16):
            bx, by = _BLK4[i]
            gbx, gby = bx0 + bx, by0 + by
            s8 = (by >> 1) * 2 + (bx >> 1)
            blk = spec["coeffs"][i] if spec.get("coeffs") else [0] * 16
            if cbp & (1 << s8):
                total = _encode_residual_block(w, blk, _nc(st.nzl, gbx, gby), 16)
                st.nzl[gby, gbx] = total
            else:
                st.nzl[gby, gbx] = 0
    else:  # i16
        pred = spec["pred"]
        if not 0 <= pred <= 3:
            raise ValueError("h264 twin: invalid intra16x16 mode")
        mb_type = 1 + pred + 4 * cbp_c + (12 if cbp & 15 else 0)
        w.ue(mb_type)
        st.mode4[by0 : by0 + 4, bx0 : bx0 + 4] = 2
        w.ue(spec["chroma_mode"])
        w.se(0)  # mb_qp_delta
        _encode_residual_block(w, spec["dc"], _nc(st.nzl, bx0, by0), 16)
        for i in range(16):
            bx, by = _BLK4[i]
            gbx, gby = bx0 + bx, by0 + by
            blk = spec["ac"][i] if spec.get("ac") else [0] * 15
            if cbp & 15:
                total = _encode_residual_block(w, blk, _nc(st.nzl, gbx, gby), 15)
                st.nzl[gby, gbx] = total
            else:
                st.nzl[gby, gbx] = 0
    if cbp_c:
        _encode_residual_block(w, spec["cb_dc"], -1, 4)
        _encode_residual_block(w, spec["cr_dc"], -1, 4)
    for key, grid in (("cb_ac", st.nzcb), ("cr_ac", st.nzcr)):
        for bi in range(4):
            gbx, gby = cx0 + bi % 2, cy0 + bi // 2
            blk = spec[key][bi] if spec.get(key) else [0] * 15
            if cbp_c == 2:
                total = _encode_residual_block(w, blk, _nc(grid, gbx, gby), 15)
                grid[gby, gbx] = total
            else:
                grid[gby, gbx] = 0


def encode_idr_stream(
    plan: list, width_mbs: int, height_mbs: int, qp: int = 28
) -> bytes:
    """Spec-valid Annex-B access unit (SPS + PPS + one IDR slice) from
    a per-MB plan (see ``_normalize_plan`` for the spec shapes).  The
    twin always codes baseline profile, POC type 2, a single I slice,
    deblocking disabled — exactly the subset ``decode_idr_frame``
    accepts, so round-trips are bit-exact on pixels."""
    if not 0 <= qp <= 51:
        raise ValueError("h264 twin: qp must be 0..51")
    plan = _normalize_plan(plan, width_mbs, height_mbs)

    w = _RbspW()  # SPS
    w.write(66, 8)   # profile_idc: baseline
    w.write(0xC0, 8)  # constraint_set0/1 + zeros
    w.write(30, 8)   # level 3.0
    w.ue(0)          # sps_id
    w.ue(0)          # log2_max_frame_num_minus4
    w.ue(2)          # pic_order_cnt_type 2
    w.ue(0)          # max_num_ref_frames
    w.write(0, 1)    # gaps_in_frame_num_value_allowed
    w.ue(width_mbs - 1)
    w.ue(height_mbs - 1)
    w.write(1, 1)    # frame_mbs_only
    w.write(0, 1)    # direct_8x8_inference
    w.write(0, 1)    # frame_cropping
    w.write(0, 1)    # vui
    sps = w.nal(3, 7)

    w = _RbspW()  # PPS
    w.ue(0)          # pps_id
    w.ue(0)          # sps_id
    w.write(0, 1)    # entropy_coding_mode: CAVLC
    w.write(0, 1)    # bottom_field_pic_order_in_frame_present
    w.ue(0)          # num_slice_groups_minus1
    w.ue(0)          # num_ref_idx_l0_default_active_minus1
    w.ue(0)          # num_ref_idx_l1_default_active_minus1
    w.write(0, 1)    # weighted_pred
    w.write(0, 2)    # weighted_bipred_idc
    w.se(qp - 26)    # pic_init_qp_minus26
    w.se(0)          # pic_init_qs_minus26
    w.se(0)          # chroma_qp_index_offset
    w.write(1, 1)    # deblocking_filter_control_present
    w.write(0, 1)    # constrained_intra_pred
    w.write(0, 1)    # redundant_pic_cnt_present
    pps = w.nal(3, 8)

    w = _RbspW()  # IDR slice
    w.ue(0)          # first_mb_in_slice
    w.ue(7)          # slice_type: I (all slices in picture)
    w.ue(0)          # pps_id
    w.write(0, 4)    # frame_num
    w.ue(0)          # idr_pic_id
    w.write(0, 1)    # no_output_of_prior_pics
    w.write(0, 1)    # long_term_reference
    w.se(0)          # slice_qp_delta
    w.ue(1)          # disable_deblocking_filter_idc
    st = _FrameState(width_mbs, height_mbs)
    for mby in range(height_mbs):
        for mbx in range(width_mbs):
            _encode_mb(w, st, mbx, mby, plan[mby * width_mbs + mbx])
    return sps + pps + w.nal(3, 5)


def reconstruct_plan(
    plan: list, width_mbs: int, height_mbs: int, qp: int = 28
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact pixels ``decode_idr_frame(encode_idr_stream(plan))`` must
    produce, computed through the shared §8.3/§8.5 primitives without
    touching the bitstream layer."""
    plan = _normalize_plan(plan, width_mbs, height_mbs)
    st = _FrameState(width_mbs, height_mbs)
    for mby in range(height_mbs):
        for mbx in range(width_mbs):
            _recon_mb(st, mbx, mby, plan[mby * width_mbs + mbx], qp, 0)
    return (st.y.astype(np.uint8), st.cb.astype(np.uint8),
            st.cr.astype(np.uint8))
