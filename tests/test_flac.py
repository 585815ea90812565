"""FLAC decode (operators/flac.py): round-trip exactness, every
subframe type and channel assignment, Rice escape codes, CRC
verification, fuzz exception contract, Spark audio-path integration.

Reference parity: N/A — engine extension like the other codecs."""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pgvecto_rs_spark.operators.flac import (
    _BitW,
    _crc8,
    _crc16,
    _utf8_num,
    decode_flac,
    encode_flac,
    is_flac,
)


def _rng_samples(n, lim, seed=0, ch=1):
    rng = np.random.default_rng(seed)
    s = rng.integers(-lim, lim, (n, ch)).astype(np.int32)
    return s if ch > 1 else s[:, 0]


class TestRoundTrip:
    def test_fixed_mono_16(self):
        s = (np.cumsum(_rng_samples(3000, 60, 1)) % 20000 - 10000).astype(np.int32)
        b = encode_flac(s, rate=8000, bps=16, blocksize=512, mode="fixed")
        assert is_flac(b)
        out, rate, bps = decode_flac(b)
        assert (rate, bps) == (8000, 16)
        assert np.array_equal(out[:, 0], s)
        # FIXED + Rice really compresses a smooth signal
        assert len(b) < 2 * len(s)

    def test_verbatim_stereo(self):
        st2 = _rng_samples(1000, 30000, 2, ch=2)
        b = encode_flac(st2, rate=44100, bps=16, blocksize=256, mode="verbatim")
        out, rate, _ = decode_flac(b)
        assert rate == 44100 and np.array_equal(out, st2)

    def test_constant_and_8bit(self):
        c = np.full(700, -123, dtype=np.int32)
        out, _, _ = decode_flac(encode_flac(c, blocksize=512))
        assert np.array_equal(out[:, 0], c)
        s8 = _rng_samples(500, 128, 3)
        out, _, bps = decode_flac(encode_flac(s8, bps=8, blocksize=128))
        assert bps == 8 and np.array_equal(out[:, 0], s8)

    def test_24bit(self):
        s = _rng_samples(400, 1 << 23, 4)
        out, _, bps = decode_flac(encode_flac(s, bps=24, blocksize=256))
        assert bps == 24 and np.array_equal(out[:, 0], s)

    def test_short_tail_block(self):
        s = _rng_samples(130, 1000, 5)  # 2 full 64-blocks + 2-sample tail
        out, _, _ = decode_flac(encode_flac(s, blocksize=64))
        assert np.array_equal(out[:, 0], s)

    def test_decorr_stereo_roundtrip(self):
        """stereo_mode='decorr' cycles left/side → right/side →
        mid/side → independent per frame; blocksize 32 over 160
        samples forces 5 frames so every assignment is decoded at
        least once, bit-exactly."""
        st2 = _rng_samples(160, 20000, 7, ch=2)
        for mode in ("fixed", "verbatim", "lpc"):
            b = encode_flac(
                st2, rate=16000, bps=16, blocksize=32,
                mode=mode, stereo_mode="decorr",
            )
            out, rate, _ = decode_flac(b)
            assert rate == 16000 and np.array_equal(out, st2), mode

    def test_decorr_compresses_correlated_stereo(self):
        """On near-identical channels the side subframe is tiny — the
        decorrelated stream must beat independent coding (proves the
        encoder really emits side channels, not independent frames)."""
        base = np.cumsum(_rng_samples(2048, 50, 8)).astype(np.int32)
        noise = _rng_samples(2048, 3, 9)
        st2 = np.stack([base, base + noise], axis=1).astype(np.int32)
        ind = encode_flac(st2, blocksize=512, stereo_mode="independent")
        dec = encode_flac(st2, blocksize=512, stereo_mode="decorr")
        assert len(dec) < len(ind)

    def test_lpc_mode_emits_lpc_subframes(self):
        """mode='lpc' writes subframe type 32+(order-1) (0b100001 for
        order 2) — check the bitstream really carries it rather than
        falling back to FIXED, and that decode is exact."""
        s = (np.cumsum(_rng_samples(800, 40, 10)) % 8000 - 4000).astype(np.int32)
        b = encode_flac(s, bps=16, blocksize=256, mode="lpc")
        fx = encode_flac(s, bps=16, blocksize=256, mode="fixed")
        assert b != fx  # different subframe coding on a non-flat signal
        out, _, _ = decode_flac(b)
        assert np.array_equal(out[:, 0], s)

    def test_decorr_validation(self):
        mono = _rng_samples(64, 100, 11)
        with pytest.raises(ValueError, match="stereo_mode"):
            encode_flac(mono, stereo_mode="decorr")
        st2 = _rng_samples(64, 100, 12, ch=2)
        with pytest.raises(ValueError, match="stereo_mode"):
            encode_flac(st2, stereo_mode="bogus")

    @settings(max_examples=30, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(
        n=st.integers(min_value=1, max_value=600),
        seed=st.integers(min_value=0, max_value=2**31),
        bps=st.sampled_from([8, 16, 24]),
        bs=st.sampled_from([32, 64, 192, 256]),
        mode=st.sampled_from(["fixed", "verbatim", "lpc"]),
        ch=st.integers(min_value=1, max_value=3),
    )
    def test_property_round_trip(self, n, seed, bps, bs, mode, ch):
        lim = 1 << (bps - 1)
        s = _rng_samples(n, lim, seed, ch=ch)
        sm = "decorr" if ch == 2 else "independent"
        out, rate, got_bps = decode_flac(
            encode_flac(s, rate=32000, bps=bps, blocksize=bs, mode=mode,
                        stereo_mode=sm)
        )
        assert rate == 32000 and got_bps == bps
        want = s if ch > 1 else s[:, None]
        assert np.array_equal(out, want)


def _stream_head(nch, bps, total, rate=8000, blocksize=4096):
    w = _BitW()
    w.write(blocksize, 16)
    w.write(blocksize, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(rate, 20)
    w.write(nch - 1, 3)
    w.write(bps - 1, 5)
    w.write(total, 36)
    body = w.bytes() + bytes(16)
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _frame(nch_code, subframes, nb, bps_code=4, frame_no=0):
    """Hand-build one frame: subframes = list of (writer_fn) callables
    taking a _BitW."""
    w = _BitW()
    w.write(0b11111111111110, 14)
    w.write(0, 2)
    w.write(7, 4)  # 16-bit blocksize-1 follows header
    w.write(0, 4)
    w.write(nch_code, 4)
    w.write(bps_code, 3)
    w.write(0, 1)
    for byte in _utf8_num(frame_no):
        w.write(byte, 8)
    w.write(nb - 1, 16)
    w.align()
    hdr = w.bytes() + bytes([_crc8(w.bytes())])
    w = _BitW()
    for fn in subframes:
        fn(w)
    w.align()
    body = w.bytes()
    return hdr + body + struct.pack(">H", _crc16(hdr + body))


def _verbatim(vals, eff):
    def fn(w):
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in vals:
            w.write(int(v) & ((1 << eff) - 1), eff)

    return fn


class TestHandBuiltStreams:
    """Hand-built bitstreams pin the exact bit layout independently of
    the encoder twin (which since r9 also emits stereo decorrelation
    and LPC — these fixtures stay as the twin-free ground truth, plus
    paths the twin still never writes: Rice escape partitions, wasted
    bits)."""

    def test_left_side_right_side_mid_side(self):
        rng = np.random.default_rng(11)
        left = rng.integers(-20000, 20000, 64).astype(np.int64)
        right = rng.integers(-20000, 20000, 64).astype(np.int64)
        side = left - right
        mid = (left + right) >> 1
        head = _stream_head(2, 16, 64)
        for code, (c0, e0), (c1, e1) in [
            (8, (left, 16), (side, 17)),    # left/side
            (9, (side, 17), (right, 16)),   # right/side
            (10, (mid, 16), (side, 17)),    # mid/side
        ]:
            b = head + _frame(code, [_verbatim(c0, e0), _verbatim(c1, e1)], 64)
            out, _, _ = decode_flac(b)
            assert np.array_equal(out[:, 0], left), code
            assert np.array_equal(out[:, 1], right), code

    def test_lpc_subframe(self):
        """Order-2 LPC: out[i] = resid[i] + ((c0*out[i-1] + c1*out[i-2])
        >> shift), hand-coded bit-exactly."""
        warm = [100, -50]
        coefs = [1638, -819]  # ~0.4, -0.2 at shift 12
        shift = 12
        resid = [3, -4, 5, 0, -1, 2, 7, -8]
        n = len(warm) + len(resid)

        def lpc(w):
            w.write(0, 1)
            w.write(32 + 1, 6)  # LPC order 2 (type 0b100000 | (order-1))
            w.write(0, 1)
            for v in warm:
                w.write(v & 0xFFFF, 16)
            w.write(11, 4)  # precision-1 -> 12 bits
            w.write(shift, 5)
            for c in coefs:
                w.write(c & 0xFFF, 12)
            w.write(0, 2)  # rice method 0
            w.write(0, 4)  # 1 partition
            w.write(3, 4)  # k=3
            for v in resid:
                u = (abs(v) * 2 - 1) if v < 0 else v * 2
                for _ in range(u >> 3):
                    w.write(0, 1)
                w.write(1, 1)
                w.write(u & 7, 3)

        b = _stream_head(1, 16, n) + _frame(0, [lpc], n)
        out, _, _ = decode_flac(b)
        want = list(warm)
        for r in resid:
            acc = coefs[0] * want[-1] + coefs[1] * want[-2]
            want.append(r + (acc >> shift))
        assert out[:, 0].tolist() == want

    def test_rice_escape_partition(self):
        vals = [5, -3, 0, 12, -9, 1, 6, -2]

        def fixed0(w):
            w.write(0, 1)
            w.write(8, 6)  # FIXED order 0
            w.write(0, 1)
            w.write(0, 2)
            w.write(0, 4)
            w.write(15, 4)  # escape
            w.write(6, 5)   # 6-bit raw residuals
            for v in vals:
                w.write(v & 0x3F, 6)

        b = _stream_head(1, 16, 8) + _frame(0, [fixed0], 8)
        out, _, _ = decode_flac(b)
        assert out[:, 0].tolist() == vals

    def test_long_unary_run_spans_refill_windows(self):
        # one Rice quotient of 750 zero bits crosses ~12 of the bit
        # reader's 8-byte refill windows; the run must decode exactly
        vals = [3, 1500, -2, 0, 7, -1500, 4, 2]
        k = 2

        def fixed0(w):
            w.write(0, 1)
            w.write(8, 6)  # FIXED order 0
            w.write(0, 1)
            w.write(0, 2)  # rice method (4-bit params)
            w.write(0, 4)  # partition order 0
            w.write(k, 4)
            for v in vals:
                u = -2 * v - 1 if v < 0 else 2 * v  # zigzag
                w.write(1, (u >> k) + 1)  # q zeros then the stop bit
                w.write(u & ((1 << k) - 1), k)

        b = _stream_head(1, 16, 8) + _frame(0, [fixed0], 8)
        out, _, _ = decode_flac(b)
        assert out[:, 0].tolist() == vals

    def test_wasted_bits(self):
        vals = [4, -8, 12, 0]  # all multiples of 4 -> 2 wasted bits

        def verb(w):
            w.write(0, 1)
            w.write(1, 6)
            w.write(1, 1)   # wasted-bits flag
            w.write(0, 1)   # unary 2 -> "01": one zero then a one
            w.write(1, 1)
            for v in vals:
                w.write((v >> 2) & 0x3FFF, 14)  # eff = 16 - 2

        b = _stream_head(1, 16, 4) + _frame(0, [verb], 4)
        out, _, _ = decode_flac(b)
        assert out[:, 0].tolist() == vals

    def test_divergent_lpc_rejected_not_wrapped(self):
        """r8 advice: the LPC accumulator must use exact ints — a
        divergent predictor (corrupt stream that passes CRC) previously
        WRAPPED numpy int64 silently and returned wrong samples.  Now it
        must raise the documented ValueError once samples leave the
        valid 32-bit envelope."""
        # order-1 LPC with coefficient 8 at shift 0: out[i] = 8*out[i-1]
        # + resid -> blows past 2^35 (and 2^63) within ~12/21 samples
        n = 64

        def lpc(w):
            w.write(0, 1)
            w.write(32 + 0, 6)  # LPC order 1
            w.write(0, 1)
            w.write(9, 16)      # warm-up sample = 9
            w.write(13, 4)      # precision-1 -> 14 bits
            w.write(0, 5)       # shift 0
            w.write(8, 14)      # coefficient 8
            w.write(0, 2)       # rice method 0
            w.write(0, 4)       # 1 partition
            w.write(15, 4)      # escape
            w.write(0, 5)       # raw=0 -> all residuals zero
        b = _stream_head(1, 16, n) + _frame(0, [lpc], n)
        with pytest.raises(ValueError, match="overflow"):
            decode_flac(b)

    def test_crc_mismatch_rejected(self):
        s = _rng_samples(100, 1000, 6)
        b = bytearray(encode_flac(s, blocksize=64))
        b[-1] ^= 0xFF  # corrupt the final frame CRC
        with pytest.raises(ValueError, match="CRC"):
            decode_flac(bytes(b))


class TestFuzz:
    def test_fuzz_exception_contract(self):
        valid = encode_flac(
            _rng_samples(400, 8000, 7), rate=16000, blocksize=64
        )
        rng = random.Random(42)
        for trial in range(3000):
            mode = trial % 3
            if mode == 0:
                data = valid[:4] + bytes(
                    rng.randrange(256) for _ in range(rng.randrange(200))
                )
            elif mode == 1:
                b = bytearray(valid)
                for _ in range(rng.randrange(1, 8)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
                data = bytes(b)
            else:
                data = valid[: rng.randrange(1, len(valid))]
            try:
                decode_flac(data)
            except (ValueError, NotImplementedError):
                pass


class TestSparkIntegration:
    def test_audio_stats_flac_exact(self, spark):
        import pandas as pd

        from pgvecto_rs_spark.operators.multimodal import decode_audio_stats

        rows = []
        want = {}
        for did in range(5):
            n = 80 + did * 10
            i = np.arange(n, dtype=np.int64)
            s = ((did * 31 + i * i * 7 + i * 13) % 4001 - 2000).astype(np.int32)
            rows.append((did, encode_flac(s, rate=16000, blocksize=64)))
            want[did] = (
                n,
                int((s.astype(np.int64) ** 2).sum()),
                int(np.count_nonzero(s[:-1].astype(np.int64) * s[1:] < 0)),
            )
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["media_id", "payload"])
        )
        out = {r["media_id"]: r for r in decode_audio_stats(df).collect()}
        for did, (n, e, z) in want.items():
            r = out[did]
            assert (r["n_samples"], r["energy"], r["zero_crossings"]) == (n, e, z)
            assert r["sample_rate"] == 16000

    def test_sniffing(self, spark):
        import pandas as pd

        from pgvecto_rs_spark.operators.mp4 import encode_mp4
        from pgvecto_rs_spark.operators.multimodal import attach_media_metadata

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "media_id": [0, 1],
                    "payload": [
                        encode_flac(np.arange(10, dtype=np.int32)),
                        encode_mp4([b"xx"]),
                    ],
                }
            )
        )
        got = {
            r["media_id"]: r["sniffed_mime"]
            for r in attach_media_metadata(df).collect()
        }
        assert got == {0: "audio/flac", 1: "video/mp4"}
