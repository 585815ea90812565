"""H.264 baseline IDR decoder (operators/h264.py): layered checks —
transforms vs an independent spec-pseudocode transcription, NAL/EP
handling, encode->decode round-trip exactness over randomized plans,
the out-of-scope rejection contract, and byte-flip fuzz.

Reference parity: N/A — engine extension like the other codecs."""

from __future__ import annotations

import numpy as np
import pytest

from pgvecto_rs_spark.operators.h264 import (
    _BLK4,
    _ZIGZAG,
    _chroma_dc,
    _dequant4x4,
    _itrans4x4,
    _luma_dc,
    _insert_ep,
    _strip_ep,
    decode_idr_frame,
    encode_idr_stream,
    is_annexb,
    parse_pps,
    parse_sps,
    reconstruct_plan,
    split_annexb,
    split_length_prefixed,
)


def _rand_block(rng, n, density, lim):
    b = [0] * n
    for i in range(n):
        if rng.random() < density:
            v = int(rng.integers(1, lim))
            b[i] = v if rng.random() < 0.5 else -v
    return b


def _rand_mb(rng, mbx, mby):
    t = rng.choice(["pcm", "i16", "i4"])
    if t == "pcm":
        return {
            "type": "pcm",
            "y": rng.integers(0, 256, (16, 16)),
            "cb": rng.integers(0, 256, (8, 8)),
            "cr": rng.integers(0, 256, (8, 8)),
        }
    cm_ok = ([0] + ([1] if mbx > 0 else []) + ([2] if mby > 0 else [])
             + ([3] if mbx > 0 and mby > 0 else []))
    cm = int(rng.choice(cm_ok))
    chroma = {
        "cb_dc": _rand_block(rng, 4, 0.4, 8),
        "cr_dc": _rand_block(rng, 4, 0.4, 8),
        "cb_ac": [_rand_block(rng, 15, 0.2, 6) for _ in range(4)],
        "cr_ac": [_rand_block(rng, 15, 0.2, 6) for _ in range(4)],
    }
    if t == "i16":
        pm_ok = ([2] + ([1] if mbx > 0 else []) + ([0] if mby > 0 else [])
                 + ([3] if mbx > 0 and mby > 0 else []))
        return {"type": "i16", "pred": int(rng.choice(pm_ok)),
                "chroma_mode": cm, "dc": _rand_block(rng, 16, 0.4, 30),
                "ac": [_rand_block(rng, 15, 0.3, 10) for _ in range(16)],
                **chroma}
    modes = []
    for i in range(16):
        bx, by = _BLK4[i]
        gbx, gby = mbx * 4 + bx, mby * 4 + by
        ok = [2]
        if gby > 0:
            ok += [0, 3, 7]
        if gbx > 0:
            ok += [1, 8]
        if gbx > 0 and gby > 0:
            ok += [4, 5, 6]
        modes.append(int(rng.choice(ok)))
    return {"type": "i4", "modes": modes, "chroma_mode": cm,
            "coeffs": [_rand_block(rng, 16, 0.3, 12) for _ in range(16)],
            **chroma}


class TestTransforms:
    """§8.5 primitives vs independent transcriptions of the spec
    pseudocode (not the butterfly code under test)."""

    def test_core_transform_vs_spec_pseudocode(self):
        def spec_itrans(d):
            f = np.empty((4, 4), dtype=np.int64)
            for i in range(4):
                e0 = int(d[i, 0]) + int(d[i, 2])
                e1 = int(d[i, 0]) - int(d[i, 2])
                e2 = (int(d[i, 1]) >> 1) - int(d[i, 3])
                e3 = int(d[i, 1]) + (int(d[i, 3]) >> 1)
                f[i] = (e0 + e3, e1 + e2, e1 - e2, e0 - e3)
            h = np.empty((4, 4), dtype=np.int64)
            for j in range(4):
                g0 = int(f[0, j]) + int(f[2, j])
                g1 = int(f[0, j]) - int(f[2, j])
                g2 = (int(f[1, j]) >> 1) - int(f[3, j])
                g3 = int(f[1, j]) + (int(f[3, j]) >> 1)
                h[:, j] = (g0 + g3, g1 + g2, g1 - g2, g0 - g3)
            return (h + 32) >> 6

        rng = np.random.default_rng(7)
        for _ in range(200):
            qp = int(rng.integers(0, 52))
            scan = [int(v) for v in rng.integers(-2000, 2000, 16)]
            d = _dequant4x4(scan, qp)
            assert np.array_equal(spec_itrans(d), _itrans4x4(d))

    def test_dequant_flat_scaling(self):
        # §8.5.9/§8.5.12.1 with flat weight 16: d = c * normAdjust << qp/6
        v = {(0, 0): 10, (1, 1): 16, (0, 1): 13, (1, 0): 13}  # qp%6==0
        d = _dequant4x4([1] * 16, 12)  # qp 12: %6=0, //6=2
        for k, (i, j) in enumerate(_ZIGZAG):
            assert d[i, j] == v[(i % 2, j % 2)] << 2

    def test_luma_dc_vs_matrix(self):
        rng = np.random.default_rng(3)
        h4 = np.array([[1, 1, 1, 1], [1, 1, -1, -1],
                       [1, -1, -1, 1], [1, -1, 1, -1]])
        na = [10, 11, 13, 14, 16, 18]
        for _ in range(100):
            qp = int(rng.integers(0, 52))
            lv = [int(x) for x in rng.integers(-64, 64, 16)]
            c = np.zeros((4, 4), dtype=np.int64)
            for k, (i, j) in enumerate(_ZIGZAG):
                c[i, j] = lv[k]
            f = h4 @ c @ h4
            ls16 = 16 * na[qp % 6]
            if qp >= 36:
                ref = (f * ls16) << (qp // 6 - 6)
            else:
                ref = (f * ls16 + (1 << (5 - qp // 6))) >> (6 - qp // 6)
            assert np.array_equal(ref, _luma_dc(lv, qp))

    def test_chroma_dc_vs_matrix(self):
        rng = np.random.default_rng(4)
        h2 = np.array([[1, 1], [1, -1]])
        na = [10, 11, 13, 14, 16, 18]
        for _ in range(100):
            qp = int(rng.integers(0, 40))
            lv = [int(x) for x in rng.integers(-32, 32, 4)]
            f = h2 @ np.array(lv).reshape(2, 2) @ h2
            ref = ((f * 16 * na[qp % 6]) << (qp // 6)) >> 5
            assert np.array_equal(ref, _chroma_dc(lv, qp))


class TestNalLayer:
    def test_ep_round_trip(self):
        rng = np.random.default_rng(5)
        cases = [bytes([0, 0, 0, 0, 1, 2, 3]), bytes([0, 0]), b"",
                 bytes([0, 0, 3, 0, 0, 2]), bytes(10)]
        cases += [bytes(rng.integers(0, 4, 50).astype(np.uint8))
                  for _ in range(20)]
        for rbsp in cases:
            ep = _insert_ep(rbsp)
            assert b"\x00\x00\x00" not in ep
            assert b"\x00\x00\x01" not in ep
            assert b"\x00\x00\x02" not in ep
            assert _strip_ep(ep) == rbsp

    def test_annexb_split_both_start_codes(self):
        n1, n2 = bytes([0x67, 0xAA]), bytes([0x68, 0xBB])
        data = b"\x00\x00\x00\x01" + n1 + b"\x00\x00\x01" + n2
        assert split_annexb(data) == [n1, n2]
        with pytest.raises(ValueError):
            split_annexb(b"\x12\x34\x56\x78")

    def test_length_prefixed(self):
        n1, n2 = bytes([0x65, 1, 2]), bytes([0x65, 3])
        data = len(n1).to_bytes(4, "big") + n1 + len(n2).to_bytes(4, "big") + n2
        assert split_length_prefixed(data, 4) == [n1, n2]
        with pytest.raises(ValueError):
            split_length_prefixed(data[:-1], 4)

    def test_sps_pps_round_trip(self):
        b = encode_idr_stream(
            [{"type": "i16", "pred": 2, "chroma_mode": 0}], 1, 1, qp=30)
        nals = split_annexb(b)
        sps = parse_sps(nals[0])
        pps = parse_pps(nals[1])
        assert sps["width_mbs"] == 1 and sps["height_mbs"] == 1
        assert sps["profile_idc"] == 66
        assert pps["pic_init_qp"] == 30 and pps["deblock_present"] == 1


class TestRoundTrip:
    """encode_idr_stream -> decode_idr_frame bit-exact vs the shared
    reconstruction: proves the whole bitstream layer (CAVLC tokens,
    contexts, headers) is its own inverse."""

    def test_randomized_plans(self):
        rng = np.random.default_rng(42)
        for _ in range(25):
            w, h = int(rng.integers(1, 5)), int(rng.integers(1, 4))
            qp = int(rng.integers(0, 52))
            plan = [_rand_mb(rng, x, y) for y in range(h) for x in range(w)]
            b = encode_idr_stream(plan, w, h, qp=qp)
            assert is_annexb(b)
            out = decode_idr_frame(b)
            y2, cb2, cr2 = reconstruct_plan(plan, w, h, qp=qp)
            assert np.array_equal(out["y"], y2)
            assert np.array_equal(out["cb"], cb2)
            assert np.array_equal(out["cr"], cr2)

    def test_level_escape_paths(self):
        # |level| around every suffix-size boundary incl. both escapes
        for lv in (1, 7, 14, 15, 16, 30, 31, 200, 1000, 2000):
            plan = [{"type": "i16", "pred": 2, "chroma_mode": 0,
                     "dc": [lv, -lv] + [0] * 14}]
            out = decode_idr_frame(encode_idr_stream(plan, 1, 1, qp=20))
            y2, _, _ = reconstruct_plan(plan, 1, 1, qp=20)
            assert np.array_equal(out["y"], y2), lv

    def test_dense_block_totalcoeff_16(self):
        plan = [{"type": "i4", "modes": 2, "chroma_mode": 0,
                 "coeffs": [[(-1) ** k * (k + 1) for k in range(16)]
                            for _ in range(16)]}]
        out = decode_idr_frame(encode_idr_stream(plan, 1, 1, qp=30))
        y2, _, _ = reconstruct_plan(plan, 1, 1, qp=30)
        assert np.array_equal(out["y"], y2)

    def test_pcm_low_bytes_force_ep(self):
        # PCM samples 0..3 create 00 00 0x runs -> EP insertion inside
        # the slice NAL; decode must still be bit-exact
        plan = [{"type": "pcm", "y": np.zeros((16, 16), dtype=int),
                 "cb": np.full((8, 8), 1), "cr": np.full((8, 8), 2)}]
        b = encode_idr_stream(plan, 1, 1)
        out = decode_idr_frame(b)
        assert int(out["y"].max()) == 0
        assert int(out["cb"].min()) == int(out["cb"].max()) == 1
        assert int(out["cr"].min()) == int(out["cr"].max()) == 2

    def test_avcc_length_prefixed_with_oob_params(self):
        plan = [{"type": "i16", "pred": 2, "chroma_mode": 0,
                 "dc": [5] + [0] * 15}]
        b = encode_idr_stream(plan, 1, 1, qp=28)
        sps, pps, idr = split_annexb(b)
        sample = len(idr).to_bytes(4, "big") + idr
        out = decode_idr_frame(sample, sps_bytes=sps, pps_bytes=pps,
                               nal_length_size=4)
        y2, _, _ = reconstruct_plan(plan, 1, 1, qp=28)
        assert np.array_equal(out["y"], y2)

    def test_intra_pred_known_values(self):
        # flat PCM MB, then I16 vertical with a DC-only residual at
        # qp=28: dcY = 64*c00, per-pixel offset = (64*c00+32)>>6 = c00
        pcm = {"type": "pcm", "y": np.full((16, 16), 100),
               "cb": np.full((8, 8), 90), "cr": np.full((8, 8), 110)}
        i16 = {"type": "i16", "pred": 0, "chroma_mode": 2,
               "dc": [7] + [0] * 15}
        out = decode_idr_frame(encode_idr_stream([pcm, i16], 1, 2, qp=28))
        assert int(out["y"][:16].min()) == int(out["y"][:16].max()) == 100
        assert int(out["y"][16:].min()) == int(out["y"][16:].max()) == 107
        assert int(out["cb"][8:].min()) == int(out["cb"][8:].max()) == 90

    def test_i4_dc_propagation(self):
        # I4x4 all-DC, zero residual under a flat PCM row: every block
        # averages flat neighbors -> the flat value propagates
        pcm = {"type": "pcm", "y": np.full((16, 16), 73),
               "cb": np.full((8, 8), 60), "cr": np.full((8, 8), 70)}
        i4 = {"type": "i4", "modes": 2, "chroma_mode": 0}
        out = decode_idr_frame(encode_idr_stream([pcm, i4], 1, 2, qp=28))
        assert int(out["y"][16:].min()) == int(out["y"][16:].max()) == 73


class TestRejectionContract:
    def test_non_idr_slice_rejected(self):
        b = encode_idr_stream(
            [{"type": "i16", "pred": 2, "chroma_mode": 0}], 1, 1)
        sps, pps, idr = split_annexb(b)
        p_slice = bytes([(idr[0] & 0xE0) | 1]) + idr[1:]
        stream = (b"\x00\x00\x00\x01" + sps + b"\x00\x00\x00\x01" + pps
                  + b"\x00\x00\x00\x01" + p_slice)
        with pytest.raises(NotImplementedError, match="non-IDR"):
            decode_idr_frame(stream)

    def test_missing_params_rejected(self):
        b = encode_idr_stream(
            [{"type": "i16", "pred": 2, "chroma_mode": 0}], 1, 1)
        idr = split_annexb(b)[2]
        with pytest.raises(ValueError, match="missing SPS/PPS"):
            decode_idr_frame(b"\x00\x00\x00\x01" + idr)

    def test_byte_flip_fuzz_exception_contract(self):
        rng = np.random.default_rng(11)
        plan = [_rand_mb(rng, x, y) for y in range(2) for x in range(2)]
        good = encode_idr_stream(plan, 2, 2, qp=26)
        for _ in range(300):
            bad = bytearray(good)
            for _k in range(int(rng.integers(1, 4))):
                bad[int(rng.integers(0, len(bad)))] = int(rng.integers(0, 256))
            try:
                out = decode_idr_frame(bytes(bad))
            except (ValueError, NotImplementedError):
                continue  # the documented contract
            # a flip that still decodes must produce a sane frame
            assert out["y"].dtype == np.uint8
            assert out["y"].shape[0] % 16 == 0

    def test_truncation_rejected(self):
        b = encode_idr_stream(
            [{"type": "i16", "pred": 2, "chroma_mode": 0,
              "dc": [3] + [0] * 15}], 1, 1)
        with pytest.raises(ValueError):
            decode_idr_frame(b[: len(b) - 8])


# Frozen r9 stream: PCM gradient MB + I16 horizontal with luma DC+AC
# CAVLC residuals and a chroma DC residual at qp=26 (generator plan in
# TestGoldenStream).  423 bytes: SPS | PPS | IDR slice, Annex-B.
_GOLDEN_HEX = (
    "000000016742c01edcb10000000168ce3c8000000001658884a0d00001020304"
    "05060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f2021222324"
    "25262728292a2b2c2d2e2f303132333435363738393a3b3c3d3e3f4041424344"
    "45464748494a4b4c4d4e4f505152535455565758595a5b5c5d5e5f6061626364"
    "65666768696a6b6c6d6e6f707172737475767778797a7b7c7d7e7f8081828384"
    "85868788898a8b8c8d8e8f909192939495969798999a9b9c9d9e9fa0a1a2a3a4"
    "a5a6a7a8a9aaabacadaeafb0b1b2b3b4b5b6b7b8b9babbbcbdbebfc0c1c2c3c4"
    "c5c6c7c8c9cacbcccdcecfd0d1d2d3d4d5d6d7d8d9dadbdcdddedfe0e1e2e3e4"
    "e5e6e7e8e9eaebecedeeeff0f1f2f3f4f5f6f7f8f9fafbfcfdfeff000306090c"
    "0f1215181b1e2124272a2d303336393c3f4245484b4e5154575a5d606366696c"
    "6f7275787b7e8184878a8d909396999c9fa2a5a8abaeb1b4b7babd00050a0f14"
    "191e23282d32373c41464b50555a5f64696e73787d82878c91969ba0a5aaafb4"
    "b9bec3c8cdd2d7dce1e6ebf0f5faff04090e13181d22272c31363b09a8821711"
    "b30fe1c3f8da60"
)


class TestGoldenStream:
    """Frozen bitstream + frozen pixel hashes: pins the BIT-LEVEL
    format in both directions — an encoder change that moves any bit,
    or a decoder change that moves any pixel, fails here even when the
    two stay mutually consistent (round-trip tests cannot see that)."""

    _PLAN = [
        {"type": "pcm", "y": np.arange(256).reshape(16, 16) % 256,
          "cb": np.arange(64).reshape(8, 8) * 3 % 256,
          "cr": np.arange(64).reshape(8, 8) * 5 % 256},
        {"type": "i16", "pred": 1, "chroma_mode": 1,
          "dc": [5, -3] + [0] * 14,
          "ac": [[1, 0, -2] + [0] * 12] + [[0] * 15] * 15,
          "cb_dc": [2, 0, -1, 0], "cr_dc": [0] * 4},
    ]

    def test_encoder_reproduces_frozen_bytes(self):
        assert encode_idr_stream(self._PLAN, 2, 1, qp=26).hex() == "".join(
            _GOLDEN_HEX
        )

    def test_frozen_stream_decodes_to_frozen_pixels(self):
        import hashlib

        out = decode_idr_frame(bytes.fromhex("".join(_GOLDEN_HEX)))
        assert hashlib.sha256(out["y"].tobytes()).hexdigest() == (
            "c427479b7fb39bb2a46d12c9b6ff9f677250a9746e198b2c2e5b8b9364272741"
        )
        assert hashlib.sha256(out["cb"].tobytes()).hexdigest() == (
            "a29314f2f2a74c93affe9ecb13e2ffdcb03a5fc8532b6371ce68f10245b30b75"
        )
        assert hashlib.sha256(out["cr"].tobytes()).hexdigest() == (
            "300d56c34df45a420486da38e7bea33daff6feddf8bd42a34af26184ae51d223"
        )
        # spot values a human can re-derive: PCM gradient verbatim;
        # second MB = left-column horizontal pred + residuals
        assert out["y"][:2, :4].tolist() == [[0, 1, 2, 3], [16, 17, 18, 19]]
        assert out["y"][0, 16:20].tolist() == [14, 12, 8, 6]


class TestR13ReaderWriterRewrite:
    """Pins the r13 windowed-reader/batched-writer internals of the
    codec hot-path rewrite (byte-identical streams are separately
    guaranteed by the frozen-bytes tests above)."""

    def test_ep_strip_insert_match_reference_scan(self):
        # bytes.replace / re.sub forms vs the spec's stateful scan
        def ref_strip(nal):
            out, zeros = bytearray(), 0
            for b in nal:
                if zeros >= 2 and b == 3:
                    zeros = 0
                    continue
                out.append(b)
                zeros = zeros + 1 if b == 0 else 0
            return bytes(out)

        def ref_insert(rbsp):
            out, zeros = bytearray(), 0
            for b in rbsp:
                if zeros >= 2 and b <= 3:
                    out.append(3)
                    zeros = 0
                out.append(b)
                zeros = zeros + 1 if b == 0 else 0
            return bytes(out)

        rng = np.random.default_rng(99)
        for _ in range(300):
            n = int(rng.integers(0, 40))
            # low-entropy alphabet so 00 00 0x runs are dense
            s = bytes(rng.choice([0, 0, 0, 1, 2, 3, 3, 255], size=n)
                      .astype(np.uint8))
            assert _strip_ep(s) == ref_strip(s)
            assert _insert_ep(s) == ref_insert(s)
            assert _strip_ep(_insert_ep(s)) == s

    def test_long_exp_golomb_crosses_refill_windows(self):
        # ue() with 31 leading zeros spans several 8-byte reader gulps
        from pgvecto_rs_spark.operators.h264 import _Bits, _RbspW

        w = _RbspW()
        w.ue((1 << 31) - 1)  # 31 zeros + 1 + 31 value bits = 63 bits
        w.write(1, 1)
        w.align()
        r = _Bits(w.bytes())
        assert r.ue() == (1 << 31) - 1
        assert r.u(1) == 1

    def test_exp_golomb_too_long_still_rejected(self):
        from pgvecto_rs_spark.operators.h264 import _Bits

        r = _Bits(bytes(8) + b"\x80")  # 64 zero bits then a 1
        with pytest.raises(ValueError, match="Exp-Golomb"):
            r.ue()

    def test_pcm_byte_skip_resets_reader_window(self):
        # PCM (window-resetting byte skip) followed by coded MBs that
        # depend on bit-exact reader position
        rng = np.random.default_rng(5)
        plan = [
            {"type": "pcm", "y": rng.integers(0, 256, (16, 16)),
             "cb": rng.integers(0, 256, (8, 8)),
             "cr": rng.integers(0, 256, (8, 8))},
            {"type": "i16", "pred": 1, "chroma_mode": 1,
             "dc": [3, -2] + [0] * 14,
             "ac": [[1, 0, -1] + [0] * 12] * 16},
        ]
        b = encode_idr_stream(plan, 2, 1, qp=30)
        out = decode_idr_frame(b)
        y2, cb2, cr2 = reconstruct_plan(plan, 2, 1, qp=30)
        assert np.array_equal(out["y"], y2)
        assert np.array_equal(out["cb"], cb2)
        assert np.array_equal(out["cr"], cr2)

    def test_parameter_set_cache_is_content_keyed(self):
        from pgvecto_rs_spark.operators import h264 as H

        p1 = [{"type": "i16", "pred": 2, "chroma_mode": 0}]
        b1 = H.encode_idr_stream(p1, 1, 1, qp=30)
        b2 = H.encode_idr_stream([p1[0]] * 4, 2, 2, qp=30)
        # alternate different geometries (different SPS bytes) through
        # the cache: each decode must honor ITS stream's dimensions
        for _ in range(3):
            assert H.decode_idr_frame(b1)["width"] == 16
            assert H.decode_idr_frame(b2)["width"] == 32
