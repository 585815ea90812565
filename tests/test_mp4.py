"""MP4 (ISO BMFF) container indexing: operators/mp4.py + the Spark
operators over it (multimodal.index_video_samples / the MP4 path of
sample_video_frames).

Reference parity: N/A — /root/reference has no media surface; this is
engine-extension coverage like the other codec suites."""

from __future__ import annotations

import random
import struct

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pgvecto_rs_spark.operators.mp4 import (
    MP4_MDAT_DATA_START,
    encode_mp4,
    index_mp4_samples,
    is_mp4,
)


def _payloads(n: int, seed: int = 7) -> list[bytes]:
    rng = random.Random(seed)
    return [bytes(rng.randrange(256) for _ in range(rng.randrange(5, 60))) for _ in range(n)]


class TestMp4Index:
    def test_round_trip_exact(self):
        pl = _payloads(7)
        durs = [100, 100, 120, 90, 90, 90, 150]
        cts = [0, 80, 40, 0, 80, 40, 0]
        kfs = [True, False, False, True, False, False, True]
        b = encode_mp4(
            pl, durations=durs, cts_offsets=cts, keyframes=kfs,
            timescale=600, width=320, height=240, samples_per_chunk=3,
        )
        assert is_mp4(b)
        idx = index_mp4_samples(b)
        assert (idx["codec"], idx["width"], idx["height"]) == ("avc1", 320, 240)
        assert idx["timescale"] == 600 and idx["duration"] == sum(durs)
        dts = 0
        off = MP4_MDAT_DATA_START
        for i, s in enumerate(idx["samples"]):
            assert s == (i + 1, dts, dts + cts[i], off, len(pl[i]), kfs[i])
            # the indexed extent really is the access unit
            assert b[s[3] : s[3] + s[4]] == pl[i]
            dts += durs[i]
            off += len(pl[i])

    def test_co64_matches_stco(self):
        pl = _payloads(5, seed=9)
        a = index_mp4_samples(encode_mp4(pl, co64=False))
        b = index_mp4_samples(encode_mp4(pl, co64=True))
        assert a["samples"] == b["samples"]

    def test_no_stss_means_all_keyframes(self):
        idx = index_mp4_samples(encode_mp4(_payloads(4)))
        assert all(s[5] for s in idx["samples"])

    def test_no_ctts_means_pts_equals_dts(self):
        idx = index_mp4_samples(encode_mp4(_payloads(4)))
        assert all(s[1] == s[2] for s in idx["samples"])

    def test_single_sample_and_odd_tail_chunks(self):
        for n in (1, 3, 5):
            pl = _payloads(n, seed=n)
            idx = index_mp4_samples(encode_mp4(pl, samples_per_chunk=2))
            offs = [s[3] for s in idx["samples"]]
            want, o = [], MP4_MDAT_DATA_START
            for p in pl:
                want.append(o)
                o += len(p)
            assert offs == want

    def test_largesize_box_header(self):
        """size==1 + 64-bit largesize on the mdat box parses."""
        b = encode_mp4(_payloads(3))
        # rewrite mdat's header to the largesize form
        (msz,) = struct.unpack(">I", b[24:28])
        assert b[28:32] == b"mdat"
        big = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", msz + 8)
        b2 = b[:24] + big + b[32 : 24 + msz] + b[24 + msz :]
        idx, idx2 = index_mp4_samples(b), index_mp4_samples(b2)
        # offsets shift by the 8 extra header bytes — sizes/times identical
        assert [s[4] for s in idx2["samples"]] == [s[4] for s in idx["samples"]]
        assert [s[1] for s in idx2["samples"]] == [s[1] for s in idx["samples"]]

    def test_version1_mdhd(self):
        """mdhd v1 (64-bit times) parses: patch the v0 box to v1."""
        b = bytearray(encode_mp4(_payloads(2), timescale=90000))
        i = b.find(b"mdhd")
        body = i + 4
        # v0 body: ver/flags(4) c(4) m(4) ts(4) dur(4) lang(2) pre(2) = 24
        ts, dur = struct.unpack(">II", b[body + 12 : body + 20])
        v1 = (
            bytes([1, 0, 0, 0])
            + struct.pack(">QQIQ", 0, 0, ts, dur)
            + b[body + 20 : body + 24]
        )
        new = struct.pack(">I", 8 + len(v1)) + b"mdhd" + v1
        old_size = struct.unpack(">I", b[i - 4 : i])[0]
        grown = len(new) - old_size
        # grow every ancestor box size (moov, trak, mdia)
        out = bytearray(b[: i - 4] + new + b[i - 4 + old_size :])
        for fourcc in (b"moov", b"trak", b"mdia"):
            j = out.find(fourcc)
            sz = struct.unpack(">I", out[j - 4 : j])[0]
            out[j - 4 : j] = struct.pack(">I", sz + grown)
        idx = index_mp4_samples(bytes(out))
        assert idx["timescale"] == ts and idx["duration"] == dur

    def test_not_mp4_rejected(self):
        with pytest.raises(ValueError):
            index_mp4_samples(b"RIFF\x00\x00\x00\x00AVI ")
        with pytest.raises(ValueError):
            index_mp4_samples(b"")
        assert not is_mp4(b"\x89PNG\r\n\x1a\n")

    def test_audio_only_track_rejected(self):
        """A track whose hdlr is not 'vide' must not index as video."""
        b = bytearray(encode_mp4(_payloads(2)))
        i = b.find(b"vide")
        b[i : i + 4] = b"soun"
        with pytest.raises(ValueError, match="no video track"):
            index_mp4_samples(bytes(b))

    def test_truncated_fields_raise_valueerror(self):
        """r8 advice: short stsd/stsz/mdhd bodies ending exactly at EOF
        cut a fixed-width field mid-slice (struct.error) and an empty
        full-box body indexes past the end (IndexError) — all must
        surface as the documented ValueError, never crash ingest."""
        from pgvecto_rs_spark.operators.mp4 import _box, _fullbox

        def craft(
            mdhd: bytes, stbl_boxes: list[bytes], mdhd_last: bool = False
        ) -> bytes:
            ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
            hdlr = _fullbox(
                b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" + bytes(12) + b"\x00"
            )
            stbl = _box(b"stbl", b"".join(stbl_boxes))
            minf = _box(b"minf", stbl)
            # mdhd_last places mdhd's (short) body flush against EOF so
            # its field slices genuinely cross the end of the file
            inner = (hdlr + minf + mdhd) if mdhd_last else (mdhd + hdlr + minf)
            mdia = _box(b"mdia", inner)
            return ftyp + _box(b"moov", _box(b"trak", mdia))

        ok_mdhd = _fullbox(
            b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, 1000, 100, 0x55C4, 0)
        )
        ok = {
            b"stts": _fullbox(b"stts", 0, 0, struct.pack(">III", 1, 1, 100)),
            b"stsz": _fullbox(b"stsz", 0, 0, struct.pack(">III", 0, 1, 4)),
            b"stsc": _fullbox(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1)),
            b"stco": _fullbox(b"stco", 0, 0, struct.pack(">II", 1, 0)),
        }
        cases = [
            # stsd with a 2-byte body, last box in the file → the
            # entry_count slice crosses EOF
            craft(ok_mdhd, list(ok.values()) + [_box(b"stsd", b"\x00\x00")]),
            # stsz with a 4-byte body at EOF → (fixed, count) unpack short
            # (stsd must be valid so parsing reaches the stsz slice)
            craft(
                ok_mdhd,
                [_box(b"stsd", bytes(4) + struct.pack(">I", 1)
                      + struct.pack(">I", 44) + b"avc1" + bytes(36)),
                 ok[b"stts"], ok[b"stsc"], ok[b"stco"], _box(b"stsz", bytes(4))],
            ),
            # empty mdhd body flush at EOF → _full reads data[pos] past end
            craft(_box(b"mdhd", b""), list(ok.values()), mdhd_last=True),
            # mdhd v1 body too short for the ">IQ" unpack, flush at EOF
            craft(_fullbox(b"mdhd", 1, 0, bytes(16)), list(ok.values()),
                  mdhd_last=True),
        ]
        for data in cases:
            with pytest.raises(ValueError):
                index_mp4_samples(data)

    def test_fuzz_exception_contract(self):
        """Same contract as every codec: corrupt/truncated payloads
        raise ValueError/NotImplementedError (or index garbage), never
        struct.error/IndexError/KeyError/OverflowError/MemoryError."""
        valid = encode_mp4(_payloads(6), keyframes=[True, False] * 3,
                           cts_offsets=[0, 40] * 3)
        rng = random.Random(42)
        for trial in range(3000):
            mode = trial % 3
            if mode == 0:
                data = valid[:12] + bytes(
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
                index_mp4_samples(data)
            except (ValueError, NotImplementedError):
                pass

    @settings(max_examples=40, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(
        data=st.lists(
            st.tuples(
                st.binary(min_size=1, max_size=40),          # payload
                st.integers(min_value=1, max_value=10_000),  # duration
                st.integers(min_value=0, max_value=5_000),   # cts offset
                st.booleans(),                               # keyframe
            ),
            min_size=1,
            max_size=20,
        ),
        spc=st.integers(min_value=1, max_value=5),
        co64=st.booleans(),
    )
    def test_property_round_trip(self, data, spc, co64):
        """ANY sample table round-trips encode -> index exactly."""
        pls = [d[0] for d in data]
        durs = [d[1] for d in data]
        cts = [d[2] for d in data]
        kfs = [d[3] for d in data]
        b = encode_mp4(
            pls, durations=durs, cts_offsets=cts, keyframes=kfs,
            samples_per_chunk=spc, co64=co64,
        )
        idx = index_mp4_samples(b)
        assert len(idx["samples"]) == len(pls)
        dts = 0
        off = MP4_MDAT_DATA_START
        for i, s in enumerate(idx["samples"]):
            assert s == (i + 1, dts, dts + cts[i], off, len(pls[i]), kfs[i])
            assert b[s[3] : s[3] + s[4]] == pls[i]
            dts += durs[i]
            off += len(pls[i])


class TestMp4Spark:
    def _media(self, spark, n=6):
        import pandas as pd

        rows = []
        for did in range(n):
            nf = 1 + did % 4
            pls = [bytes([did * 16 + i] * (10 + i)) for i in range(nf)]
            rows.append(
                (
                    did,
                    encode_mp4(
                        pls,
                        durations=[100 + 10 * i for i in range(nf)],
                        keyframes=[i % 2 == 0 for i in range(nf)],
                    ),
                )
            )
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["media_id", "payload"])
        )

    def test_index_video_samples(self, spark):
        from pgvecto_rs_spark.operators.multimodal import index_video_samples

        out = index_video_samples(self._media(spark)).collect()
        got = {(r["media_id"], r["sample_no"]): r for r in out}
        assert len(got) == sum(1 + d % 4 for d in range(6))
        for did in range(6):
            nf = 1 + did % 4
            off = MP4_MDAT_DATA_START
            dts = 0
            for i in range(nf):
                r = got[(did, i + 1)]
                assert r["offset"] == off and r["size"] == 10 + i
                assert r["dts"] == dts and r["pts"] == dts
                assert r["keyframe"] == (i % 2 == 0)
                assert r["codec"] == "avc1"
                off += 10 + i
                dts += 100 + 10 * i

    def test_index_on_error_null(self, spark):
        import pandas as pd

        from pgvecto_rs_spark.operators.multimodal import index_video_samples

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "media_id": [0, 1, 2],
                    "payload": [encode_mp4([b"x" * 8]), b"garbage!!", None],
                }
            )
        )
        with pytest.raises(Exception):
            index_video_samples(df).collect()
        out = index_video_samples(df, on_error="null").collect()
        assert {r["media_id"] for r in out} == {0}

    def test_sample_video_frames_mp4_extracts_exact_bytes(self, spark):
        import pandas as pd

        from pgvecto_rs_spark.operators.multimodal import sample_video_frames

        pls = [bytes([i] * (8 + i)) for i in range(5)]
        df = spark.createDataFrame(
            pd.DataFrame({"media_id": [1], "payload": [encode_mp4(pls)]})
        )
        out = sample_video_frames(df, every_n=2).collect()
        assert [(r["frame_no"], bytes(r["frame_payload"])) for r in
                sorted(out, key=lambda r: r["frame_no"])] == [
            (0, pls[0]), (2, pls[2]), (4, pls[4]),
        ]


class TestAvcc:
    """avcC record extraction (r9) + the keyframe pixel-decode path."""

    def test_avcc_round_trip(self):
        from pgvecto_rs_spark.operators.h264 import encode_idr_stream, split_annexb

        sps, pps, idr = split_annexb(encode_idr_stream(
            [{"type": "i16", "pred": 2, "chroma_mode": 0}], 1, 1))
        mp4 = encode_mp4([len(idr).to_bytes(4, "big") + idr], sps=sps, pps=pps)
        idx = index_mp4_samples(mp4)
        assert idx["avcc"] == {
            "nal_length_size": 4, "sps": [sps], "pps": [pps]}

    def test_default_fake_avcc_still_parses(self):
        idx = index_mp4_samples(encode_mp4([b"xx" * 8]))
        assert idx["avcc"] is not None
        assert idx["avcc"]["nal_length_size"] == 4
        assert len(idx["avcc"]["sps"]) == 1 and len(idx["avcc"]["pps"]) == 1

    def test_decode_video_keyframes_exact(self, spark):
        import numpy as np
        import pandas as pd

        from pgvecto_rs_spark.operators.h264 import (
            encode_idr_stream, reconstruct_plan, split_annexb)
        from pgvecto_rs_spark.operators.multimodal import decode_video_keyframes

        plan = [
            {"type": "pcm", "y": np.full((16, 16), 50),
             "cb": np.full((8, 8), 60), "cr": np.full((8, 8), 70)},
            {"type": "i16", "pred": 1, "chroma_mode": 1,
             "dc": [4] + [0] * 15},
        ]
        sps, pps, idr = split_annexb(encode_idr_stream(plan, 2, 1, qp=28))
        sample = len(idr).to_bytes(4, "big") + idr
        mp4 = encode_mp4([sample, sample, sample],
                         keyframes=[True, False, True],
                         sps=sps, pps=pps, width=32, height=16)
        df = spark.createDataFrame(
            pd.DataFrame({"media_id": [9], "payload": [mp4]}))
        out = sorted(decode_video_keyframes(df).collect(),
                     key=lambda r: r["sample_no"])
        assert [r["sample_no"] for r in out] == [1, 3]  # keyframes only
        y, cb, cr = reconstruct_plan(plan, 2, 1, qp=28)
        for r in out:
            assert (r["width"], r["height"]) == (32, 16)
            assert r["luma_sum"] == int(y.astype(np.int64).sum())
            assert r["luma_min"] == int(y.min())
            assert r["luma_max"] == int(y.max())
            assert r["cb_sum"] == int(cb.astype(np.int64).sum())
            assert r["cr_sum"] == int(cr.astype(np.int64).sum())

    def test_decode_video_keyframes_on_error_null(self, spark):
        import numpy as np
        import pandas as pd

        from pgvecto_rs_spark.operators.h264 import (
            encode_idr_stream, split_annexb)
        from pgvecto_rs_spark.operators.multimodal import decode_video_keyframes

        sps, pps, idr = split_annexb(encode_idr_stream(
            [{"type": "i16", "pred": 2, "chroma_mode": 0}], 1, 1))
        good = encode_mp4([len(idr).to_bytes(4, "big") + idr],
                          sps=sps, pps=pps, width=16, height=16)
        fake_units = encode_mp4([b"not a nal" * 3])  # fake avcC, garbage AUs
        df = spark.createDataFrame(pd.DataFrame({
            "media_id": [0, 1, 2, 3],
            "payload": [good, fake_units, b"garbage", None],
        }))
        with pytest.raises(Exception):
            decode_video_keyframes(df).collect()
        out = decode_video_keyframes(df, on_error="null").collect()
        assert {r["media_id"] for r in out} == {0}


class TestVideoNeardup:
    """Keyframe aHash + banded Hamming join (r9)."""

    @staticmethod
    def _make_video(group, variant, nframes=2):
        import numpy as np

        from pgvecto_rs_spark.operators.h264 import (
            encode_idr_stream, split_annexb)

        samples, sps, pps = [], None, None
        for s in range(nframes):
            i = np.arange(32)
            pat = (((group * 31 + i[:, None] * 7 + i[None, :] * 13 + s * 41)
                    % 97) * 2 + variant * 2)
            plan = []
            for mby in range(2):
                for mbx in range(2):
                    plan.append({
                        "type": "pcm",
                        "y": pat[mby*16:mby*16+16, mbx*16:mbx*16+16],
                        "cb": np.full((8, 8), 128),
                        "cr": np.full((8, 8), 128),
                    })
            sps, pps, idr = split_annexb(encode_idr_stream(plan, 2, 2))
            samples.append(len(idr).to_bytes(4, "big") + idr)
        return encode_mp4(samples, sps=sps, pps=pps, width=32, height=32)

    def test_hash_brightness_invariance_and_grouping(self, spark):
        import pandas as pd

        from pgvecto_rs_spark.operators.multimodal import video_keyframe_hashes

        rows = [(g * 10 + v, self._make_video(g, v))
                for g in range(2) for v in range(3)]
        df = spark.createDataFrame(pd.DataFrame(
            {"media_id": [r[0] for r in rows],
             "payload": [r[1] for r in rows]}))
        out = video_keyframe_hashes(df).collect()
        sigs = {(r["media_id"], r["sample_no"]): r["sig"] for r in out}
        assert len(sigs) == 12  # 6 videos x 2 keyframes
        for s in (1, 2):
            # uniform brightness offsets hash identically within a group
            assert sigs[(0, s)] == sigs[(1, s)] == sigs[(2, s)]
            assert sigs[(10, s)] == sigs[(11, s)] == sigs[(12, s)]
            assert sigs[(0, s)] != sigs[(10, s)]

    def test_neardup_pairs_within_groups_only(self, spark):
        import pandas as pd

        from pgvecto_rs_spark.operators.multimodal import video_neardup_pairs

        rows = [(g * 10 + v, self._make_video(g, v))
                for g in range(2) for v in range(3)]
        df = spark.createDataFrame(pd.DataFrame(
            {"media_id": [r[0] for r in rows],
             "payload": [r[1] for r in rows]}))
        # max_hamming=0 also regression-tests the 64-bit single-band
        # mask in dedup.hamming_candidate_pairs ((1<<64)-1 overflow)
        for mh in (0, 2):
            got = sorted((r["id_a"], r["id_b"], r["n_frames"])
                         for r in video_neardup_pairs(
                             df, max_hamming=mh,
                             min_matching_frames=2).collect())
            assert got == [(0, 1, 2), (0, 2, 2), (1, 2, 2),
                           (10, 11, 2), (10, 12, 2), (11, 12, 2)], mh

    def test_sample_no_packing_guard(self, spark):
        import pandas as pd

        from pgvecto_rs_spark.operators.multimodal import video_neardup_pairs

        df = spark.createDataFrame(pd.DataFrame(
            {"media_id": [1, 2],
             "payload": [self._make_video(0, 0), self._make_video(0, 1)]}))
        # normal path works; the 2^20 guard is exercised structurally
        # (sample_no is tiny here — the point is the expression compiles
        # and the pair survives it)
        got = video_neardup_pairs(df, max_hamming=0,
                                  min_matching_frames=2).collect()
        assert sorted((r["id_a"], r["id_b"]) for r in got) == [(1, 2)]


class TestTextTrack:
    """tx3g caption track (r9): encoder-twin round-trip + contract."""

    def test_round_trip_exact(self):
        from pgvecto_rs_spark.operators.mp4 import extract_mp4_text_samples

        cues = [("hello world", 800), ("café ☕ caption", 1200), ("", 500),
                ("x" * 300, 100)]
        m = encode_mp4([b"v" * 10, b"w" * 8], text_samples=cues)
        txt = extract_mp4_text_samples(m)
        assert txt["timescale"] == 1000
        assert txt["duration"] == sum(d for _t, d in cues)
        dts = 0
        for (no, got_dts, dur, text), (want_t, want_d) in zip(
            txt["samples"], cues
        ):
            assert (got_dts, dur, text) == (dts, want_d, want_t)
            dts += want_d
        # the video track is untouched by the second trak
        assert len(index_mp4_samples(m)["samples"]) == 2

    def test_no_text_track_raises(self):
        from pgvecto_rs_spark.operators.mp4 import extract_mp4_text_samples

        with pytest.raises(ValueError, match="no text track"):
            extract_mp4_text_samples(encode_mp4([b"v" * 4]))

    def test_truncated_text_sample_rejected(self):
        from pgvecto_rs_spark.operators.mp4 import extract_mp4_text_samples

        m = bytearray(encode_mp4([b"v" * 4], text_samples=[("abcdef", 100)]))
        # corrupt the tx3g length prefix to overrun its sample
        pos = m.find(b"\x00\x06abcdef")
        assert pos > 0
        m[pos : pos + 2] = (500).to_bytes(2, "big")
        with pytest.raises(ValueError):
            extract_mp4_text_samples(bytes(m))

    def test_fuzz_exception_contract(self):
        import numpy as np

        from pgvecto_rs_spark.operators.mp4 import extract_mp4_text_samples

        rng = np.random.default_rng(13)
        good = encode_mp4([b"v" * 6], text_samples=[("one", 100), ("two", 200)])
        for _ in range(200):
            bad = bytearray(good)
            for _k in range(int(rng.integers(1, 4))):
                bad[int(rng.integers(0, len(bad)))] = int(rng.integers(0, 256))
            try:
                extract_mp4_text_samples(bytes(bad))
            except (ValueError, NotImplementedError):
                pass  # the documented contract — never another exception

    def test_captions_spark_op(self, spark):
        import pandas as pd

        from pgvecto_rs_spark.operators.multimodal import extract_video_captions

        good = encode_mp4([b"v" * 6],
                          text_samples=[("one", 100), ("two", 200)])
        df = spark.createDataFrame(pd.DataFrame({
            "media_id": [1, 2, 3],
            "payload": [good, encode_mp4([b"no text"]), None],
        }))
        with pytest.raises(Exception):
            extract_video_captions(df).collect()
        out = sorted(extract_video_captions(df, on_error="null").collect(),
                     key=lambda r: r["sample_no"])
        assert [(r["media_id"], r["sample_no"], r["dts"], r["dur"], r["text"])
                for r in out] == [(1, 1, 0, 100, "one"), (1, 2, 100, 200, "two")]
