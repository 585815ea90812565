"""MP3 container indexing + ID3 extraction (operators/mp3.py).

Reference parity: N/A — engine extension like the other codecs."""

from __future__ import annotations

import struct

import pytest

from pgvecto_rs_spark.operators.mp3 import (
    encode_mp3,
    index_mp3_frames,
    is_mp3,
)


class TestIndex:
    def test_round_trip_exact_with_padding(self):
        m = encode_mp3(6, bitrate_kbps=128, sample_rate=44100,
                       padding_pattern=0b101101)
        idx = index_mp3_frames(m)
        base = 144000 * 128 // 44100
        off = 0
        for i, f in enumerate(idx["frames"]):
            pad = (0b101101 >> (i % 8)) & 1
            assert f == (i + 1, off, base + pad, 1152, 128, 44100, 2)
            off += base + pad
        assert off == len(m)
        assert idx["duration_ms"] == 6 * (1152 * 1000 // 44100)

    def test_mpeg2_tables(self):
        m = encode_mp3(3, bitrate_kbps=64, sample_rate=22050)
        idx = index_mp3_frames(m)
        assert idx["frames"][0][2:] == (72000 * 64 // 22050, 576, 64, 22050, 2)

    def test_every_table_entry(self):
        for rate in (44100, 48000, 32000):
            for kbps in (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                         224, 256, 320):
                idx = index_mp3_frames(
                    encode_mp3(1, bitrate_kbps=kbps, sample_rate=rate))
                assert idx["frames"][0][2] == 144000 * kbps // rate
        for rate in (22050, 24000, 16000):
            for kbps in (8, 16, 24, 32, 48, 64, 96, 128, 160):
                idx = index_mp3_frames(
                    encode_mp3(1, bitrate_kbps=kbps, sample_rate=rate))
                assert idx["frames"][0][2] == 72000 * kbps // rate

    def test_tags_round_trip(self):
        tags = {"TIT2": "Mixed ünïcödé ☕", "TPE1": "a" * 200, "TLAN": "eng"}
        idx = index_mp3_frames(encode_mp3(2, tags=tags))
        assert idx["tags"] == tags
        assert len(idx["frames"]) == 2
        assert idx["frames"][0][1] > 0  # offsets start after the tag

    def test_id3v24_utf16_and_latin1(self):
        # hand-built v2.4 tag: syncsafe frame sizes, UTF-16 + latin-1
        def frame(fid, enc, raw):
            body = bytes([enc]) + raw
            n = len(body)
            ss = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                        (n >> 7) & 0x7F, n & 0x7F])
            return fid + ss + b"\x00\x00" + body

        frames = (frame(b"TIT2", 1, "héllo".encode("utf-16"))
                  + frame(b"TPE1", 0, "café".encode("latin-1"))
                  + frame(b"TALB", 2, "be".encode("utf-16-be")))
        n = len(frames)
        tag = b"ID3\x04\x00\x00" + bytes(
            [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
        ) + frames
        audio = encode_mp3(1)
        idx = index_mp3_frames(tag + audio)
        assert idx["tags"] == {"TIT2": "héllo", "TPE1": "café", "TALB": "be"}

    def test_id3v1_trailer_tolerated(self):
        m = encode_mp3(2) + b"TAG" + bytes(125)
        assert len(index_mp3_frames(m)["frames"]) == 2

    def test_rejections(self):
        with pytest.raises(ValueError):
            index_mp3_frames(b"")
        with pytest.raises(ValueError):
            index_mp3_frames(b"garbage bytes here")
        good = encode_mp3(2)
        with pytest.raises(ValueError, match="past end"):
            index_mp3_frames(good[:-10])
        # free-format bitrate index 0
        h = struct.unpack(">I", good[:4])[0] & ~(0xF << 12)
        with pytest.raises(ValueError, match="bitrate"):
            index_mp3_frames(struct.pack(">I", h) + good[4:])
        # reserved version id (bits 19-20 = 01)
        h = (struct.unpack(">I", good[:4])[0] & ~(3 << 19)) | (1 << 19)
        with pytest.raises(ValueError, match="version"):
            index_mp3_frames(struct.pack(">I", h) + good[4:])
        # layer I instead of III (rejected at the sniff when it's the
        # first frame; mid-stream it hits the Layer III check)
        h = (struct.unpack(">I", good[:4])[0] & ~(3 << 17)) | (3 << 17)
        with pytest.raises(ValueError, match="frame sync|Layer III"):
            index_mp3_frames(struct.pack(">I", h) + good[4:])
        first = index_mp3_frames(good)["frames"][0]
        mid = bytearray(good)
        mid[first[2] : first[2] + 4] = struct.pack(
            ">I", (struct.unpack(">I", good[:4])[0] & ~(3 << 17)) | (3 << 17)
        )
        with pytest.raises(ValueError, match="Layer III"):
            index_mp3_frames(bytes(mid))

    def test_byte_flip_fuzz_contract(self):
        import numpy as np

        rng = np.random.default_rng(19)
        good = encode_mp3(4, tags={"TIT2": "t", "TPE1": "p"})
        for _ in range(300):
            bad = bytearray(good)
            for _k in range(int(rng.integers(1, 4))):
                bad[int(rng.integers(0, len(bad)))] = int(rng.integers(0, 256))
            try:
                out = index_mp3_frames(bytes(bad))
            except (ValueError, NotImplementedError):
                continue
            assert out["frames"], "successful parse must index frames"


class TestSparkOps:
    def test_index_and_tags(self, spark):
        import pandas as pd

        from pgvecto_rs_spark.operators.multimodal import (
            extract_audio_tags, index_audio_frames)

        good = encode_mp3(3, tags={"TIT2": "x"})
        df = spark.createDataFrame(pd.DataFrame({
            "media_id": [1, 2, 3],
            "payload": [good, b"not mp3", None],
        }))
        with pytest.raises(Exception):
            index_audio_frames(df).collect()
        rows = index_audio_frames(df, on_error="null").collect()
        assert {r["media_id"] for r in rows} == {1} and len(rows) == 3
        tags = extract_audio_tags(df, on_error="null").collect()
        assert [(t["media_id"], t["tag"], t["value"]) for t in tags] == [
            (1, "TIT2", "x")
        ]
