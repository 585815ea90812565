"""Ogg container indexing + Opus metadata (operators/ogg.py).

Reference parity: N/A — engine extension like the other codecs."""

from __future__ import annotations

import struct

import pytest

from pgvecto_rs_spark.operators.ogg import (
    _ogg_crc,
    encode_ogg_opus,
    extract_opus_tags,
    index_ogg_pages,
    is_ogg,
)


class TestPages:
    def test_round_trip_exact(self):
        m = encode_ogg_opus(3, packet_size=80)
        idx = index_ogg_pages(m)
        assert idx["codecs"] == {1: "opus"}
        pages = idx["pages"]
        assert pages[0] == (1, 0, 47, 1, 0, 1, True, False)  # OpusHead BOS
        assert pages[1][1:4] == (47, 60, 1)                  # vendor-only tags
        off = 107
        for i, p in enumerate(pages[2:]):
            assert p == (3 + i, off, 108, 1, 960 * (i + 1), 1, False, i == 2)
            off += 108
        assert off == len(m)

    def test_crc_is_verified(self):
        m = bytearray(encode_ogg_opus(2))
        m[80] ^= 0x40  # flip a body byte, leave the stored CRC alone
        with pytest.raises(ValueError, match="CRC"):
            index_ogg_pages(bytes(m))

    def test_crc_known_vector(self):
        # independent pin of the Ogg CRC-32 variant (poly 0x04C11DB7,
        # no reflection, init/xorout 0): hand-computed bitwise
        def bitwise(data):
            crc = 0
            for byte in data:
                crc ^= byte << 24
                for _ in range(8):
                    crc = ((crc << 1) ^ 0x04C11DB7 if crc & 0x80000000
                           else crc << 1) & 0xFFFFFFFF
            return crc

        for probe in (b"", b"OggS", b"123456789", bytes(range(256))):
            assert _ogg_crc(probe) == bitwise(probe)

    def test_lacing_span_over_255(self):
        m = encode_ogg_opus(1, packet_size=600)
        idx = index_ogg_pages(m)
        # 600 = 255+255+90 -> 3 lacing segments, still ONE packet
        assert idx["pages"][2][2] == 27 + 3 + 600
        assert idx["pages"][2][5] == 1  # n_packets

    def test_rejections(self):
        with pytest.raises(ValueError):
            index_ogg_pages(b"")
        with pytest.raises(ValueError):
            index_ogg_pages(b"not an ogg stream")
        good = encode_ogg_opus(2)
        with pytest.raises(ValueError, match="past end"):
            index_ogg_pages(good[:-5])
        bad = bytearray(good)
        bad[4] = 1  # stream structure version
        with pytest.raises(ValueError, match="version"):
            index_ogg_pages(bytes(bad))

    def test_byte_flip_fuzz_contract(self):
        import numpy as np

        rng = np.random.default_rng(23)
        good = encode_ogg_opus(3, comments={"TITLE": "x"})
        for _ in range(300):
            bad = bytearray(good)
            for _k in range(int(rng.integers(1, 4))):
                bad[int(rng.integers(0, len(bad)))] = int(rng.integers(0, 256))
            try:
                index_ogg_pages(bytes(bad))
            except (ValueError, NotImplementedError):
                pass  # the documented contract


class TestOpusTags:
    def test_head_and_comments(self):
        m = encode_ogg_opus(
            2, comments={"TITLE": "Sömg ☕", "artist": "lower key"},
            channels=1, pre_skip=100, input_sample_rate=24000,
        )
        t = extract_opus_tags(m)
        assert (t["channels"], t["pre_skip"], t["input_sample_rate"]) == (
            1, 100, 24000)
        assert t["vendor"] == "pgvecto-rs-spark"
        # keys are uppercased per the VorbisComment convention
        assert t["comments"] == {"TITLE": "Sömg ☕", "ARTIST": "lower key"}

    def test_truncated_tags_field_is_value_error(self):
        # r9 ADVICE: a CRC-valid page whose OpusTags body ends inside the
        # vendor-length u32 used to leak struct.error past the documented
        # ValueError contract (and past multimodal's on_error='null' catch).
        from pgvecto_rs_spark.operators.ogg import _page

        head = (b"OpusHead\x01\x02" + struct.pack("<HIh", 312, 48000, 0)
                + b"\x00")
        for tags in (b"OpusTags\x05\x00",          # vendor-length cut short
                     b"OpusTags" + struct.pack("<I", 0) + b"\x01"):  # count cut
            m = _page(1, 0, 0, 2, [head]) + _page(1, 1, 0, 0, [tags]) \
                + _page(1, 2, 960, 4, [b"\xfc\xff\xfe"])
            with pytest.raises(ValueError, match="truncated"):
                extract_opus_tags(m)

    def test_invalid_utf8_is_malformed_not_truncated(self):
        # r10 ADVICE: invalid (non-truncated) UTF-8 in a comment used to
        # report the misleading 'truncated field' — it is structurally
        # complete, just malformed, and the message now says so.
        from pgvecto_rs_spark.operators.ogg import _page

        head = (b"OpusHead\x01\x02" + struct.pack("<HIh", 312, 48000, 0)
                + b"\x00")
        bad = b"TITLE=\xff\xfe"  # not valid UTF-8, lengths all correct
        tags = (b"OpusTags" + struct.pack("<I", 0) + struct.pack("<I", 1)
                + struct.pack("<I", len(bad)) + bad)
        m = _page(1, 0, 0, 2, [head]) + _page(1, 1, 0, 0, [tags]) \
            + _page(1, 2, 960, 4, [b"\xfc\xff\xfe"])
        with pytest.raises(ValueError, match="malformed UTF-8"):
            extract_opus_tags(m)

    def test_non_opus_rejected(self):
        m = bytearray(encode_ogg_opus(1))
        i = m.find(b"OpusHead")
        m[i : i + 8] = b"\x01vorbis\x00"
        # re-CRC the first page so only the codec changes
        nseg = m[26]
        size = 27 + nseg + sum(m[27 : 27 + nseg])
        page = bytearray(m[:size])
        page[22:26] = b"\x00\x00\x00\x00"
        m[22:26] = struct.pack("<I", _ogg_crc(bytes(page)))
        with pytest.raises(NotImplementedError, match="no Opus"):
            extract_opus_tags(bytes(m))


class TestSparkOps:
    def test_pages_and_unified_tags(self, spark):
        import pandas as pd

        from pgvecto_rs_spark.operators.mp3 import encode_mp3
        from pgvecto_rs_spark.operators.multimodal import (
            extract_audio_tags, index_audio_pages)

        ogg = encode_ogg_opus(2, comments={"TITLE": "o"})
        mp3 = encode_mp3(2, tags={"TIT2": "m"})
        df = spark.createDataFrame(pd.DataFrame({
            "media_id": [1, 2, 3, 4],
            "payload": [ogg, mp3, b"junk", None],
        }))
        pages = index_audio_pages(df, on_error="null").collect()
        assert {r["media_id"] for r in pages} == {1} and len(pages) == 4
        # one tags surface across both audio containers
        tags = sorted(extract_audio_tags(df, on_error="null").collect(),
                      key=lambda r: r["media_id"])
        assert [(t["media_id"], t["tag"], t["value"]) for t in tags] == [
            (1, "TITLE", "o"), (2, "TIT2", "m"),
        ]
