"""Sidecar subtitle parsing (operators/subtitles.py): round-trips,
format tolerances, rejection contract, Spark op ingest policy.

Reference parity: N/A — engine extension like the other codecs."""

from __future__ import annotations

import pytest

from pgvecto_rs_spark.operators.subtitles import (
    format_srt,
    format_webvtt,
    parse_srt,
    parse_webvtt,
    subtitle_cues,
)


class TestParsers:
    def test_srt_round_trip(self):
        cues = [(0, 1200, "hello\nworld"), (2000, 3500, "café ☕"),
                (3_661_000, 3_662_000, "past the hour")]
        got = parse_srt(format_srt(cues))
        assert [(c[1], c[2], c[3]) for c in got] == cues
        assert [c[0] for c in got] == [1, 2, 3]

    def test_webvtt_round_trip(self):
        cues = [(0, 1200, "a"), (3_590_000, 3_600_500, "hour crossing")]
        got = parse_webvtt(format_webvtt(cues))
        assert [(c[1], c[2], c[3]) for c in got] == cues

    def test_crlf_bom_and_sloppy_numbering(self):
        srt = "﻿7\r\n00:00:01,000 --> 00:00:02,000\r\nx\r\n\r\n3\r\n00:00:03,000 --> 00:00:04,000\r\ny\r\n"
        got = parse_srt(srt)
        # returned cue_no is positional, not the file's index line
        assert [(c[0], c[3]) for c in got] == [(1, "x"), (2, "y")]

    def test_webvtt_extras(self):
        vtt = ("WEBVTT - with metadata\nKind: captions\n\n"
               "NOTE a comment\nover two lines\n\n"
               "STYLE\n::cue { color: red }\n\n"
               "cue-id-1\n00:05.000 --> 00:06.500 align:start line:0\n"
               "short timestamps\n\n"
               "00:59:59.999 --> 01:00:00.001\nboundary\n")
        got = parse_webvtt(vtt)
        assert got == [
            (1, 5000, 6500, "short timestamps"),
            (2, 3_599_999, 3_600_001, "boundary"),
        ]

    def test_rejections(self):
        with pytest.raises(ValueError, match="timestamp"):
            parse_srt("1\n00:00:00,00 --> 00:00:01,000\nx")
        with pytest.raises(ValueError, match="timing"):
            parse_srt("1\njust text")
        with pytest.raises(ValueError, match="index"):
            parse_srt("not a number\n00:00:00,000 --> 00:00:01,000\nx")
        with pytest.raises(ValueError, match="ends before"):
            parse_srt("1\n00:00:02,000 --> 00:00:01,000\nx")
        with pytest.raises(ValueError, match="WEBVTT"):
            parse_webvtt("1\n00:00:00.000 --> 00:00:01.000\nx")
        with pytest.raises(ValueError, match="timestamp"):
            parse_webvtt("WEBVTT\n\n00:00:00,000 --> 00:00:01,000\nx")

    def test_fuzz_exception_contract(self):
        import numpy as np

        rng = np.random.default_rng(17)
        good = format_srt([(0, 1000, "one"), (2000, 3000, "two")]).encode()
        for _ in range(300):
            bad = bytearray(good)
            for _k in range(int(rng.integers(1, 4))):
                bad[int(rng.integers(0, len(bad)))] = int(rng.integers(32, 127))
            try:
                parse_srt(bad.decode("utf-8", "replace"))
            except ValueError:
                pass  # the documented contract — never another exception


class TestSparkOp:
    def test_cues_and_null_policy(self, spark):
        import pandas as pd

        srt = format_srt([(1000, 2000, "a"), (3000, 4000, "b\nc")])
        vtt = format_webvtt([(500, 900, "v")])
        df = spark.createDataFrame(pd.DataFrame({
            "media_id": [1, 2, 3, 4],
            "subtitle": [srt, vtt, "garbage -->", None],
        }))
        with pytest.raises(Exception):
            subtitle_cues(df).collect()
        out = sorted(subtitle_cues(df, on_error="null").collect(),
                     key=lambda r: (r["media_id"], r["cue_no"]))
        assert [(r["media_id"], r["cue_no"], r["start_ms"], r["end_ms"],
                 r["text"]) for r in out] == [
            (1, 1, 1000, 2000, "a"), (1, 2, 3000, 4000, "b\nc"),
            (2, 1, 500, 900, "v"),
        ]

    def test_explicit_fmt(self, spark):
        import pandas as pd

        vtt = format_webvtt([(0, 100, "x")])
        df = spark.createDataFrame(pd.DataFrame(
            {"media_id": [1], "subtitle": [vtt]}))
        assert subtitle_cues(df, fmt="webvtt").count() == 1
        with pytest.raises(Exception):  # VTT parsed as SRT fails loudly
            subtitle_cues(df, fmt="srt").collect()
