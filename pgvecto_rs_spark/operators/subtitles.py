"""Sidecar subtitle parsing: SubRip (SRT) and WebVTT.

Video corpora ship aligned text as sidecar files at least as often as
in-container tracks; together with the MP4 tx3g extractor this makes
caption harvesting complete across the common carriers.  Both parsers
are exact and strict-but-tolerant in the way real files demand: CRLF
or LF, UTF-8 BOM, multi-line cue payloads, WebVTT NOTE/STYLE/REGION
blocks and cue-settings after the arrow; anything structurally broken
(bad timestamp, end before start, missing arrow) raises ValueError
into the same ``on_error`` ingest policy as the codec family.

Formatter twins (``format_srt`` / ``format_webvtt``) write spec-shaped
files so fixtures and oracles are real round-trips.

Reference parity: N/A — /root/reference (pgvecto.rs) has no media
surface; engine extension like ``operators.mp4``/``h264``.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "format_srt",
    "format_webvtt",
    "parse_srt",
    "parse_webvtt",
    "subtitle_cues",
]

# SRT uses a comma before the millis, WebVTT a dot; WebVTT also allows
# dropping the hours field.
_TS_SRT = re.compile(r"^(\d{1,2}):([0-5]\d):([0-5]\d),(\d{3})$")
_TS_VTT = re.compile(r"^(?:(\d{1,4}):)?([0-5]\d):([0-5]\d)\.(\d{3})$")


def _ts_ms(tok: str, vtt: bool) -> int:
    m = (_TS_VTT if vtt else _TS_SRT).match(tok.strip())
    if not m:
        raise ValueError(f"subtitles: bad timestamp {tok!r}")
    h, mi, s, ms = (int(g) if g is not None else 0 for g in m.groups())
    return ((h * 60 + mi) * 60 + s) * 1000 + ms


def _fmt_ms(ms: int, vtt: bool) -> str:
    if ms < 0:
        raise ValueError("subtitles: negative timestamp")
    h, rem = divmod(ms, 3600_000)
    mi, rem = divmod(rem, 60_000)
    s, milli = divmod(rem, 1000)
    sep = "." if vtt else ","
    return f"{h:02d}:{mi:02d}:{s:02d}{sep}{milli:03d}"


def _blocks(text: str) -> list[list[str]]:
    lines = text.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    out: list[list[str]] = []
    cur: list[str] = []
    for ln in lines:
        if ln.strip() == "":
            if cur:
                out.append(cur)
                cur = []
        else:
            cur.append(ln)
    if cur:
        out.append(cur)
    return out


def parse_srt(text: str) -> list[tuple[int, int, int, str]]:
    """SubRip -> [(cue_no, start_ms, end_ms, text), ...].

    Blocks are ``index / start --> end / payload...`` separated by
    blank lines; the numeric index line is validated but the RETURNED
    cue_no is the 1-based position (real files renumber sloppily).
    """
    if text.startswith("﻿"):
        text = text[1:]
    cues = []
    for block in _blocks(text):
        if len(block) < 2:
            raise ValueError("subtitles: SRT block too short")
        body = block[1:]
        if not block[0].strip().isdigit():
            raise ValueError(f"subtitles: bad SRT index line {block[0]!r}")
        if "-->" not in body[0]:
            raise ValueError("subtitles: SRT block missing timing line")
        start_tok, _, end_tok = body[0].partition("-->")
        start, end = _ts_ms(start_tok, False), _ts_ms(end_tok, False)
        if end < start:
            raise ValueError("subtitles: cue ends before it starts")
        cues.append((len(cues) + 1, start, end, "\n".join(body[1:])))
    return cues


def parse_webvtt(text: str) -> list[tuple[int, int, int, str]]:
    """WebVTT -> [(cue_no, start_ms, end_ms, text), ...].

    Requires the WEBVTT signature; skips NOTE/STYLE/REGION blocks;
    tolerates optional cue identifier lines and cue settings after the
    end timestamp; hours field optional in timestamps.
    """
    if text.startswith("﻿"):
        text = text[1:]
    blocks = _blocks(text)
    if not blocks or not blocks[0][0].startswith("WEBVTT"):
        raise ValueError("subtitles: missing WEBVTT signature")
    blocks[0] = blocks[0][1:]  # header block may carry metadata lines
    cues = []
    for bi, block in enumerate(blocks):
        if not block:
            continue
        if bi > 0 and block[0].split(None, 1)[0] in ("NOTE", "STYLE", "REGION"):
            continue
        timing = 0 if "-->" in block[0] else 1
        if timing >= len(block) or "-->" not in block[timing]:
            if bi == 0:
                continue  # header metadata only
            raise ValueError("subtitles: WebVTT cue missing timing line")
        start_tok, _, rest = block[timing].partition("-->")
        end_tok = rest.strip().split(None, 1)[0]  # drop cue settings
        start, end = _ts_ms(start_tok, True), _ts_ms(end_tok, True)
        if end < start:
            raise ValueError("subtitles: cue ends before it starts")
        cues.append((len(cues) + 1, start, end,
                     "\n".join(block[timing + 1 :])))
    return cues


def format_srt(cues: list[tuple[int, int, str]]) -> str:
    """[(start_ms, end_ms, text), ...] -> SubRip text (twin)."""
    out = []
    for i, (start, end, text) in enumerate(cues):
        out.append(
            f"{i + 1}\n{_fmt_ms(start, False)} --> {_fmt_ms(end, False)}\n"
            f"{text}\n"
        )
    return "\n".join(out)


def format_webvtt(cues: list[tuple[int, int, str]]) -> str:
    """[(start_ms, end_ms, text), ...] -> WebVTT text (twin)."""
    out = ["WEBVTT\n"]
    for start, end, text in cues:
        out.append(
            f"{_fmt_ms(start, True)} --> {_fmt_ms(end, True)}\n{text}\n"
        )
    return "\n".join(out)


def subtitle_cues(
    df: DataFrame,
    text_col: str = "subtitle",
    id_col: str = "media_id",
    fmt: str = "auto",
    on_error: str = "raise",
) -> DataFrame:
    """(id, cue_no, start_ms, end_ms, text): cue rows from sidecar
    subtitle text.  ``fmt``: "srt", "webvtt", or "auto" (sniff the
    WEBVTT signature).  NULL inputs are skipped; malformed ones follow
    ``on_error`` ("raise" | "null" drops the whole payload) — the same
    ingest policy as the codec family.  mapInPandas Arrow batches; the
    explode happens batch-side, one output row per cue."""
    return df.mapInPandas(*subtitle_cues_op(text_col, id_col, fmt, on_error))


def subtitle_cues_op(
    text_col: str = "subtitle",
    id_col: str = "media_id",
    fmt: str = "auto",
    on_error: str = "raise",
) -> tuple:
    """(batch_fn, schema) behind :func:`subtitle_cues` — exposed (r13,
    guide §4) so fused synth+parse stages can run the identical batch
    function in the task that formatted the sidecar."""
    if fmt not in ("auto", "srt", "webvtt"):
        raise ValueError(f"subtitle_cues: unknown fmt {fmt!r}")
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    skip = on_error == "null"
    out_schema = (
        f"{id_col} bigint, cue_no int, start_ms bigint, end_ms bigint, "
        "text string"
    )

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[tuple] = []
            for mid, t in zip(pdf[id_col], pdf[text_col]):
                if t is None:
                    continue
                t = str(t)
                use_vtt = fmt == "webvtt" or (
                    fmt == "auto" and t.lstrip("﻿").startswith("WEBVTT")
                )
                try:
                    cues = parse_webvtt(t) if use_vtt else parse_srt(t)
                except ValueError:
                    if skip:
                        continue
                    raise
                rows.extend((int(mid), no, s, e, txt)
                            for no, s, e, txt in cues)
            cols = list(zip(*rows)) if rows else [[] for _ in range(5)]
            yield pd.DataFrame(
                {
                    id_col: pd.Series(cols[0], dtype="int64"),
                    "cue_no": pd.Series(cols[1], dtype="int32"),
                    "start_ms": pd.Series(cols[2], dtype="int64"),
                    "end_ms": pd.Series(cols[3], dtype="int64"),
                    "text": pd.Series(cols[4], dtype="object"),
                }
            )

    return op, out_schema
