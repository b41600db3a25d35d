"""Subtitle cue readers — SubRip (.srt) and WebVTT (W3C spec).

Subtitles are how video becomes TEXT training data: every cue is a
(start, end, text) span that joins back to the frame rows the
container demuxers (mp4/mkv) emit — caption-to-frame alignment is a
time-window join on (media_id, dts). Covered: SRT cue blocks
(index line, ``HH:MM:SS,mmm --> HH:MM:SS,mmm`` with optional
position suffix, multi-line payload, blank-line separation, BOM,
CRLF/LF), WebVTT (header line, optional cue identifiers, ``.``
second separators, hour field optional, NOTE/STYLE/REGION blocks
skipped), and basic markup stripping (``<i>``/``<b>``/voice tags)
into a clean-text column alongside the raw payload.

Emits one typed row per cue via Arrow ``mapInPandas`` — the same
binary-payload-per-row ingest shape as the WARC/archive readers.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


class SubtitleError(ValueError):
    """Typed subtitle format error."""


_SRT_TIME = re.compile(
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})\s*-->\s*"
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})"
)
_VTT_TIME = re.compile(
    r"(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})\s*-->\s*"
    r"(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})"
)
_TAGS = re.compile(r"</?[^>]*>")


def _ms(hh, mm, ss, mmm) -> int:
    return ((int(hh or 0) * 60 + int(mm)) * 60 + int(ss)) * 1000 + int(mmm)


def parse_srt(text: str) -> list[dict]:
    """SubRip cues -> [{idx, start_ms, end_ms, text}]."""
    text = text.lstrip("﻿")
    cues = []
    for block in re.split(r"(?:\r?\n){2,}", text.strip()):
        lines = [ln.rstrip("\r") for ln in block.split("\n")]
        if not lines or not lines[0].strip():
            continue
        li = 0
        idx = None
        if lines[0].strip().isdigit():
            idx = int(lines[0].strip())
            li = 1
        if li >= len(lines):
            raise SubtitleError(f"SRT cue {idx} missing its timing line")
        m = _SRT_TIME.search(lines[li])
        if not m:
            raise SubtitleError(
                f"bad SRT timing line {lines[li][:40]!r}"
            )
        g = m.groups()
        cues.append({
            "idx": idx if idx is not None else len(cues) + 1,
            "start_ms": _ms(g[0], g[1], g[2], g[3]),
            "end_ms": _ms(g[4], g[5], g[6], g[7]),
            "text": "\n".join(lines[li + 1:]).strip(),
        })
    if not cues:
        raise SubtitleError("no SRT cues found")
    return cues


def parse_vtt(text: str) -> list[dict]:
    """WebVTT cues -> [{idx, start_ms, end_ms, text}] (NOTE/STYLE/
    REGION blocks skipped; cue identifiers allowed)."""
    text = text.lstrip("﻿")
    blocks = re.split(r"(?:\r?\n){2,}", text.strip())
    if not blocks or not blocks[0].startswith("WEBVTT"):
        raise SubtitleError("missing WEBVTT header")
    cues = []
    for block in blocks[1:]:
        lines = [ln.rstrip("\r") for ln in block.split("\n")]
        if not lines:
            continue
        head = lines[0].strip()
        if head.startswith(("NOTE", "STYLE", "REGION")):
            continue
        li = 0
        if "-->" not in lines[0]:
            li = 1  # cue identifier line
            if li >= len(lines) or "-->" not in lines[li]:
                raise SubtitleError(
                    f"VTT block without a timing line: {head[:40]!r}"
                )
        m = _VTT_TIME.search(lines[li])
        if not m:
            raise SubtitleError(f"bad VTT timing line {lines[li][:40]!r}")
        g = m.groups()
        cues.append({
            "idx": len(cues) + 1,
            "start_ms": _ms(g[0], g[1], g[2], g[3]),
            "end_ms": _ms(g[4], g[5], g[6], g[7]),
            "text": "\n".join(lines[li + 1:]).strip(),
        })
    if not cues:
        raise SubtitleError("no WebVTT cues found")
    return cues


def strip_markup(s: str) -> str:
    """Remove ``<i>``/``<b>``/``<v Speaker>``-style cue markup."""
    return _TAGS.sub("", s)


CUE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("fmt", StringType()),
        StructField("cue_idx", LongType()),
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("start_s", DoubleType()),
        StructField("duration_ms", LongType()),
        StructField("raw_text", StringType()),
        StructField("text", StringType()),
    ]
)


def read_subtitles(df: DataFrame) -> DataFrame:
    """(media_id, payload) -> one row per cue, format sniffed
    (WEBVTT header vs SRT), with both the raw payload text and the
    markup-stripped clean text. ``start_s`` is the join key against
    the demuxers' ``dts_s`` frame timestamps."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                text = bytes(raw).decode("utf-8", "replace")
                probe = text.lstrip("﻿")
                if probe.startswith("WEBVTT"):
                    fmt, cues = "vtt", parse_vtt(text)
                else:
                    fmt, cues = "srt", parse_srt(text)
                for c in cues:
                    rows.append((
                        mid, fmt, c["idx"], c["start_ms"], c["end_ms"],
                        c["start_ms"] / 1000.0,
                        c["end_ms"] - c["start_ms"],
                        c["text"], strip_markup(c["text"]),
                    ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in CUE_SCHEMA.fields]
            )

    return df.mapInPandas(batches, CUE_SCHEMA)
