"""SubRip (.srt) / WebVTT (.vtt) subtitle parsing for the
crawl-ingest tier.

Subtitle and caption tracks are a staple aligned-text source for LLM
training corpora (speech transcripts with timing), and the two
formats that carry almost all of them are SubRip and WebVTT (W3C).
This module writes and reads both for real: SRT's 1-based cue
counter, comma-millisecond timestamps, and blank-line framing; VTT's
magic header, dot-millisecond timestamps, optional cue identifiers,
cue settings after the timing line, and NOTE comment blocks.

Scope (loud, not silent): timestamps must parse exactly
(HH:MM:SS,mmm for SRT, [HH:]MM:SS.mmm for VTT), a cue whose end is
not after its start refuses, SRT counters must increment from 1,
VTT files must open with the WEBVTT magic, and a timing line without
``-->`` refuses. VTT STYLE/REGION blocks refuse (styling is out of
scope for a text-extraction pass, and skipping them silently would
hide cue-shaped payloads inside). Inline markup is NOT interpreted —
the text is returned as written (the honest posture for a routing /
extraction pass; entity decoding belongs to the consumer).

Public formats only: SubRip (de-facto spec), WebVTT (W3C
webvtt1). Reference analog: the opaque-bytes input contract at
/root/reference/mpMaster/master.go:77-89.
"""

from __future__ import annotations

import re

_SRT_TS = re.compile(r"^(\d{2}):(\d{2}):(\d{2}),(\d{3})$")
# VTT: hours optional, dot milliseconds
_VTT_TS = re.compile(r"^(?:(\d{2,}):)?(\d{2}):(\d{2})\.(\d{3})$")


def _fmt_srt_ts(ms: int) -> str:
    h, rem = divmod(ms, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, mil = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d},{mil:03d}"


def _fmt_vtt_ts(ms: int) -> str:
    h, rem = divmod(ms, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, mil = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}.{mil:03d}"


def _parse_srt_ts(tok: str) -> int:
    m = _SRT_TS.match(tok)
    if m is None:
        raise ValueError(f"malformed SRT timestamp {tok!r}")
    h, mi, s, mil = (int(g) for g in m.groups())
    if mi > 59 or s > 59:
        raise ValueError(f"SRT timestamp field out of range {tok!r}")
    return ((h * 60 + mi) * 60 + s) * 1000 + mil


def _parse_vtt_ts(tok: str) -> int:
    m = _VTT_TS.match(tok)
    if m is None:
        raise ValueError(f"malformed VTT timestamp {tok!r}")
    h = int(m.group(1)) if m.group(1) else 0
    mi, s, mil = int(m.group(2)), int(m.group(3)), int(m.group(4))
    if mi > 59 or s > 59:
        raise ValueError(f"VTT timestamp field out of range {tok!r}")
    return ((h * 60 + mi) * 60 + s) * 1000 + mil


# ------------------------------------------------------------ writer


def build_srt(cues: list[tuple[int, int, str]]) -> bytes:
    """cues: (start_ms, end_ms, text). Emits the SubRip grammar:
    counter, timing line, text, blank separator."""
    out = []
    for k, (start, end, text) in enumerate(cues):
        out.append(str(k + 1))
        out.append(f"{_fmt_srt_ts(start)} --> {_fmt_srt_ts(end)}")
        out.append(text)
        out.append("")
    return "\n".join(out).encode("utf-8")


def build_vtt(
    cues: list[tuple[int, int, str]],
    note: str | None = None,
    with_ids: bool = False,
    settings_every: int = 0,
) -> bytes:
    """WebVTT: magic header, optional NOTE block, cues with optional
    identifiers and cue settings (``align:start``) on every
    ``settings_every``-th cue."""
    out = ["WEBVTT", ""]
    if note is not None:
        out += ["NOTE " + note, ""]
    for k, (start, end, text) in enumerate(cues):
        if with_ids:
            out.append(f"cue-{k + 1}")
        timing = f"{_fmt_vtt_ts(start)} --> {_fmt_vtt_ts(end)}"
        if settings_every and k % settings_every == 0:
            timing += " align:start"
        out.append(timing)
        out.append(text)
        out.append("")
    return "\n".join(out).encode("utf-8")


# ------------------------------------------------------------ reader


def _blocks(text: str) -> list[list[str]]:
    """Blank-line-separated blocks of non-empty lines."""
    blocks: list[list[str]] = []
    cur: list[str] = []
    for line in text.replace("\r\n", "\n").replace("\r", "\n").split("\n"):
        if line.strip() == "":
            if cur:
                blocks.append(cur)
                cur = []
        else:
            cur.append(line)
    if cur:
        blocks.append(cur)
    return blocks


def _parse_timing(line: str, ts_fn) -> tuple[int, int, str]:
    """'<start> --> <end> [settings]' -> (start_ms, end_ms,
    settings). A cue that ends at or before its start refuses — a
    zero/negative-duration cue is corrupt timing, not a caption."""
    if "-->" not in line:
        raise ValueError(f"timing line without '-->': {line!r}")
    left, right = line.split("-->", 1)
    rtoks = right.split()
    if not rtoks:
        raise ValueError(f"timing line without an end time: {line!r}")
    start = ts_fn(left.strip())
    end = ts_fn(rtoks[0])
    if end <= start:
        raise ValueError(
            f"cue ends at or before its start ({line.strip()!r})"
        )
    return start, end, " ".join(rtoks[1:])


def parse_srt(payload: bytes) -> list[dict]:
    """SubRip: every block is 'counter / timing / text+'; counters
    must increment from 1 (a gap means cues were lost upstream)."""
    text = payload.decode("utf-8")
    cues = []
    for k, block in enumerate(_blocks(text)):
        if len(block) < 3:
            raise ValueError(
                f"SRT block {k + 1} has {len(block)} lines (need"
                " counter, timing, text)"
            )
        if not block[0].strip().isdigit():
            raise ValueError(f"SRT counter is not a number: {block[0]!r}")
        if int(block[0]) != k + 1:
            raise ValueError(
                f"SRT counter gap: block {k + 1} is numbered {block[0]}"
            )
        start, end, settings = _parse_timing(block[1], _parse_srt_ts)
        if settings:
            raise ValueError(
                f"SRT timing line carries trailing tokens {settings!r}"
            )
        cues.append(
            {
                "idx": k,
                "start_ms": start,
                "end_ms": end,
                "settings": "",
                "text": "\n".join(block[2:]),
            }
        )
    if not cues:
        raise ValueError("SRT file with no cues")
    return cues


def parse_vtt(payload: bytes) -> list[dict]:
    """WebVTT: WEBVTT magic, NOTE blocks skipped (comments), STYLE /
    REGION blocks refused (out of declared scope), cues with
    optional identifier lines and cue settings."""
    text = payload.decode("utf-8")
    if text.startswith("﻿"):
        text = text[1:]
    blocks = _blocks(text)
    if not blocks or not blocks[0][0].startswith("WEBVTT"):
        raise ValueError("not a WebVTT file (missing WEBVTT magic)")
    if len(blocks[0]) > 1:
        raise ValueError("content on the WEBVTT header block")
    cues = []
    for block in blocks[1:]:
        head = block[0]
        if head.startswith("NOTE"):
            continue  # comment block, spec-sanctioned skip
        if head.startswith(("STYLE", "REGION")):
            raise NotImplementedError(
                f"VTT {head.split()[0]} block (cue extraction only)"
            )
        body = block
        if "-->" not in body[0]:
            # optional cue identifier line
            if len(body) < 2 or "-->" not in body[1]:
                raise ValueError(
                    f"VTT cue block without a timing line: {body[0]!r}"
                )
            body = body[1:]
        start, end, settings = _parse_timing(body[0], _parse_vtt_ts)
        if len(body) < 2:
            raise ValueError("VTT cue with no text payload")
        cues.append(
            {
                "idx": len(cues),
                "start_ms": start,
                "end_ms": end,
                "settings": settings,
                "text": "\n".join(body[1:]),
            }
        )
    if not cues:
        raise ValueError("VTT file with no cues")
    return cues


def parse_subtitles(payload: bytes, name: str) -> tuple[str, list[dict]]:
    """Route by extension, the way a crawl pipeline routes its
    sidecar files. Returns (format, cues)."""
    if name.endswith(".srt"):
        return "srt", parse_srt(payload)
    if name.endswith(".vtt"):
        return "vtt", parse_vtt(payload)
    raise ValueError(f"unknown subtitle extension on {name!r}")
