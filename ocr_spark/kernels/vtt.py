"""WebVTT subtitle parsing — the text-track companion of the AVI/WAV
codecs: crawl corpora carry .vtt files alongside media, and aligning
transcript text to frame timestamps is a standard multimodal-pipeline
step.

Tolerant line-oriented parse (W3C WebVTT): optional ``WEBVTT`` header,
cue blocks of ``[id\\n] HH:MM:SS.mmm --> HH:MM:SS.mmm [settings]`` plus
text lines until a blank line. NOTE/STYLE/REGION blocks are skipped.
Timestamps come back as exact integer milliseconds (MM:SS.mmm short form
accepted). Malformed cues are dropped — fewer rows, never an error.
"""

from __future__ import annotations

import re

_TS = r"(?:(\d+):)?(\d{1,2}):(\d{2})\.(\d{3})"
_CUE_RE = re.compile(rf"^\s*{_TS}\s*-->\s*{_TS}")


def _ms(h: str | None, m: str, s: str, ms: str) -> int:
    return ((int(h or 0) * 60 + int(m)) * 60 + int(s)) * 1000 + int(ms)


def parse_vtt(body: str | bytes) -> list[dict]:
    """One .vtt body -> [{cue_idx, start_ms, end_ms, text}] in order.
    ``text`` joins the cue's payload lines with '\\n'."""
    if isinstance(body, bytes):
        if body[:3] == b"\xef\xbb\xbf":
            body = body[3:]
        body = body.decode("utf-8", "replace")
    cues: list[dict] = []
    lines = body.splitlines()
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        m = _CUE_RE.match(line)
        if not m:
            # skip block bodies (NOTE/STYLE/ids); cue timing lines are the
            # only anchor we trust
            i += 1
            continue
        start = _ms(*m.groups()[:4])
        end = _ms(*m.groups()[4:])
        i += 1
        text_lines = []
        while i < n and lines[i].strip():
            text_lines.append(lines[i])
            i += 1
        if end >= start and text_lines:
            cues.append(
                {
                    "cue_idx": len(cues),
                    "start_ms": start,
                    "end_ms": end,
                    "text": "\n".join(text_lines),
                }
            )
    return cues
