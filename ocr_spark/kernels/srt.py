"""SRT subtitle alignment parsing — the reference's MKV subtitle flow
(`parse_subtitles`, /root/reference/utils/audio/mkv_utils.py:123-180):
blocks of `index / HH:MM:SS,mmm --> HH:MM:SS,mmm / text lines`, with
JOIN semantics (consecutive cues closer than ``join_threshold`` merge
into one speaker alignment) and ``add_time`` padding before/after each
alignment, end clamped to the next cue's start.

Re-expressed in integer MILLISECONDS (the vtt.py discipline) so every
alignment is a pure integer function of the bytes — the reference's
float-seconds arithmetic is ms-exact for ms-precision inputs. The
control flow mirrors the reference exactly, including its edge rules:
cue-index lines are any all-digit line, the FIRST alignment's start is
clamped at the previous end (0), and the LAST alignment's end gets
``add_time`` added unconditionally (no clamp — there is no next cue).
"""

from __future__ import annotations


def _time_ms(t: str) -> int:
    """'HH:MM:SS,mmm' (or '.' separator) -> integer milliseconds."""
    h, m, s = t.strip().split(":")
    s = s.replace(",", ".")
    if "." in s:
        sec, frac = s.split(".", 1)
        ms = int((frac + "000")[:3])
    else:
        sec, ms = s, 0
    return (int(h) * 3600 + int(m) * 60 + int(sec)) * 1000 + ms


def parse_srt(
    body: str, *, join_threshold_ms: int = 0, add_time_ms: int = 500
) -> list[dict]:
    """SRT text -> [{seq, start_ms, end_ms, dur_ms, text}] alignments.

    Mirrors the reference loop: a blank or all-digit line resets the
    block; the first contentful line of a block must be the timing line
    (malformed timing lines drop their block — tolerant, never raises);
    further lines accumulate as text joined by ' '. A new cue whose gap
    from the running end exceeds ``join_threshold_ms`` (or any cue when
    the threshold is <= 0) flushes the accumulated alignment with
    end = min(running_end + add_time, new_start) and the next start =
    max(flushed_end, new_start - add_time)."""
    infos: list[dict] = []
    status = 0
    text: list[str] = []
    debut = 0
    fin = 0
    for raw in body.split("\n"):
        line = raw.strip("\r")
        if not line or line.isdigit():
            status = 0
            continue
        status += 1
        if status == 1:
            if "-->" not in line:
                # malformed timing line: drop this block's accumulation
                status = 0
                continue
            try:
                d, f = [_time_ms(t) for t in line.split("-->")]
            except (ValueError, IndexError):
                status = 0
                continue
            if join_threshold_ms <= 0 or abs(fin - d) > join_threshold_ms:
                if text:
                    fin = min(fin + add_time_ms, d)
                    infos.append(
                        {
                            "start_ms": debut,
                            "end_ms": fin,
                            "dur_ms": fin - debut,
                            "text": " ".join(text),
                        }
                    )
                text, debut = [], max(fin, d - add_time_ms)
                fin = 0
            fin = f
        else:
            text.append(line)
    if text:
        fin += add_time_ms
        infos.append(
            {
                "start_ms": debut,
                "end_ms": fin,
                "dur_ms": fin - debut,
                "text": " ".join(text),
            }
        )
    for i, a in enumerate(infos):
        a["seq"] = i
    return infos
