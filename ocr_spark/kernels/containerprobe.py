"""MP4 / WebM container METADATA probes (VERDICT r04 #7).

Real crawls carry MP4 and WebM video; full pure-Python decode of those
codecs is out of clean-room budget (the documented NotImplementedError
boundary in operators/multimodal.decode_image stays), but the METADATA
half — duration, track layout, codec ids, dimensions — needs only the
container walk:

- MP4/ISO-BMFF: a box (atom) walk — ``size(4) fourcc(4) payload`` with
  1-meaning-largesize and 0-meaning-to-EOF handled — down the
  ``moov > mvhd / trak > tkhd + mdia > (mdhd, hdlr, minf > stbl > stsd)``
  spine (ISO/IEC 14496-12 §8).
- WebM/Matroska: an EBML walk — variable-length ids + VINT sizes — down
  ``Segment > Info (TimecodeScale, Duration) / Tracks > TrackEntry
  (TrackNumber, TrackType, CodecID, Video > PixelWidth/PixelHeight)``.

Both probes are tolerant: truncated/garbage bytes yield the fields that
parsed, never an exception (the blob_metadata discipline). The builders
exist for the by-construction contract oracle (q_video_meta) and tests —
the probe is the product.

Reference parity: the reference reads video through a blocking ffmpeg
reader (/root/reference/utils/image/video/ffmpeg_reader.py:1-214) which
surfaces the same stream metadata (duration/codec/size) from the
container before decode; this module is the decode-free half of that
surface, clean-room from the specs.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# MP4 (ISO base media file format)
# ---------------------------------------------------------------------------

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _mp4_box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def mp4_build(
    *,
    major_brand: str = "isom",
    timescale: int = 600,
    duration_ticks: int = 600,
    tracks: list[dict] | None = None,
) -> bytes:
    """Minimal spec-shaped MP4: ftyp + moov(mvhd, trak*). Each track dict:
    ``{"track_type": "video"|"audio", "codec": fourcc, "width": int,
    "height": int}`` (width/height used for video only)."""
    tracks = tracks if tracks is not None else []
    ftyp = _mp4_box(
        b"ftyp", major_brand.encode()[:4].ljust(4) + b"\x00\x00\x02\x00" + b"isom"
    )
    mvhd = _mp4_box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # ctime mtime
        + struct.pack(">II", timescale, duration_ticks)
        + struct.pack(">i", 0x00010000)  # rate 1.0
        + struct.pack(">h", 0x0100)  # volume 1.0
        + b"\x00" * 10  # reserved
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # predefined
        + struct.pack(">I", len(tracks) + 1),  # next track id
    )
    traks = []
    for i, t in enumerate(tracks):
        video = t["track_type"] == "video"
        w = int(t.get("width", 0)) if video else 0
        h = int(t.get("height", 0)) if video else 0
        tkhd = _mp4_box(
            b"tkhd",
            b"\x00\x00\x00\x07"
            + struct.pack(">II", 0, 0)
            + struct.pack(">I", i + 1)  # track id
            + b"\x00" * 4
            + struct.pack(">I", duration_ticks)
            + b"\x00" * 8
            + struct.pack(">hhh", 0, 0, 0x0100 if not video else 0)
            + b"\x00" * 2
            + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w << 16, h << 16),  # 16.16 fixed
        )
        mdhd = _mp4_box(
            b"mdhd",
            b"\x00\x00\x00\x00"
            + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, duration_ticks)
            + struct.pack(">HH", 0x55C4, 0),  # language 'und'
        )
        handler = b"vide" if video else b"soun"
        hdlr = _mp4_box(
            b"hdlr",
            b"\x00\x00\x00\x00" + b"\x00" * 4 + handler + b"\x00" * 12 + b"\x00",
        )
        entry = _mp4_box(t["codec"].encode()[:4].ljust(4), b"\x00" * 8)
        stsd = _mp4_box(b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1) + entry)
        stbl = _mp4_box(b"stbl", stsd)
        minf = _mp4_box(b"minf", stbl)
        mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
        traks.append(_mp4_box(b"trak", tkhd + mdia))
    moov = _mp4_box(b"moov", mvhd + b"".join(traks))
    return ftyp + moov


def _mp4_walk(buf: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for each box; tolerant of
    truncation (a box whose declared size overruns is clamped)."""
    while pos + 8 <= end:
        size = struct.unpack(">I", buf[pos : pos + 4])[0]
        fourcc = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            size = struct.unpack(">Q", buf[pos + 8 : pos + 16])[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8:
            return  # corrupt size: stop the walk rather than loop
        box_end = min(pos + size, end)
        yield fourcc, body, box_end
        pos += size


def _mp4_find(buf: bytes, pos: int, end: int, fourcc: bytes):
    for fc, b, e in _mp4_walk(buf, pos, end):
        if fc == fourcc:
            return b, e
    return None


def mp4_probe(blob: bytes) -> dict:
    """Tolerant metadata walk -> {container, major_brand, timescale,
    duration_ms, tracks: [{track_no, track_type, codec, width, height}]}.
    Fields that fail to parse stay at their defaults."""
    out = {
        "container": "mp4",
        "major_brand": "",
        "timescale": 0,
        "duration_ms": 0,
        "tracks": [],
    }
    end = len(blob)
    try:
        ft = _mp4_find(blob, 0, end, b"ftyp")
        if ft:
            out["major_brand"] = blob[ft[0] : ft[0] + 4].decode("ascii", "replace")
        moov = _mp4_find(blob, 0, end, b"moov")
        if not moov:
            return out
        mvhd = _mp4_find(blob, moov[0], moov[1], b"mvhd")
        if mvhd:
            b = blob[mvhd[0] : mvhd[1]]
            version = b[0]
            if version == 1:
                ts, dur = struct.unpack(">IQ", b[20:32])
            else:
                ts, dur = struct.unpack(">II", b[12:20])
            out["timescale"] = ts
            out["duration_ms"] = (dur * 1000) // ts if ts else 0
        track_no = 0
        for fc, tb, te in _mp4_walk(blob, moov[0], moov[1]):
            if fc != b"trak":
                continue
            track_no += 1
            tr = {
                "track_no": track_no,
                "track_type": "unknown",
                "codec": "",
                "width": 0,
                "height": 0,
            }
            tkhd = _mp4_find(blob, tb, te, b"tkhd")
            if tkhd:
                b = blob[tkhd[0] : tkhd[1]]
                # width/height are the LAST two 16.16 fixed fields
                if len(b) >= 8:
                    w, h = struct.unpack(">II", b[-8:])
                    tr["width"] = w >> 16
                    tr["height"] = h >> 16
            mdia = _mp4_find(blob, tb, te, b"mdia")
            if mdia:
                hdlr = _mp4_find(blob, mdia[0], mdia[1], b"hdlr")
                if hdlr:
                    handler = blob[hdlr[0] + 8 : hdlr[0] + 12]
                    tr["track_type"] = {b"vide": "video", b"soun": "audio"}.get(
                        handler, "unknown"
                    )
                minf = _mp4_find(blob, mdia[0], mdia[1], b"minf")
                stbl = minf and _mp4_find(blob, minf[0], minf[1], b"stbl")
                stsd = stbl and _mp4_find(blob, stbl[0], stbl[1], b"stsd")
                if stsd:
                    # first sample entry after the 8-byte stsd full header
                    first = next(
                        iter(_mp4_walk(blob, stsd[0] + 8, stsd[1])), None
                    )
                    if first:
                        tr["codec"] = first[0].decode("ascii", "replace")
            out["tracks"].append(tr)
    except (struct.error, IndexError):
        pass
    return out


# ---------------------------------------------------------------------------
# WebM / Matroska (EBML)
# ---------------------------------------------------------------------------

_EBML = b"\x1a\x45\xdf\xa3"
_SEGMENT = b"\x18\x53\x80\x67"
_INFO = b"\x15\x49\xa9\x66"
_TIMECODESCALE = b"\x2a\xd7\xb1"
_DURATION = b"\x44\x89"
_TRACKS = b"\x16\x54\xae\x6b"
_TRACKENTRY = b"\xae"
_TRACKNUMBER = b"\xd7"
_TRACKTYPE = b"\x83"
_CODECID = b"\x86"
_VIDEO = b"\xe0"
_PIXELWIDTH = b"\xb0"
_PIXELHEIGHT = b"\xba"
_DOCTYPE = b"\x42\x82"


def _vint(n: int) -> bytes:
    """EBML size encoding: marker bit in the first byte gives the length."""
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            bits = n | (1 << (7 * length))
            return bits.to_bytes(length, "big")
    raise ValueError("vint overflow")


def _elem(eid: bytes, payload: bytes) -> bytes:
    return eid + _vint(len(payload)) + payload


def _uint_bytes(n: int) -> bytes:
    length = max(1, (n.bit_length() + 7) // 8)
    return n.to_bytes(length, "big")


def webm_build(
    *, doc_type: str = "webm", timecode_scale: int = 1_000_000,
    duration_ticks: int = 1000, tracks: list[dict] | None = None,
) -> bytes:
    """Minimal spec-shaped WebM: EBML header + Segment(Info, Tracks)."""
    tracks = tracks if tracks is not None else []
    header = _elem(_EBML, _elem(_DOCTYPE, doc_type.encode()))
    info = _elem(
        _INFO,
        _elem(_TIMECODESCALE, _uint_bytes(timecode_scale))
        + _elem(_DURATION, struct.pack(">d", float(duration_ticks))),
    )
    entries = b""
    for i, t in enumerate(tracks):
        video = t["track_type"] == "video"
        body = (
            _elem(_TRACKNUMBER, _uint_bytes(i + 1))
            + _elem(_TRACKTYPE, _uint_bytes(1 if video else 2))
            + _elem(_CODECID, t["codec"].encode())
        )
        if video:
            body += _elem(
                _VIDEO,
                _elem(_PIXELWIDTH, _uint_bytes(int(t.get("width", 0))))
                + _elem(_PIXELHEIGHT, _uint_bytes(int(t.get("height", 0)))),
            )
        entries += _elem(_TRACKENTRY, body)
    segment = _elem(_SEGMENT, info + _elem(_TRACKS, entries))
    return header + segment


def _ebml_walk(buf: bytes, pos: int, end: int):
    """Yield (id_bytes, payload_start, payload_end); tolerant of
    truncation and unknown-size (all-ones VINT) elements."""
    while pos < end:
        first = buf[pos]
        id_len = 1
        for bit in range(4):
            if first & (0x80 >> bit):
                id_len = bit + 1
                break
        else:
            return
        if pos + id_len > end:
            return
        eid = buf[pos : pos + id_len]
        pos += id_len
        if pos >= end:
            return
        sz_first = buf[pos]
        sz_len = 0
        for bit in range(8):
            if sz_first & (0x80 >> bit):
                sz_len = bit + 1
                break
        if sz_len == 0 or pos + sz_len > end:
            return
        raw = int.from_bytes(buf[pos : pos + sz_len], "big")
        size = raw - (1 << (7 * sz_len))
        pos += sz_len
        if size == (1 << (7 * sz_len)) - 1:  # unknown size: to end
            size = end - pos
        payload_end = min(pos + size, end)
        yield eid, pos, payload_end
        pos = payload_end


def _ebml_find(buf: bytes, pos: int, end: int, eid: bytes):
    for i, b, e in _ebml_walk(buf, pos, end):
        if i == eid:
            return b, e
    return None


def webm_probe(blob: bytes) -> dict:
    """Tolerant EBML metadata walk (same output shape as mp4_probe;
    ``timescale`` reports the TimecodeScale in ns)."""
    out = {
        "container": "webm",
        "major_brand": "",
        "timescale": 0,
        "duration_ms": 0,
        "tracks": [],
    }
    end = len(blob)
    try:
        hdr = _ebml_find(blob, 0, end, _EBML)
        if hdr:
            dt = _ebml_find(blob, hdr[0], hdr[1], _DOCTYPE)
            if dt:
                out["major_brand"] = blob[dt[0] : dt[1]].decode("ascii", "replace")
        seg = _ebml_find(blob, 0, end, _SEGMENT)
        if not seg:
            return out
        scale = 1_000_000
        info = _ebml_find(blob, seg[0], seg[1], _INFO)
        if info:
            ts = _ebml_find(blob, info[0], info[1], _TIMECODESCALE)
            if ts:
                scale = int.from_bytes(blob[ts[0] : ts[1]], "big")
            out["timescale"] = scale
            dur = _ebml_find(blob, info[0], info[1], _DURATION)
            if dur:
                raw = blob[dur[0] : dur[1]]
                ticks = struct.unpack(
                    ">d" if len(raw) == 8 else ">f", raw
                )[0]
                out["duration_ms"] = (int(ticks) * scale) // 1_000_000
        tracks = _ebml_find(blob, seg[0], seg[1], _TRACKS)
        if tracks:
            track_no = 0
            for eid, tb, te in _ebml_walk(blob, tracks[0], tracks[1]):
                if eid != _TRACKENTRY:
                    continue
                track_no += 1
                tr = {
                    "track_no": track_no,
                    "track_type": "unknown",
                    "codec": "",
                    "width": 0,
                    "height": 0,
                }
                tt = _ebml_find(blob, tb, te, _TRACKTYPE)
                if tt:
                    tr["track_type"] = {1: "video", 2: "audio"}.get(
                        int.from_bytes(blob[tt[0] : tt[1]], "big"), "unknown"
                    )
                cid = _ebml_find(blob, tb, te, _CODECID)
                if cid:
                    tr["codec"] = blob[cid[0] : cid[1]].decode("ascii", "replace")
                vid = _ebml_find(blob, tb, te, _VIDEO)
                if vid:
                    pw = _ebml_find(blob, vid[0], vid[1], _PIXELWIDTH)
                    ph = _ebml_find(blob, vid[0], vid[1], _PIXELHEIGHT)
                    if pw:
                        tr["width"] = int.from_bytes(blob[pw[0] : pw[1]], "big")
                    if ph:
                        tr["height"] = int.from_bytes(blob[ph[0] : ph[1]], "big")
                out["tracks"].append(tr)
    except (struct.error, IndexError):
        pass
    return out


def video_container_probe(blob: bytes) -> dict | None:
    """Magic-byte dispatch: MP4 (ftyp at offset 4) or EBML header ->
    probe dict; anything else -> None (the caller's unknown boundary)."""
    if len(blob) >= 12 and blob[4:8] == b"ftyp":
        return mp4_probe(blob)
    if blob[:4] == _EBML:
        return webm_probe(blob)
    return None
