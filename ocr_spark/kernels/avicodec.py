"""Pure-Python AVI (RIFF) video container codec — the last multimodal
boundary unstubbed: image (kernels/imagecodec.py), audio
(kernels/wavcodec.py) and now video are REAL decoders.

Scope: the two classic stored-frame formats —
- ``00dc`` MJPEG frames: each frame is a baseline JPEG, decoded by the
  repo's own :func:`ocr_spark.kernels.imagecodec.jpeg_decode`;
- ``00db`` uncompressed DIB frames: 24-bpp BGR, bottom-up rows padded to
  4 bytes (the BITMAPINFOHEADER convention) — decoded exactly.

The chunk walk is tolerant (unknown chunks skipped, odd sizes padded per
RIFF, truncated tails yield the frames present); malformed headers raise
:class:`AviError` and the Spark boundary degrades to skipped rows, never
task failures (codec-parser policy shared with PNG/JPEG/WAV/PDF/WARC).

Reference analog: the reference's video path is a frame *generator* over
cv2 capture (/root/reference/utils/image/image_io.py:181-460) — decode
itself is delegated to OpenCV there; here the container parse and frame
decode are native.
"""

from __future__ import annotations

import struct

import numpy as np


class AviError(ValueError):
    pass


def _dib_encode(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> bottom-up BGR rows padded to 4 bytes."""
    h, w, _ = img.shape
    bgr = img[::-1, :, ::-1]  # bottom-up, RGB->BGR
    row = bgr.reshape(h, w * 3)
    pad = (-w * 3) % 4
    if pad:
        row = np.concatenate([row, np.zeros((h, pad), dtype=np.uint8)], axis=1)
    return row.tobytes()


def _dib_decode(payload: bytes, w: int, h: int) -> np.ndarray:
    stride = w * 3 + ((-w * 3) % 4)
    need = stride * h
    if len(payload) < need:
        raise AviError("truncated DIB frame")
    rows = np.frombuffer(payload[:need], dtype=np.uint8).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    return bgr[::-1, :, ::-1].copy()  # top-down RGB


def avi_encode(
    frames: list[bytes | np.ndarray], *, fps: int = 10, size: tuple[int, int] | None = None
) -> bytes:
    """Build a minimal single-video-stream AVI. ``frames`` entries are
    either JPEG bytes (stored as ``00dc`` MJPEG) or (h, w, 3) uint8 arrays
    (stored as ``00db`` raw DIB). ``size`` (h, w) is required when the
    first frame is JPEG bytes."""
    if not frames:
        raise AviError("no frames")
    first = frames[0]
    if isinstance(first, np.ndarray):
        h, w = first.shape[:2]
        fourcc = b"DIB "
    else:
        if size is None:
            raise AviError("size (h, w) required for JPEG frames")
        h, w = size
        fourcc = b"MJPG"

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return tag + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) & 1 else b""
        )

    def lst(tag: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", tag + payload)

    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        0, 0, 0x10,                # MaxBytesPerSec, Padding, Flags (HASINDEX-less)
        len(frames), 0, 1, 0,      # TotalFrames, InitialFrames, Streams, SugBufSize
        w, h, 0, 0, 0, 0,
    )
    strh = b"vids" + fourcc + struct.pack(
        "<IHHIIIIIIII4H", 0, 0, 0, 0, 1, max(fps, 1), 0, len(frames), 0, 0, 0, 0, 0, w, h
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, fourcc, 0, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_payload = b""
    for f in frames:
        if isinstance(f, np.ndarray):
            movi_payload += chunk(b"00db", _dib_encode(f))
        else:
            movi_payload += chunk(b"00dc", bytes(f))
    movi = lst(b"movi", movi_payload)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(buf: bytes, pos: int, end: int):
    while pos + 8 <= end:
        tag = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body_end = min(pos + 8 + size, end)
        yield tag, pos + 8, body_end
        pos += 8 + size + (size & 1)


def avi_decode_frames(blob: bytes) -> tuple[list[np.ndarray], int, int, int]:
    """AVI bytes -> (frames as (h, w, 3) uint8 RGB arrays, fps, width,
    height). MJPEG frames route through imagecodec.jpeg_decode; DIB frames
    decode exactly. Undecodable individual frames are skipped."""
    from .imagecodec import CodecError, jpeg_decode

    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise AviError("not a RIFF/AVI stream")
    fps, w, h = 0, 0, 0
    frames: list[np.ndarray] = []

    def scan(pos: int, end: int):
        nonlocal fps, w, h
        for tag, b0, b1 in _walk_chunks(blob, pos, end):
            if tag == b"LIST":
                scan(b0 + 4, b1)  # skip the list-type fourcc
            elif tag == b"avih" and b1 - b0 >= 44:
                micro, = struct.unpack_from("<I", blob, b0)
                w, h = struct.unpack_from("<II", blob, b0 + 32)
                fps = int(round(1_000_000 / micro)) if micro else 0
            elif tag in (b"00db", b"00dc"):
                payload = blob[b0:b1]
                try:
                    if tag == b"00db":
                        frames.append(_dib_decode(payload, w, h))
                    else:
                        img = jpeg_decode(payload)
                        if img.ndim == 2:
                            img = np.stack([img] * 3, axis=-1)
                        frames.append(img)
                except (AviError, CodecError, ValueError):
                    continue  # skip the broken frame, keep the rest

    scan(12, len(blob))
    if w <= 0 or h <= 0:
        raise AviError("missing or degenerate avih header")
    return frames, fps, int(w), int(h)
