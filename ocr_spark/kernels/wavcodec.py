"""Pure-Python RIFF/WAVE codec — the audio analog of kernels/imagecodec
(round-2 unstubbed the image boundary; this unstubs audio).

Supports PCM (format tag 1) 8-bit unsigned and 16-bit signed little-endian,
any channel count. The chunk walk is tolerant: unknown chunks are skipped
(odd sizes padded per RIFF), a truncated data chunk yields the samples
present. Malformed headers raise :class:`WavError` — callers at the Spark
boundary degrade to skipped rows, never task failures (same policy as the
PNG/JPEG/WARC/PDF parsers).

Reference analog: the reference treats audio as an opaque paragraph type
(utils/text/parsers/parser.py:22-29 `type: audio`); actual decode is out of
its scope — this codec makes the multimodal audio column REAL here.
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    pass


def wav_decode(blob: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> (samples int32 array of shape (n, channels),
    sample_rate). 8-bit samples are centered to signed (-128..127)."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and fmt is None:
            if len(body) < 16:
                raise WavError("fmt chunk too short")
            tag, n_ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            fmt = (tag, n_ch, rate, bits)
        elif cid == b"data" and data is None:
            data = body
        pos += 8 + size + (size & 1)  # RIFF pads odd chunks
    if fmt is None or data is None:
        raise WavError("missing fmt or data chunk")
    tag, n_ch, rate, bits = fmt
    if tag != 1:
        raise WavError(f"unsupported format tag {tag} (PCM only)")
    if n_ch < 1:
        raise WavError("zero channels")
    if bits == 16:
        usable = len(data) - (len(data) % (2 * n_ch))
        samples = np.frombuffer(data[:usable], dtype="<i2").astype(np.int32)
    elif bits == 8:
        usable = len(data) - (len(data) % n_ch)
        samples = np.frombuffer(data[:usable], dtype=np.uint8).astype(np.int32) - 128
    else:
        raise WavError(f"unsupported bit depth {bits}")
    return samples.reshape(-1, n_ch), int(rate)


def wav_encode(samples: np.ndarray, sample_rate: int, *, bits: int = 16) -> bytes:
    """(n,) or (n, channels) int samples -> RIFF/WAVE bytes (PCM)."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, n_ch = arr.shape
    if bits == 16:
        # clip (like the 8-bit path) — modular astype would silently wrap
        payload = arr.astype(np.int64).clip(-32768, 32767).astype("<i2").tobytes()
    elif bits == 8:
        payload = (arr.astype(np.int32) + 128).clip(0, 255).astype(np.uint8).tobytes()
    else:
        raise WavError(f"unsupported bit depth {bits}")
    block = n_ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * block, block, bits
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
