"""Multimodal columns: opaque binary payloads + typed metadata.

Driver brief: image/audio/video are opaque ``binary`` columns; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas stages.
The image/audio codec libraries are NOT in this container, so the decode
step is stubbed (deterministic fake behind an import-try + explicit
NotImplementedError for real codecs), while the Spark-side plumbing —
schema, batching, UDF signature — is real and tested.

Reference analog: load_image / resize / normalize
(/root/reference/utils/image/image_io.py:68-137,
/root/reference/utils/image/image_processing.py:19-142) — there the decode
is PIL/cv2; here it is the stub boundary.
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


def decode_image(blob: bytes) -> np.ndarray:
    """Real codec decode — intentionally unavailable in this sandbox."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "image codecs are not installed in this container; "
            "use fake_decode for deterministic tests"
        )
    raise NotImplementedError("wire PIL decode here when codecs are available")


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
                    "riff" if b[:4] == b"RIFF" else "unknown"
                )
                img = fake_decode(b)
                rows.append(
                    {
                        "blob_id": int(bid),
                        "n_bytes": len(b),
                        "sha256": hashlib.sha256(b).hexdigest(),
                        "kind": kind,
                        "width": img.shape[1],
                        "height": img.shape[0],
                        "n_frames": 1,
                    }
                )
            yield pd.DataFrame(rows, columns=["blob_id", "n_bytes", "sha256", "kind", "width", "height", "n_frames"])

    return df.mapInPandas(gen, schema=META_SCHEMA)


def blob_features(df: DataFrame, blob_col: str = "blob", id_col: str = "blob_id", dim: int = 16) -> DataFrame:
    """Feature-extraction stage shape: decode -> pooled feature vector.

    Uses fake_decode; the batch shape (one Arrow chunk -> one numpy batch ->
    vectorized pooling) is exactly what a real CNN/codec stage would use."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            blobs = [bytes(b) if b is not None else b"" for b in pdf[blob_col]]
            imgs = np.stack([fake_decode(b, h=8, w=8, c=3) for b in blobs]) if blobs else np.zeros((0, 8, 8, 3))
            flat = imgs.reshape(len(blobs), -1).astype(np.float64) / 255.0
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
