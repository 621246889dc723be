"""Box overlay drawing — the rebuild's analog of the reference's
annotated-output callbacks (`ImageSaver` / `OCRDisplayer`,
/root/reference/models/detection/base_detector.py:177-200 draw the
detected boxes onto the frame before saving). Pure numpy rectangle
strokes; deterministic byte-for-byte, so annotated PNGs are stable
across parallelism levels like every other output of the pipeline.
"""

from __future__ import annotations

import numpy as np

__all__ = ["draw_boxes"]


def draw_boxes(
    img: np.ndarray,
    boxes,
    *,
    color=(255, 0, 0),
    thickness: int = 1,
) -> np.ndarray:
    """Return an RGB copy of ``img`` with each relative ``[x0,y0,x1,y1]``
    box stroked as an axis-aligned rectangle. Gray input is promoted to
    RGB; boxes are clamped to the frame; degenerate boxes still draw
    their (collapsed) edges."""
    a = np.asarray(img)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    out = a.astype(np.uint8, copy=True)
    h, w = out.shape[:2]
    col = np.asarray(color, dtype=np.uint8)
    for box in boxes:
        x0, y0, x1, y1 = box
        c0 = int(np.clip(round(x0 * w), 0, w - 1))
        c1 = int(np.clip(round(x1 * w), 0, w - 1))
        r0 = int(np.clip(round(y0 * h), 0, h - 1))
        r1 = int(np.clip(round(y1 * h), 0, h - 1))
        if c1 < c0:
            c0, c1 = c1, c0
        if r1 < r0:
            r0, r1 = r1, r0
        t = max(1, int(thickness))
        out[r0 : min(r0 + t, h), c0 : c1 + 1] = col  # top
        out[max(r1 - t + 1, 0) : r1 + 1, c0 : c1 + 1] = col  # bottom
        out[r0 : r1 + 1, c0 : min(c0 + t, w)] = col  # left
        out[r0 : r1 + 1, max(c1 - t + 1, 0) : c1 + 1] = col  # right
    return out
