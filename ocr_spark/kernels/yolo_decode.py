"""D7: YOLOv2-style grid decode (completes the detection-decode family).

Semantics parity (behavior only, re-derived from
/root/reference/models/detection/yolo.py:219-279):

- input map (grid_h, grid_w, nb_box, 5 + nb_class): [x, y, w, h, obj,
  class_probs...]; per-anchor class scores = class_probs * objectness;
- candidate cells: max class score > obj_threshold; centers/sizes are in
  GRID units -> divide by (grid_w, grid_h); xyxy = center +- size/2
  clamped to [0, 1]; degenerate boxes (max <= min on any axis) drop;
- per-class greedy NMS: descending score order (ties resolved like the
  reference's reversed argsort: HIGHEST index first), a suppressed box's
  class score zeroes and it can no longer suppress others;
- final detections: max surviving class score > obj_threshold, label =
  argmax class; output format xyxy.
"""

from __future__ import annotations

import numpy as np


def _iou_xyxy(a: np.ndarray, b: np.ndarray) -> float:
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    union = (
        (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    )
    return inter / union if union > 0 else 0.0


def decode_yolo_output(
    output: np.ndarray, *, obj_threshold: float = 0.35, nms_threshold: float = 0.2
):
    """(grid_h, grid_w, nb_box, 5+nb_class) map -> (boxes (N,4) xyxy,
    labels (N,), scores (N,))."""
    output = np.asarray(output, dtype=np.float64)
    grid_h, grid_w, _, depth = output.shape
    nb_class = depth - 5

    class_scores = output[..., 5:] * output[..., 4:5]
    cand = np.where(class_scores.max(axis=-1) > obj_threshold)

    pos = output[..., :4][cand] / np.array(
        [grid_w, grid_h, grid_w, grid_h], dtype=np.float64
    )
    scores = class_scores[cand]

    lo = np.maximum(pos[:, :2] - pos[:, 2:] / 2.0, 0.0)
    hi = np.minimum(pos[:, :2] + pos[:, 2:] / 2.0, 1.0)
    valid = np.all(hi > lo, axis=1)
    boxes = np.concatenate([lo[valid], hi[valid]], axis=1)
    scores = scores[valid]

    # per-class greedy suppression (reference tie order: highest index
    # first among equal scores — reversed stable argsort)
    for c in range(nb_class):
        order = np.argsort(scores[:, c], kind="stable")[::-1]
        order = order[scores[:, c][order] > obj_threshold]
        kept: list[int] = []
        for idx in order:
            if scores[idx, c] <= obj_threshold:
                continue
            if any(_iou_xyxy(boxes[k], boxes[idx]) >= nms_threshold for k in kept):
                scores[idx, c] = 0.0
            else:
                kept.append(idx)

    best = scores.max(axis=1) if len(scores) else np.zeros(0)
    mask = best > obj_threshold
    labels = scores[mask].argmax(axis=1) if mask.any() else np.zeros(0, dtype=np.int64)
    return boxes[mask], labels.astype(np.int64), best[mask]
