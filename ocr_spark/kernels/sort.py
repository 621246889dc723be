"""Box ordering criteria, including the stateful greedy 'top' reading order.

Semantics parity (reference citations, behavior only — new implementation):
- sort_boxes with methods x / y / w / h / corner / center / left / score /
  area / top: /root/reference/utils/image/bounding_box/processing.py:20-96
- 'top' is a greedy row-banding sweep (y-center within h*threshold/2 forms a
  row, rows top-to-bottom, members left-to-right) — NOT expressible as a SQL
  Window frame (SURVEY.md §7 risk 4); kept in numpy inside applyInPandas.

Input is (N, 4) xywh float (use boxes.convert_boxes first if needed).
All argsorts are stable for deterministic re-runs.
"""

from __future__ import annotations

import numpy as np


def sort_boxes_xywh(
    boxes,
    method: str = "top",
    *,
    scores=None,
    threshold: float = 0.5,
    columns: int = 10,
) -> np.ndarray:
    """Return sorted indices over (N, 4) xywh boxes (processing.py:20-96)."""
    boxes = np.asarray(boxes, dtype=np.float64)
    if len(boxes) == 0:
        return np.zeros((0,), dtype=np.int64)
    x, y, w, h = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]

    if method == "x":
        return np.argsort(x, kind="stable")
    if method == "y":
        return np.argsort(y, kind="stable")
    if method == "w":
        return np.argsort(w, kind="stable")[::-1]
    if method == "h":
        return np.argsort(h, kind="stable")[::-1]
    if method == "corner":
        return np.argsort(x + y, kind="stable")
    if method == "center":
        return np.argsort((x + w / 2.0) + (y + h / 2.0), kind="stable")
    if method == "left":
        return np.argsort(np.round(x * columns) + y, kind="stable")
    if method == "area":
        return np.argsort(w * h, kind="stable")[::-1]
    if method == "score":
        if scores is None:
            raise ValueError("`method='score'` requires scores")
        return np.argsort(np.asarray(scores), kind="stable")[::-1]
    if method == "top":
        y_center = y + h / 2.0
        same_rows = np.abs(y_center[None, :] - y_center[:, None]) <= h[:, None] * threshold / 2.0
        same_rows = np.logical_or(same_rows, same_rows.T)

        indices: list[int] = []
        to_set = np.full((len(x),), True)
        for idx in np.argsort(y_center, kind="stable"):
            if not to_set[idx]:
                continue
            row_indices = np.where(np.logical_and(same_rows[idx], to_set))[0]
            indices.extend(row_indices[np.argsort(x[row_indices], kind="stable")])
            to_set[row_indices] = False
        return np.array(indices, dtype=np.int64)
    raise ValueError(f"unsupported sorting criterion: {method}")
