"""Bounding-box primitives: format conversion, dezoom, IoU/IoA, union.

Semantics parity (reference citations, behavior only — new implementation):
- format conversion xywh/xyxy/poly + relative<->absolute:
  /root/reference/utils/image/bounding_box/converter.py:74-200
- dezoom (scale a box around its center, clamp to the unit square / image):
  /root/reference/utils/image/bounding_box/converter.py:202-228
- pairwise IoU / IoA matrices (numpy broadcasting, overflow-safe order):
  /root/reference/utils/image/bounding_box/metrics.py:18-71
- box union:
  /root/reference/utils/image/bounding_box/combination.py:98-102

All functions are pure numpy, operate on float64 by default (byte-identical
group-boundary decisions — see SURVEY.md §7 "hard parts"), and are designed
to be called per Arrow batch / per group inside pandas UDFs.
"""

from __future__ import annotations

import numpy as np

FORMATS = ("xywh", "xyxy", "poly")


def _as_array(boxes) -> np.ndarray:
    boxes = np.asarray(boxes, dtype=np.float64)
    return boxes


def convert_boxes(
    boxes,
    source: str,
    target: str | None = None,
    *,
    dezoom_factor: float = 1.0,
    image_h: float | None = None,
    image_w: float | None = None,
    normalize_mode: str | None = None,
):
    """Convert box wire-format; optionally dezoom and (de)normalize.

    ``boxes`` is ``(N, 4)`` for xywh/xyxy, ``(N, 4, 2)`` for poly.
    Relative boxes are floats in [0, 1]; absolute are pixel units.
    ``normalize_mode`` in {None, 'relative', 'absolute'} mirrors
    converter.py:180-200: converting between the two requires image size.
    """
    if target is None:
        target = source
    if source not in FORMATS or target not in FORMATS:
        raise ValueError(f"invalid format: {source} -> {target}")

    boxes = np.asarray(boxes)
    if boxes.size == 0:
        return boxes.reshape((0, 4) if target != "poly" else (0, 4, 2)).astype(np.float64)
    if boxes.ndim == 1 or (source == "poly" and boxes.ndim == 2):
        boxes = boxes[None]

    if normalize_mode is not None:
        # dtype carries relative-vs-absolute (converter.py:246-250): check it
        # before any float cast
        boxes = normalize_boxes(boxes, source, normalize_mode, image_h=image_h, image_w=image_w)
    # relative-vs-absolute decides the dezoom clamp bound (converter.py:246-250
    # checks dtype): capture it BEFORE the float64 working cast below
    rel = np.issubdtype(np.asarray(boxes).dtype, np.floating)
    boxes = _as_array(boxes)

    if source == target and dezoom_factor == 1.0:
        return boxes

    if source == "xywh":
        x, y, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    elif source == "xyxy":
        x, y = boxes[..., 0], boxes[..., 1]
        w, h = boxes[..., 2] - x, boxes[..., 3] - y
    else:  # poly
        xy_min, xy_max = boxes.min(axis=-2), boxes.max(axis=-2)
        x, y = xy_min[..., 0], xy_min[..., 1]
        w, h = (xy_max - xy_min)[..., 0], (xy_max - xy_min)[..., 1]

    if dezoom_factor != 1.0:
        # relative boxes clamp to the unit square even when an image size was
        # passed (it may have been given only for a normalize step)
        x, y, w, h = dezoom_box(
            x, y, w, h, dezoom_factor,
            image_h=None if rel else image_h,
            image_w=None if rel else image_w,
        )

    if target == "xywh":
        return np.stack([x, y, w, h], axis=-1)
    if target == "xyxy":
        return np.stack([x, y, x + w, y + h], axis=-1)
    # poly: tl, tr, bl, br (converter.py:167-174 corner order)
    x1, y1 = x + w, y + h
    return np.stack(
        [
            np.stack([x, y], axis=-1),
            np.stack([x1, y], axis=-1),
            np.stack([x, y1], axis=-1),
            np.stack([x1, y1], axis=-1),
        ],
        axis=-2,
    )


def normalize_boxes(boxes, source, normalize_mode, *, image_h=None, image_w=None):
    """Relative [0,1] <-> absolute pixel conversion (converter.py:180-200).

    A float array is considered relative, an int array absolute.
    """
    boxes = np.asarray(boxes)
    rel = np.issubdtype(boxes.dtype, np.floating)
    if (rel and normalize_mode == "absolute") or (not rel and normalize_mode == "relative"):
        if image_h is None or image_w is None:
            raise ValueError("image_h and image_w are required to (de)normalize")
        if source == "poly":
            factors = np.array([image_w, image_h], dtype=np.float64)
        else:
            factors = np.array([image_w, image_h, image_w, image_h], dtype=np.float64)
        if normalize_mode == "relative":
            return boxes.astype(np.float64) / factors
        return (boxes.astype(np.float64) * factors).astype(np.int32)
    return _as_array(boxes)


def dezoom_box(x, y, w, h, factor, *, image_h=None, image_w=None):
    """Scale (w, h) by ``factor`` around the box center, clamped at 0 and the
    right/bottom border (converter.py:202-228). Relative boxes clamp to 1;
    absolute boxes clamp to (image_w, image_h)."""
    if factor == 1.0:
        return x, y, w, h
    new_h, new_w = h * factor, w * factor
    new_x = np.maximum((x + w / 2.0) - new_w / 2.0, 0.0)
    new_y = np.maximum((y + h / 2.0) - new_h / 2.0, 0.0)
    if image_h is None:
        new_h = np.minimum(new_h, 1.0 - new_y)
        new_w = np.minimum(new_w, 1.0 - new_x)
    else:
        new_h = np.minimum(new_h, image_h - new_y)
        new_w = np.minimum(new_w, image_w - new_x)
    return new_x, new_y, new_w, new_h


def compute_union(boxes: np.ndarray) -> np.ndarray:
    """Bounding union of ``(N, 4)`` xyxy boxes (combination.py:98-102)."""
    if len(boxes) == 1:
        return boxes[0]
    return np.concatenate([boxes[:, :2].min(axis=0), boxes[:, 2:].max(axis=0)], axis=0)


def _inter(boxes1, boxes2, as_matrix):
    if as_matrix:
        b1 = boxes1[..., :, None, :]
        b2 = boxes2[..., None, :, :]
    else:
        b1, b2 = boxes1, boxes2
    xmin = np.maximum(b1[..., 0], b2[..., 0])
    ymin = np.maximum(b1[..., 1], b2[..., 1])
    xmax = np.minimum(b1[..., 2], b2[..., 2])
    ymax = np.minimum(b1[..., 3], b2[..., 3])
    inter_w = np.maximum(0.0, xmax - xmin)
    inter_h = np.maximum(0.0, ymax - ymin)
    return inter_w * inter_h, b1, b2


def compute_iou(boxes1, boxes2=None, *, as_matrix=None) -> np.ndarray:
    """Pairwise IoU over xyxy boxes (metrics.py:18-46).

    With ``as_matrix`` (default when boxes2 is None): ``(N, M)`` matrix;
    otherwise element-wise over aligned rows. Supports a leading batch dim.
    The union uses the overflow-safe ``a1 - inter + a2`` ordering
    (metrics.py:42-44).
    """
    if as_matrix is None:
        as_matrix = boxes2 is None
    boxes1 = _as_array(boxes1)
    boxes2 = boxes1 if boxes2 is None else _as_array(boxes2)
    if boxes1.ndim == 1:
        boxes1 = boxes1[None]
    if boxes2.ndim == 1:
        boxes2 = boxes2[None]
    if boxes1.shape[-2] == 0 or boxes2.shape[-2] == 0:
        return np.zeros((0, 0), dtype=np.float64)
    inter, b1, b2 = _inter(boxes1, boxes2, as_matrix)
    a1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    a2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    union = a1 - inter + a2
    return np.divide(inter, union, out=np.zeros_like(inter), where=union != 0)


def compute_ioa(boxes1, boxes2=None, *, as_matrix=None) -> np.ndarray:
    """Pairwise intersection-over-area-of-first (asymmetric, metrics.py:48-71)."""
    if as_matrix is None:
        as_matrix = boxes2 is None
    boxes1 = _as_array(boxes1)
    boxes2 = boxes1 if boxes2 is None else _as_array(boxes2)
    if boxes1.ndim == 1:
        boxes1 = boxes1[None]
    if boxes2.ndim == 1:
        boxes2 = boxes2[None]
    inter, b1, _ = _inter(boxes1, boxes2, as_matrix)
    a1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    return np.divide(inter, a1, out=np.zeros_like(inter), where=a1 != 0)
