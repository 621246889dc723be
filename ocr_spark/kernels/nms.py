"""Non-max suppression: standard greedy NMS + locality-aware NMS (LANMS).

Semantics parity (reference citations, behavior only — new implementation):
- dispatcher / pass-through when nms_threshold >= 1:
  /root/reference/utils/image/bounding_box/non_max_suppression.py:25-78
- score-descending sort before suppression: non_max_suppression.py:247-253
- fast_nms fixpoint ("box j suppressed iff some unsuppressed i before it has
  IoU >= threshold"): non_max_suppression.py:117-245 — reproduced here as the
  equivalent deterministic iterative definition (same fixed point; the XLA
  tiling of the reference is replaced by Spark partition parallelism,
  SURVEY.md §4).
- max_output_size top-k via cumulative valid mask: non_max_suppression.py:255-259
- LANMS iterative self-merging (union / average) until fixpoint, then
  standard NMS when nms_threshold < merge_threshold:
  /root/reference/utils/image/bounding_box/locality_aware_nms.py:22-127

Golden-tested against /root/reference/tests/test_utils_boxes.py:559-637
(standard survivors [0, 2]; LANMS union/average/iterative expectations).

Inputs are (N, 4) xyxy float arrays; per-document N is small (<= a few
hundred), so O(N^2) numpy in-group is the right physical strategy.
"""

from __future__ import annotations

import numpy as np

from .boxes import compute_iou


def sort_by_scores(boxes, scores):
    """Stable score-descending ordering (non_max_suppression.py:247-253).

    Returns (boxes, scores, order) where ``order`` maps sorted -> original.
    """
    if scores is None:
        return boxes, None, np.arange(len(boxes))
    order = np.argsort(-np.asarray(scores, dtype=np.float64), kind="stable")
    return boxes[order], np.asarray(scores)[order], order


def _suppression_fixpoint(boxes: np.ndarray, threshold: float) -> np.ndarray:
    """Boolean keep-mask: box j kept iff no kept i < j has IoU >= threshold.

    This is the unique fixpoint of the reference's self_suppression loop
    (non_max_suppression.py:192-220) for score-ordered boxes.
    """
    n = len(boxes)
    iou = compute_iou(boxes, as_matrix=True)
    keep = np.ones(n, dtype=bool)
    for j in range(1, n):
        prior = np.where(keep[:j])[0]
        if prior.size and np.any(iou[prior, j] >= threshold):
            keep[j] = False
    return keep


def nms(boxes, scores=None, max_output_size=None, nms_threshold=0.25, *, method="nms", **kwargs):
    """NMS dispatcher (non_max_suppression.py:25-78).

    Returns (boxes, scores, valid_mask) in score-sorted order — the
    reference's contract: boxes are reordered by descending score and
    ``valid_mask`` marks survivors. ``nms_threshold >= 1`` is a pass-through.
    """
    boxes = np.asarray(boxes, dtype=np.float64)
    if nms_threshold >= 1.0 or len(boxes) == 0:
        return boxes, scores, np.ones((len(boxes),), dtype=bool)

    if method in ("lanms", "locality_aware_nms"):
        return lanms(
            boxes, scores, max_output_size, nms_threshold=nms_threshold, **kwargs
        )

    boxes, scores, _ = sort_by_scores(boxes, scores)
    keep = _suppression_fixpoint(boxes, nms_threshold)
    # reference zeroes suppressed boxes then recovers valids as any(box > 0)
    zeroed = boxes * keep[:, None]
    valids = _valid_mask(zeroed, max_output_size)
    return zeroed, scores, valids


def _valid_mask(boxes, max_output_size):
    """any(box > 0) plus cumulative top-k cap (non_max_suppression.py:255-259)."""
    mask = np.any(boxes > 0, axis=1)
    if max_output_size is not None:
        mask = np.logical_and(mask, np.cumsum(mask.astype(np.int32)) <= max_output_size)
    return mask


def _merge_boxes(boxes, box_slice, mask, merge_method):
    """Merge masked rows of ``box_slice`` into ``boxes``
    (locality_aware_nms.py:99-127). mask[i, j]: merge box j into box i."""
    m = mask[..., None]
    merged = box_slice[None, :, :] * m
    if merge_method == "union":
        union_xy_min = np.min(np.where(m, merged[..., :2], np.inf), axis=1)
        union_xy_max = np.max(merged[..., 2:], axis=1)
        return np.concatenate(
            [np.minimum(boxes[:, :2], union_xy_min), np.maximum(boxes[:, 2:], union_xy_max)],
            axis=1,
        )
    if merge_method == "average":
        sum_coords = boxes + merged.sum(axis=1)
        denom = (1 + np.count_nonzero(mask, axis=1)).astype(np.float64)[:, None]
        return sum_coords / denom
    raise ValueError(f"unknown merge_method: {merge_method}")


def lanms(
    boxes,
    scores=None,
    max_output_size=None,
    nms_threshold=0.25,
    *,
    merge_threshold=0.3,
    merge_method="union",
    max_iter=None,
    **kwargs,
):
    """Locality-aware NMS (locality_aware_nms.py:22-97).

    Iteratively: a box i that is not itself merged-away absorbs every later
    box j with IoU(i, j) >= merge_threshold (by union or average), the
    absorbed boxes are zeroed, and the loop repeats until no absorbed row
    still overlaps anything (fixpoint), bounded by ``max_iter``. A standard
    NMS pass runs after when nms_threshold < merge_threshold.
    """
    boxes = np.asarray(boxes, dtype=np.float64)
    if max_iter is None:
        max_iter = len(boxes)

    boxes, scores, _ = sort_by_scores(boxes, scores)

    n = len(boxes)
    upper = np.arange(n)
    upper = upper[None, :] > upper[:, None]

    it, looping = 0, True
    while looping and it < max_iter:
        iou = compute_iou(boxes, as_matrix=True)
        iou = iou * np.logical_and(upper, iou >= merge_threshold)
        can_suppress_others = (iou.max(axis=0) < merge_threshold).astype(np.float64)[:, None]
        merging_mask = iou * can_suppress_others >= merge_threshold
        suppressed = np.any(merging_mask, axis=0)[:, None]

        merged = _merge_boxes(boxes, boxes, merging_mask, merge_method)
        boxes = merged * (~suppressed)
        looping = bool(np.any(iou * suppressed.astype(np.float64) >= merge_threshold))
        it += 1

    mask = np.any(boxes > 0, axis=1)
    if nms_threshold < merge_threshold:
        keep = _suppression_fixpoint(boxes, nms_threshold)
        nms_mask = np.any(boxes * keep[:, None] > 0, axis=1)
        mask = np.logical_and(mask, nms_mask)

    if max_output_size is not None:
        mask = np.logical_and(mask, np.cumsum(mask.astype(np.int32)) <= max_output_size)
    return boxes, scores, mask
