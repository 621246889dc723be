"""Box combination: words -> lines -> paragraphs (the "order" stage heart).

Semantics parity (reference citations, behavior only — new implementation):
- connected components over a boolean adjacency mask (BFS, ordered by
  smallest member index): /root/reference/utils/image/bounding_box/combination.py:21-43
- group_boxes / _merge_rows / _align_rows: combination.py:59-148
- combine_boxes_horizontal (x-gap <= median(h)*h_factor AND
  y-overlap/max(h) >= 0.55): combination.py:150-234
- combine_boxes_vertical (y-gap <= median(h)/4 AND |hi-hj| <= 0.02 AND
  shifted x-overlap > 0): combination.py:236-329
- combine_boxes_overlap (IoA > 0.5): combination.py:331-337
- combine_boxes pipeline H -> V -> overlap: combination.py:339-361

Golden-tested against the literal fixtures captured from real pretrained-EAST
detections in /root/reference/tests/test_utils_boxes.py:380-557.

All inputs are ``(N, 4)`` xyxy float arrays (relative coords). Exact medians
are required for byte-identical grouping (SURVEY.md §7) — `np.median`, never
an approximation. Iteration order is deterministic (stable over input index).
"""

from __future__ import annotations

import numpy as np

from .boxes import compute_ioa, compute_union


def compute_groups(mask: np.ndarray) -> list[set]:
    """Connected components of the boolean adjacency ``mask``.

    Components are emitted in order of their smallest member index and
    returned as sets (combination.py:21-43 BFS semantics).
    """
    n = len(mask)
    edges = {i: {i} for i in range(n)}
    for s, e in zip(*np.where(mask)):
        edges[int(s)].add(int(e))
        edges[int(e)].add(int(s))

    components, seen = [], set()
    for i in range(n):
        if i in seen:
            continue
        component, q = set(), [i]
        while q:
            idx = q.pop(0)
            if idx in seen:
                continue
            seen.add(idx)
            neighbors = edges[idx]
            component.update(neighbors)
            q.extend(nb for nb in neighbors if nb not in seen)
        components.append(component)
    return components


def _merge_lists(lists):
    if len(lists) == 1:
        return lists[0]
    union = []
    for l in lists:
        union.extend(l)
    return union


def merge_rows(rows, indices):
    """Within a paragraph, re-merge member boxes on the same visual line:
    y-overlap / mean(h) >= 0.5 -> union; groups ordered by min input index
    (combination.py:59-80)."""
    if isinstance(rows, list):
        merged = [merge_rows(r, i) for r, i in zip(rows, indices)]
        return list(zip(*merged))
    if len(rows) < 2:
        return rows, indices

    overlap_y = np.maximum(
        0.0,
        np.minimum(rows[:, None, 3], rows[None, :, 3])
        - np.maximum(rows[:, None, 1], rows[None, :, 1]),
    ) / np.mean(rows[:, 3] - rows[:, 1])

    groups = sorted([sorted(grp) for grp in compute_groups(overlap_y >= 0.5)], key=min)
    new_rows = np.array([compute_union(rows[grp]) for grp in groups])
    new_indices = [_merge_lists([indices[idx] for idx in grp]) for grp in groups]
    return new_rows, new_indices


def align_rows(rows, mode, center_threshold=1e-2):
    """Left/right/auto border alignment of lines in a paragraph
    (combination.py:82-96). 'auto' detects centered blocks within tolerance."""
    if len(rows) == 1:
        return rows
    if mode == "auto":
        x_center = (rows[:, 0] + rows[:, 2]) / 2.0
        if not np.all(np.abs(x_center - np.mean(x_center)) < center_threshold):
            mode = "left"
    if mode == "left":
        rows[:, 0] = np.min(rows[:, 0])
    elif mode == "right":
        rows[:, 2] = np.max(rows[:, 2])
    return rows


def group_boxes(boxes, indices, groups, *, sort=None, rows=None, check_rows=None, align_borders=None):
    """Collapse each component into (union box, merged indices, member rows)
    (combination.py:104-148). ``sort`` is the coordinate column used to order
    members inside a group (0 = x for lines, 1 = y for paragraphs)."""
    if rows is not None:
        if check_rows is None:
            check_rows = True
        if align_borders is None:
            align_borders = "auto"

    res_boxes, res_indices, individuals = [], [], []
    for group in groups:
        group = sorted(group)
        if sort is not None and len(group) > 1:
            group = sorted(group, key=lambda idx: boxes[idx, sort])

        boxes_group = boxes[group]
        res_boxes.append(compute_union(boxes_group))

        if rows is None:
            res_indices.append([indices[idx] for idx in group])
            individuals.append(boxes_group)
        elif len(group) == 1:
            res_indices.append(indices[group[0]])
            individuals.append(rows[group[0]])
        else:
            res_indices.append(_merge_lists([indices[idx] for idx in group]))
            individuals.append(np.concatenate([rows[idx] for idx in group], axis=0))

    if check_rows:
        individuals, res_indices = merge_rows(individuals, res_indices)
        individuals, res_indices = list(individuals), list(res_indices)

    if align_borders:
        individuals = [align_rows(r, align_borders) for r in individuals]

    return np.array(res_boxes), res_indices, individuals


def combine_boxes_horizontal(
    boxes,
    *,
    indices=None,
    h_factor=1.5,
    x_threshold=None,
    y_overlap_threshold=0.55,
    **kwargs,
):
    """Merge word boxes into lines (combination.py:150-234).

    Edge i~j iff |x1_i - x0_j| <= x_threshold (0 when x-overlapping) AND
    y-overlap / max(h_i, h_j) >= y_overlap_threshold. x_threshold defaults to
    median(h) * h_factor. Members of a group are ordered by x0.
    """
    boxes = np.asarray(boxes, dtype=np.float64)
    if indices is None:
        indices = list(range(len(boxes)))
    if len(boxes) <= 1:
        return boxes, [indices], [boxes]

    h = boxes[:, 3] - boxes[:, 1]
    if x_threshold is None:
        x_threshold = np.median(h) * h_factor

    max_h = np.maximum(h[:, None], h[None, :])
    diff_border = np.abs(boxes[:, None, 2] - boxes[None, :, 0])
    overlap_x = (
        np.minimum(boxes[:, None, 2], boxes[None, :, 2])
        - np.maximum(boxes[:, None, 0], boxes[None, :, 0])
    ) > 0.0
    diff_border = diff_border * ~overlap_x

    overlap_y = np.maximum(
        0.0,
        np.minimum(boxes[:, None, 3], boxes[None, :, 3])
        - np.maximum(boxes[:, None, 1], boxes[None, :, 1]),
    )

    should_combine = np.logical_and(
        diff_border <= x_threshold,
        np.divide(overlap_y, max_h, out=np.zeros_like(overlap_y), where=max_h > 0)
        >= y_overlap_threshold,
    )
    return group_boxes(boxes, indices, compute_groups(should_combine), sort=0)


def combine_boxes_vertical(
    boxes,
    *,
    indices=None,
    y_threshold=None,
    h_threshold=0.02,
    x_overlap_threshold=0.0,
    shift_factor=0.5,
    **kwargs,
):
    """Merge lines into paragraphs (combination.py:236-329).

    Edge i~j iff |y1_i - y0_j| <= y_threshold (0 when y-overlapping) AND
    |h_i - h_j| <= h_threshold AND left-shifted x-overlap > threshold.
    y_threshold defaults to max(median(h)/4, 1e-2). Members ordered by y0.
    """
    boxes = np.asarray(boxes, dtype=np.float64)
    if indices is None:
        indices = list(range(len(boxes)))
    if len(boxes) <= 1:
        return boxes, [indices], [boxes]

    h = boxes[:, 3] - boxes[:, 1]
    if y_threshold is None:
        y_threshold = max(np.median(h) / 4.0, 1e-2)

    h_diff = np.abs(h[:, None] - h[None, :])
    diff_border = np.abs(boxes[:, None, 3] - boxes[None, :, 1])
    overlap_y = (
        np.minimum(boxes[:, None, 3], boxes[None, :, 3])
        - np.maximum(boxes[:, None, 1], boxes[None, :, 1])
    ) > 0
    diff_border = diff_border * ~overlap_y

    shifted_w = (boxes[:, 2] - boxes[:, 0]) * shift_factor
    shifted_x_max = boxes[:, 2] - shifted_w
    overlap_x = np.minimum(shifted_x_max[:, None], shifted_x_max[None, :]) - np.maximum(
        boxes[:, None, 0], boxes[None, :, 0]
    )
    if x_overlap_threshold == 0.0:
        x_overlap_mask = overlap_x > 0.0
    else:
        overlap_x = overlap_x / np.minimum(shifted_w[:, None], shifted_w[None, :])
        x_overlap_mask = overlap_x > x_overlap_threshold

    should_combine = np.logical_and(
        np.logical_and(diff_border <= y_threshold, h_diff <= h_threshold),
        x_overlap_mask,
    )
    return group_boxes(boxes, indices, compute_groups(should_combine), sort=1)


def combine_boxes_overlap(boxes, indices=None, overlap_threshold=0.5, *, rows=None, **kwargs):
    """Merge paragraphs whose IoA > overlap_threshold (combination.py:331-337)."""
    boxes = np.asarray(boxes, dtype=np.float64)
    if indices is None:
        indices = list(range(len(boxes)))
    if len(boxes) == 0:
        # empty input would crash the group unpack below; note len==1 MUST
        # still run group_boxes — merge_rows/align_rows apply to the single
        # paragraph's member rows (combination.py:331-337 is unconditional)
        return boxes, indices, []
    is_overlapping = compute_ioa(boxes, as_matrix=True) > overlap_threshold
    return group_boxes(
        boxes, indices, compute_groups(is_overlapping), sort=1, rows=rows, **kwargs
    )


def combine_boxes(boxes, indices=None, **kwargs):
    """Full pipeline: horizontal -> vertical -> overlap (combination.py:339-361).

    Returns (paragraph_boxes, nested_indices, line_rows_per_paragraph).
    """
    combined, comb_indices, _ = combine_boxes_horizontal(boxes, indices=indices, **kwargs)
    combined, comb_indices, rows = combine_boxes_vertical(combined, indices=comb_indices, **kwargs)
    combined, comb_indices, rows = combine_boxes_overlap(combined, comb_indices, rows=rows, **kwargs)
    return combined, comb_indices, rows
