"""Box combination: words -> lines -> paragraphs (the "order" stage heart).

SEMANTICS (not code) follow the reference's box-combination stage; every
rule below is re-derived from its documented behavior and pinned by the
golden fixtures in tests/test_kernels_combine.py (captured from real
pretrained-EAST detections, /root/reference/tests/test_utils_boxes.py:380-557):

- words -> lines: two boxes join when the horizontal distance between the
  first's right edge and the second's left edge is at most
  ``median(height) * h_factor`` (0 if the x-intervals overlap) AND their
  y-overlap is at least 55% of the taller box
  (/root/reference/utils/image/bounding_box/combination.py:150-234).
- lines -> paragraphs: vertical edge-gap at most ``max(median(h)/4, 1e-2)``
  (0 if y-overlapping), near-equal heights (<= 0.02), and overlapping
  left halves (combination.py:236-329).
- paragraphs whose IoA exceeds 0.5 merge (combination.py:331-337).
- components collapse to (union box, member indices, per-line rows); lines
  inside a paragraph re-merge when y-overlap >= 0.5 * mean height, and
  borders align left/right/auto (combination.py:59-148).
- pipeline: horizontal -> vertical -> overlap (combination.py:339-361).

Exact medians are required for byte-identical grouping (SURVEY.md §7) —
``np.median``, never an approximation. All group orderings are
deterministic: components by smallest member index, members by input index
then (stably) by the requested coordinate.

Inputs are ``(N, 4)`` xyxy float arrays (relative coords).
"""

from __future__ import annotations

import numpy as np

from .boxes import compute_ioa, compute_union


# --------------------------------------------------------------------------
# pairwise interval algebra
# --------------------------------------------------------------------------

def _pair_overlap(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """(N, N) signed 1-D interval overlap: positive where [lo,hi]_i and
    [lo,hi]_j intersect."""
    return np.minimum.outer(hi, hi) - np.maximum.outer(lo, lo)


def _edge_gap(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """(N, N) directed reading-gap: |hi_i - lo_j|, forced to 0 wherever the
    two intervals already overlap (adjacent-or-overlapping means "touching"
    for grouping purposes)."""
    gap = np.abs(hi[:, None] - lo[None, :])
    gap[_pair_overlap(lo, hi) > 0.0] = 0.0
    return gap


# --------------------------------------------------------------------------
# connected components (union-find)
# --------------------------------------------------------------------------

def compute_groups(mask: np.ndarray) -> list[list[int]]:
    """Connected components of the (possibly directed) boolean pair relation
    ``mask``: an edge exists when mask[i, j] or mask[j, i].

    Disjoint-set with path compression; components are returned as
    ascending member lists, ordered by smallest member index.
    """
    n = len(mask)
    root = list(range(n))

    def find(x: int) -> int:
        while root[x] != x:
            root[x] = root[root[x]]  # path halving
            x = root[x]
        return x

    sym = np.logical_or(mask, np.transpose(mask))
    for i, j in zip(*np.nonzero(np.triu(sym, 1))):
        ri, rj = find(int(i)), find(int(j))
        if ri != rj:
            # smaller root wins so component ids stay index-ordered
            if rj < ri:
                ri, rj = rj, ri
            root[rj] = ri

    members: dict[int, list[int]] = {}
    for i in range(n):
        members.setdefault(find(i), []).append(i)
    return [members[r] for r in sorted(members)]


# --------------------------------------------------------------------------
# component collapse
# --------------------------------------------------------------------------

def _flatten_one(nested):
    if len(nested) == 1:
        return nested[0]
    flat = []
    for item in nested:
        flat.extend(item)
    return flat


def merge_rows(rows, indices):
    """Re-merge member boxes of a paragraph that sit on the same visual
    line: pairwise y-overlap of at least half the MEAN member height joins
    them (combination.py:59-80 behavior); merged lines keep
    smallest-member-first order."""
    if isinstance(rows, list):
        pairs = [merge_rows(r, i) for r, i in zip(rows, indices)]
        return list(zip(*pairs))
    if len(rows) < 2:
        return rows, indices

    mean_h = np.mean(rows[:, 3] - rows[:, 1])
    y_frac = np.clip(_pair_overlap(rows[:, 1], rows[:, 3]), 0.0, None) / mean_h
    clusters = compute_groups(y_frac >= 0.5)
    fused = np.array([compute_union(rows[c]) for c in clusters])
    fused_idx = [_flatten_one([indices[i] for i in c]) for c in clusters]
    return fused, fused_idx


def align_rows(rows, mode, center_threshold=1e-2):
    """Snap line borders inside a paragraph: 'left' aligns left edges,
    'right' aligns right edges, 'auto' keeps centered blocks untouched and
    left-aligns everything else (combination.py:82-96 behavior)."""
    if len(rows) == 1:
        return rows
    if mode == "auto":
        mid = (rows[:, 0] + rows[:, 2]) / 2.0
        centered = np.all(np.abs(mid - np.mean(mid)) < center_threshold)
        if not centered:
            mode = "left"
    if mode == "left":
        rows[:, 0] = np.min(rows[:, 0])
    elif mode == "right":
        rows[:, 2] = np.max(rows[:, 2])
    return rows


def group_boxes(boxes, indices, groups, *, sort=None, rows=None, check_rows=None, align_borders=None):
    """Collapse each component to (union box, merged indices, member rows)
    (combination.py:104-148 behavior).

    ``sort`` picks the coordinate column that orders members inside a
    component (0 = x for line assembly, 1 = y for paragraph assembly); the
    sort is stable over input index. When ``rows`` is given (paragraph
    stage), same-line re-merging and border alignment default on.
    """
    if rows is not None:
        if check_rows is None:
            check_rows = True
        if align_borders is None:
            align_borders = "auto"

    out_boxes, out_indices, out_rows = [], [], []
    for comp in groups:
        comp = sorted(comp)
        if sort is not None and len(comp) > 1:
            comp = sorted(comp, key=lambda k: boxes[k, sort])

        comp_boxes = boxes[comp]
        out_boxes.append(compute_union(comp_boxes))

        if rows is None:
            out_indices.append([indices[k] for k in comp])
            out_rows.append(comp_boxes)
        elif len(comp) == 1:
            out_indices.append(indices[comp[0]])
            out_rows.append(rows[comp[0]])
        else:
            out_indices.append(_flatten_one([indices[k] for k in comp]))
            out_rows.append(np.concatenate([rows[k] for k in comp], axis=0))

    if check_rows:
        out_rows, out_indices = merge_rows(out_rows, out_indices)
        out_rows, out_indices = list(out_rows), list(out_indices)

    if align_borders:
        out_rows = [align_rows(r, align_borders) for r in out_rows]

    return np.array(out_boxes), out_indices, out_rows


# --------------------------------------------------------------------------
# the three combination passes
# --------------------------------------------------------------------------

def combine_boxes_horizontal(
    boxes,
    *,
    indices=None,
    h_factor=1.5,
    x_threshold=None,
    y_overlap_threshold=0.55,
    **kwargs,
):
    """Words -> lines. Edge i~j iff the x reading-gap is within
    ``x_threshold`` (default ``median(h) * h_factor`` — a "space" is about
    one glyph height) AND y-overlap covers >= ``y_overlap_threshold`` of
    the taller box. Members order by x0."""
    boxes = np.asarray(boxes, dtype=np.float64)
    if indices is None:
        indices = list(range(len(boxes)))
    if len(boxes) <= 1:
        return boxes, [indices], [boxes]

    heights = boxes[:, 3] - boxes[:, 1]
    if x_threshold is None:
        x_threshold = np.median(heights) * h_factor

    x_gap = _edge_gap(boxes[:, 0], boxes[:, 2])
    y_shared = np.clip(_pair_overlap(boxes[:, 1], boxes[:, 3]), 0.0, None)
    taller = np.maximum.outer(heights, heights)
    y_frac = np.zeros_like(y_shared)
    np.divide(y_shared, taller, out=y_frac, where=taller > 0)

    same_line = (x_gap <= x_threshold) & (y_frac >= y_overlap_threshold)
    return group_boxes(boxes, indices, compute_groups(same_line), sort=0)


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
    """Lines -> paragraphs. Edge i~j iff the y reading-gap is within
    ``y_threshold`` (default ``max(median(h)/4, 1e-2)`` — tight leading),
    heights differ by <= ``h_threshold`` (same font), and the LEFT portions
    of the lines overlap horizontally (the ``shift_factor`` trim makes a
    short last line still attach to its paragraph). Members order by y0."""
    boxes = np.asarray(boxes, dtype=np.float64)
    if indices is None:
        indices = list(range(len(boxes)))
    if len(boxes) <= 1:
        return boxes, [indices], [boxes]

    heights = boxes[:, 3] - boxes[:, 1]
    if y_threshold is None:
        y_threshold = max(np.median(heights) / 4.0, 1e-2)

    y_gap = _edge_gap(boxes[:, 1], boxes[:, 3])
    same_font = np.abs(np.subtract.outer(heights, heights)) <= h_threshold

    trim = (boxes[:, 2] - boxes[:, 0]) * shift_factor
    left_hi = boxes[:, 2] - trim
    left_lap = np.minimum.outer(left_hi, left_hi) - np.maximum.outer(
        boxes[:, 0], boxes[:, 0]
    )
    if x_overlap_threshold == 0.0:
        lefts_meet = left_lap > 0.0
    else:
        lefts_meet = left_lap / np.minimum.outer(trim, trim) > x_overlap_threshold

    stacked = (y_gap <= y_threshold) & same_font & lefts_meet
    return group_boxes(boxes, indices, compute_groups(stacked), sort=1)


def combine_boxes_overlap(boxes, indices=None, overlap_threshold=0.5, *, rows=None, **kwargs):
    """Merge paragraphs whose IoA exceeds ``overlap_threshold``
    (combination.py:331-337 behavior)."""
    boxes = np.asarray(boxes, dtype=np.float64)
    if indices is None:
        indices = list(range(len(boxes)))
    if len(boxes) == 0:
        # empty input would crash the group unpack below; note len==1 MUST
        # still run group_boxes — merge_rows/align_rows apply to the single
        # paragraph's member rows (the overlap pass is unconditional)
        return boxes, indices, []
    nested = compute_ioa(boxes, as_matrix=True) > overlap_threshold
    return group_boxes(
        boxes, indices, compute_groups(nested), sort=1, rows=rows, **kwargs
    )


def combine_boxes(boxes, indices=None, **kwargs):
    """Full pipeline: horizontal -> vertical -> overlap (combination.py:339-361).

    Returns (paragraph_boxes, nested_indices, line_rows_per_paragraph).
    """
    lines, line_idx, _ = combine_boxes_horizontal(boxes, indices=indices, **kwargs)
    paras, para_idx, rows = combine_boxes_vertical(lines, indices=line_idx, **kwargs)
    return combine_boxes_overlap(paras, para_idx, rows=rows, **kwargs)
