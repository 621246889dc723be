"""Box operators as pure Column arithmetic — the SQL-expressible subset of
SURVEY.md §2.2 (P3 SizeFilter, P4 RegionFilter, P9/F12 conversions+dezoom)
and §2.3 J1 (pairwise IoU as a join predicate/expression).

Where these suffice, no pandas UDF is ever involved: predicates push down,
expressions stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def xywh_to_xyxy(x, y, w, h) -> list[Column]:
    x, y, w, h = map(F.col, (x, y, w, h)) if isinstance(x, str) else (x, y, w, h)
    return [x, y, x + w, y + h]


def xyxy_to_xywh(x0, y0, x1, y1) -> list[Column]:
    x0, y0, x1, y1 = map(F.col, (x0, y0, x1, y1)) if isinstance(x0, str) else (x0, y0, x1, y1)
    return [x0, y0, x1 - x0, y1 - y0]


def box_area(x0="x0", y0="y0", x1="x1", y1="y1") -> Column:
    return (F.col(x1) - F.col(x0)) * (F.col(y1) - F.col(y0))


def box_size_filter(
    *, min_w: float = 0.0, min_h: float = 0.0, max_w: float = 1.0, max_h: float = 1.0
) -> Column:
    """SizeFilter (filters.py:213-241): keep boxes with w/h in range."""
    w = F.col("x1") - F.col("x0")
    h = F.col("y1") - F.col("y0")
    return (w >= min_w) & (w <= max_w) & (h >= min_h) & (h <= max_h)


def box_center_in_region(region=(0.2, 0.05, 0.6, 0.95)) -> Column:
    """RegionFilter mode='center' (filters.py:190-211), default region from
    the reference stream defaults (base_ocr.py:532,607-608)."""
    rx0, ry0, rx1, ry1 = region
    cx = (F.col("x0") + F.col("x1")) / 2
    cy = (F.col("y0") + F.col("y1")) / 2
    return (cx >= rx0) & (cx <= rx1) & (cy >= ry0) & (cy <= ry1)


def box_dezoom(factor: float, *, relative: bool = True) -> list[Column]:
    """dezoom_box as 4 column exprs (converter.py:202-228): scale about the
    center, clamp at 0 and the far border."""
    x, y = F.col("x0"), F.col("y0")
    w = F.col("x1") - F.col("x0")
    h = F.col("y1") - F.col("y0")
    new_w, new_h = w * factor, h * factor
    nx = F.greatest((x + w / 2) - new_w / 2, F.lit(0.0))
    ny = F.greatest((y + h / 2) - new_h / 2, F.lit(0.0))
    if relative:
        new_w = F.least(new_w, F.lit(1.0) - nx)
        new_h = F.least(new_h, F.lit(1.0) - ny)
    return [nx.alias("x0"), ny.alias("y0"), (nx + new_w).alias("x1"), (ny + new_h).alias("y1")]


def box_iou_cols(a: str, b: str) -> Column:
    """IoU between two struct columns {x0,y0,x1,y1} — a range-join predicate
    (the SQL shape of metrics.py:18-46)."""
    ax0, ay0, ax1, ay1 = (F.col(f"{a}.{c}") for c in ("x0", "y0", "x1", "y1"))
    bx0, by0, bx1, by1 = (F.col(f"{b}.{c}") for c in ("x0", "y0", "x1", "y1"))
    iw = F.greatest(F.least(ax1, bx1) - F.greatest(ax0, bx0), F.lit(0.0))
    ih = F.greatest(F.least(ay1, by1) - F.greatest(ay0, by0), F.lit(0.0))
    inter = iw * ih
    union = (ax1 - ax0) * (ay1 - ay0) - inter + (bx1 - bx0) * (by1 - by0)
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))
