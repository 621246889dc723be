"""Grouped box operators over the exploded representation:
one row per detected box (url/group key, box_id, x0..y1, score).

This is the applyInPandas path of SURVEY.md §2.5/§2.7 — used when boxes
arrive as a table (e.g. from a separate detector job) instead of inline in
the extraction mapInPandas. Components never span documents, so the group
key bounds every O(N^2) kernel (SURVEY.md §2.3 J1-J3 note).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from ..kernels.boxes import convert_boxes
from ..kernels.combine import combine_boxes
from ..kernels.nms import nms as nms_kernel
from ..kernels.sort import sort_boxes_xywh

COMBINE_SCHEMA = (
    "url string, para_id int, x0 double, y0 double, x1 double, y1 double, "
    "n_lines int, n_members int"
)
NMS_SCHEMA = "url string, box_id int, x0 double, y0 double, x1 double, y1 double, score double"
ORDER_SCHEMA = "url string, box_id int, reading_rank int"


def grouped_map_in_pandas(df: DataFrame, key: str, fn_group, schema: str) -> DataFrame:
    """applyInPandas semantics without its tiny-group overhead.

    ``GroupedData.applyInPandas`` materializes one Arrow batch per GROUP —
    measured ~4ms/group, which dominates when groups are small (thousands of
    docs x tens of boxes). Instead: hash-repartition by key, sort within
    partitions, then ONE mapInPandas whose generator runs a vectorized
    pandas groupby per Arrow chunk, carrying the (contiguous) tail group
    across chunk boundaries. Same grouping semantics, ~6x fewer
    Python/Arrow round-trips.
    """

    def gen(batches):
        import pandas as pd

        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_key = pdf[key].iloc[-1]
            # NaN-aware tail match: a null group key is a regular group in
            # applyInPandas semantics, not a row to drop
            if pd.isna(last_key):
                is_tail = pdf[key].isna()
            else:
                is_tail = pdf[key] == last_key
            head, carry = pdf[~is_tail], pdf[is_tail]
            if len(head):
                outs = [
                    fn_group(g)
                    for _, g in head.groupby(key, sort=False, dropna=False)
                ]
                yield pd.concat(outs, ignore_index=True)
        if carry is not None and len(carry):
            outs = [
                fn_group(g)
                for _, g in carry.groupby(key, sort=False, dropna=False)
            ]
            yield pd.concat(outs, ignore_index=True)

    n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    parts = df.repartition(n_parts, key).sortWithinPartitions(key)
    return parts.mapInPandas(gen, schema=schema)


def combine_boxes_grouped(boxes_df: DataFrame, key: str = "url") -> DataFrame:
    """words -> paragraphs per group; returns paragraph boxes + stats."""

    def fn(pdf):
        import pandas as pd

        pdf = pdf.sort_values("box_id", kind="stable")
        arr = pdf[["x0", "y0", "x1", "y1"]].to_numpy(dtype=np.float64)
        url = pdf[key].iloc[0]
        combined, indices, rows = combine_boxes(arr)
        out = []
        for p in range(len(combined)):
            members = indices[p]
            n_members = sum(
                len(g) if isinstance(g, list) else 1 for g in members
            ) if isinstance(members, list) else 1
            out.append(
                {
                    "url": url,
                    "para_id": p,
                    "x0": combined[p][0],
                    "y0": combined[p][1],
                    "x1": combined[p][2],
                    "y1": combined[p][3],
                    "n_lines": len(rows[p]),
                    "n_members": n_members,
                }
            )
        return pd.DataFrame(out, columns=[c.split(" ")[0] for c in COMBINE_SCHEMA.split(", ")])

    return grouped_map_in_pandas(boxes_df, key, fn, COMBINE_SCHEMA)


def nms_grouped(boxes_df: DataFrame, *, key: str = "url", method: str = "nms", nms_threshold: float = 0.25, **kw) -> DataFrame:
    """Per-group NMS/LANMS; emits surviving boxes in score order."""

    def fn(pdf):
        import pandas as pd

        pdf = pdf.sort_values("box_id", kind="stable")
        arr = pdf[["x0", "y0", "x1", "y1"]].to_numpy(dtype=np.float64)
        scores = pdf["score"].to_numpy(dtype=np.float64) if "score" in pdf else None
        url = pdf[key].iloc[0]
        boxes, out_scores, valids = nms_kernel(
            arr, scores, method=method, nms_threshold=nms_threshold, **kw
        )
        boxes = np.asarray(boxes)[valids]
        if out_scores is not None:
            out_scores = np.asarray(out_scores)[valids]
        else:
            out_scores = np.ones(len(boxes))
        return pd.DataFrame(
            {
                "url": url,
                "box_id": np.arange(len(boxes), dtype=np.int32),
                "x0": boxes[:, 0] if len(boxes) else [],
                "y0": boxes[:, 1] if len(boxes) else [],
                "x1": boxes[:, 2] if len(boxes) else [],
                "y1": boxes[:, 3] if len(boxes) else [],
                "score": out_scores,
            }
        )

    return grouped_map_in_pandas(boxes_df, key, fn, NMS_SCHEMA)


def reading_order_grouped(boxes_df: DataFrame, *, key: str = "url", method: str = "top") -> DataFrame:
    """Per-group reading-order rank (the 'top' banding sort, W7)."""

    def fn(pdf):
        import pandas as pd

        pdf = pdf.sort_values("box_id", kind="stable").reset_index(drop=True)
        xyxy = pdf[["x0", "y0", "x1", "y1"]].to_numpy(dtype=np.float64)
        order = sort_boxes_xywh(convert_boxes(xyxy, "xyxy", "xywh"), method=method)
        ranks = np.empty(len(order), dtype=np.int64)
        ranks[order] = np.arange(len(order))
        return pd.DataFrame(
            {"url": pdf[key], "box_id": pdf["box_id"], "reading_rank": ranks}
        )

    return grouped_map_in_pandas(boxes_df, key, fn, ORDER_SCHEMA)
