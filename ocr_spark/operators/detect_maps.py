"""Detection-decode operator: EAST output maps -> boxes rows (D2+D3-D6).

The standalone "detect" slice of SURVEY.md §3.2: a table of per-page model
output maps (as flattened float arrays + shape) decodes to polygons, runs
LANMS, and emits one row per surviving box. One mapInPandas stage — maps
never leave the Arrow batch; downstream ordering/recognition consume the
boxes table (boxes_ops / recognize).

Map fixtures are synthesized deterministically (synth_east_map) since the
CNN itself is out of scope (SURVEY.md §2.7 D1).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from ..kernels.boxes import convert_boxes
from ..kernels.east_decode import decode_east_output
from ..kernels.nms import nms as nms_kernel

DETECT_SCHEMA = (
    "url string, box_id int, x0 double, y0 double, x1 double, y1 double, score double"
)


def synth_east_map(seed: int, grid: int = 16, n_boxes: int = 3):
    """Deterministic fake EAST output (grid, grid, 6) for doc ``seed``:
    axis-aligned hot cells on a diagonal-ish layout."""
    out = np.zeros((grid, grid, 6), dtype=np.float32)
    rng = np.random.RandomState(seed)
    rows = rng.choice(np.arange(2, grid - 2), size=n_boxes, replace=False)
    cols = rng.choice(np.arange(2, grid - 2), size=n_boxes, replace=False)
    for r, c in zip(rows, cols):
        out[r, c, 0] = 0.6 + (r % 4) * 0.1
        out[r, c, 1:5] = (4.0 + (c % 3)) / 512.0
        out[r, c, 5] = 0.5
    return out


def detect_from_maps(
    maps_df: DataFrame,
    *,
    obj_threshold: float = 0.35,
    nms_threshold: float = 0.2,
    nms_method: str = "lanms",
    merge_threshold: float = 0.3,
) -> DataFrame:
    """maps table (url string, h int, w int, map array<float> flattened
    (h, w, 6)) -> surviving boxes rows. Defaults mirror base_detector.py:39-44
    (obj 0.35) and the EAST 'lanms' path (east.py:91-94)."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for url, h, w, flat in zip(pdf["url"], pdf["h"], pdf["w"], pdf["map"]):
                out = np.asarray(flat, dtype=np.float32).reshape(int(h), int(w), 6)
                decoded = decode_east_output(
                    out, np.array([int(h) * 4, int(w) * 4]), obj_threshold=obj_threshold
                )
                polys, scores = decoded["boxes"], decoded["scores"]
                if len(polys) == 0:
                    continue
                xyxy = convert_boxes(polys.astype(np.float64), "poly", "xyxy")
                boxes, out_scores, valids = nms_kernel(
                    xyxy,
                    scores,
                    method=nms_method,
                    nms_threshold=nms_threshold,
                    merge_threshold=merge_threshold,
                )
                kept = np.asarray(boxes)[valids]
                kept_scores = (
                    np.asarray(out_scores)[valids] if out_scores is not None else np.ones(len(kept))
                )
                for i, (b, s) in enumerate(zip(kept, kept_scores)):
                    rows.append(
                        {
                            "url": url,
                            "box_id": i,
                            "x0": float(b[0]),
                            "y0": float(b[1]),
                            "x1": float(b[2]),
                            "y1": float(b[3]),
                            "score": float(s),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["url", "box_id", "x0", "y0", "x1", "y1", "score"]
            )

    return maps_df.mapInPandas(gen, schema=DETECT_SCHEMA)


def synth_maps_df(spark, sf_dir: str, limit: int = 200) -> DataFrame:
    """Deterministic maps table derived from part keys (fixture source)."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for key in pdf["p_partkey"]:
                m = synth_east_map(int(key) % 1000)
                rows.append(
                    {
                        "url": f"map{int(key)}",
                        "h": m.shape[0],
                        "w": m.shape[1],
                        "map": m.ravel().tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=["url", "h", "w", "map"])

    parts = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey").limit(limit)
    return parts.mapInPandas(gen, schema="url string, h int, w int, map array<float>")


YOLO_SCHEMA = (
    "url string, box_id int, label int, x0 double, y0 double, x1 double, "
    "y1 double, score double"
)


def synth_yolo_map(seed: int, grid: int = 8, nb_box: int = 2, nb_class: int = 3):
    """Deterministic fake YOLOv2 output (grid, grid, nb_box, 5+nb_class):
    a few confident cells with grid-unit centers/sizes, plus one
    deliberately-overlapping pair so NMS always has work."""
    rng = np.random.RandomState(seed)
    out = np.zeros((grid, grid, nb_box, 5 + nb_class), dtype=np.float32)
    cells = rng.choice(grid * grid, size=3, replace=False)
    for k, cell in enumerate(cells):
        r, c = divmod(int(cell), grid)
        out[r, c, 0, 0:4] = [c + 0.5, r + 0.5, 1.6, 1.2]  # grid units
        out[r, c, 0, 4] = 0.9
        out[r, c, 0, 5 + (k % nb_class)] = 0.8
        # overlapping anchor in the same cell, lower score -> suppressed
        out[r, c, 1, 0:4] = [c + 0.6, r + 0.5, 1.6, 1.2]
        out[r, c, 1, 4] = 0.8
        out[r, c, 1, 5 + (k % nb_class)] = 0.7
    return out


def detect_yolo_from_maps(
    maps_df: DataFrame,
    *,
    obj_threshold: float = 0.35,
    nms_threshold: float = 0.2,
    grid: int = 8,
    nb_box: int = 2,
    nb_class: int = 3,
) -> DataFrame:
    """maps table (url, map flattened (grid, grid, nb_box, 5+nb_class)) ->
    one row per surviving detection (D7; kernels/yolo_decode.py)."""
    from ..kernels.yolo_decode import decode_yolo_output

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for url, flat in zip(pdf["url"], pdf["map"]):
                out = np.asarray(flat, dtype=np.float32).reshape(
                    grid, grid, nb_box, 5 + nb_class
                )
                boxes, labels, scores = decode_yolo_output(
                    out, obj_threshold=obj_threshold, nms_threshold=nms_threshold
                )
                for i in range(len(boxes)):
                    rows.append(
                        {
                            "url": url,
                            "box_id": i,
                            "label": int(labels[i]),
                            "x0": round(float(boxes[i, 0]), 6),
                            "y0": round(float(boxes[i, 1]), 6),
                            "x1": round(float(boxes[i, 2]), 6),
                            "y1": round(float(boxes[i, 3]), 6),
                            "score": round(float(scores[i]), 6),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["url", "box_id", "label", "x0", "y0", "x1", "y1", "score"],
            )

    return maps_df.mapInPandas(gen, schema=YOLO_SCHEMA)


def synth_yolo_maps_df(spark, sf_dir: str, limit: int = 200) -> DataFrame:
    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for key in pdf["p_partkey"]:
                m = synth_yolo_map(int(key) % 1000)
                rows.append({"url": f"ymap{int(key)}", "map": m.ravel().tolist()})
            yield pd.DataFrame(rows, columns=["url", "map"])

    parts = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey").limit(limit)
    return parts.mapInPandas(gen, schema="url string, map array<float>")
