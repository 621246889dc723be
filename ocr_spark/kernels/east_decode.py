"""EAST score/geo/theta map decode -> polygons (D2, the "detect" decode).

Semantics parity (reference citations, behavior only — new implementation):
- restore_polys_from_map: threshold the score map, y-sort the surviving
  pixels, restore rotated rectangles from per-pixel distances + angle,
  scale grid -> input, drop polys with > 1 corner out of image, normalize
  to relative: /root/reference/models/detection/east.py:102-190
- decode_output map scaling: geo * 512 px offsets, theta = (v - 0.5) * pi:
  /root/reference/models/detection/east.py:64-95
- downstream NMS ('lanms' default) lives in kernels.nms.

We do not run the CNN (SURVEY.md §2.7 D1): score/geo/theta maps arrive as
fixtures or from an external detector table; this kernel reproduces the
decode exactly and is exercised per Arrow batch inside mapInPandas.
"""

from __future__ import annotations

import numpy as np


def get_rotation_matrix(theta: np.ndarray) -> np.ndarray:
    return np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])


def filter_polys(res: np.ndarray, input_shape: np.ndarray) -> np.ndarray:
    """Keep polys with at most 1 corner outside the image (east.py:183-187)."""
    shape_wh = input_shape[::-1][None, None, :]
    return (
        np.count_nonzero(
            np.any(res < 0, axis=-1) | np.any(res >= shape_wh, axis=-1), axis=-1
        )
        <= 1
    )


def restore_polys(pos, d, angle, input_shape, output_shape):
    """Per-pixel distances (top,bottom,left,right) + angle -> 4x2 corners,
    rotated by -angle about the pixel center (east.py:153-181)."""
    scale = input_shape // output_shape
    pos = pos * scale[None]

    x, y = pos[:, 0], pos[:, 1]
    y_min, y_max = y - d[:, 0], y + d[:, 1]
    x_min, x_max = x - d[:, 2], x + d[:, 3]

    rotate_mat = get_rotation_matrix(-angle)

    temp_x = np.array([[x_min, x_max, x_max, x_min]]) - x
    temp_y = np.array([[y_min, y_min, y_max, y_max]]) - y
    coordinates = np.concatenate((temp_x, temp_y), axis=0)

    res = np.matmul(
        np.transpose(coordinates, [2, 1, 0]), np.transpose(rotate_mat, [2, 1, 0])
    )
    res[:, :, 0] += x[:, np.newaxis]
    res[:, :, 1] += y[:, np.newaxis]

    mask = filter_polys(res, input_shape)
    return res[mask], np.argwhere(mask)[:, 0]


def restore_polys_from_map(
    score_map,
    geo_map,
    theta_map,
    input_shape,
    output_shape,
    *,
    normalize: bool = True,
    threshold: float = 0.5,
):
    """Full decode of one map (east.py:102-151). Returns dict with 'boxes'
    (N, 4, 2) float32 relative polys, 'scores' (N,), 'format'='poly'."""
    score_map = np.asarray(score_map)
    geo_map = np.asarray(geo_map)
    theta_map = np.asarray(theta_map)
    input_shape = np.asarray(input_shape)
    output_shape = np.asarray(output_shape)

    if score_map.ndim == 3:
        score_map = score_map[:, :, 0]
        theta_map = theta_map[:, :, 0]

    points = np.argwhere(score_map > threshold)
    points = points[np.argsort(points[:, 0], kind="stable")]
    scores = score_map[points[:, 0], points[:, 1]]

    valid_polys, valid_indices = restore_polys(
        points[:, ::-1],
        geo_map[points[:, 0], points[:, 1]],
        theta_map[points[:, 0], points[:, 1]],
        input_shape,
        output_shape,
    )
    scores = scores[valid_indices]

    if normalize:
        input_shape_wh = input_shape[::-1].reshape(1, 1, 2)
        valid_polys = (valid_polys / input_shape_wh).astype(np.float32)

    return {"boxes": valid_polys, "scores": scores, "format": "poly"}


def decode_east_output(output, input_shape, *, obj_threshold: float = 0.35, normalize: bool = True):
    """Raw model-output tensor (h, w, 6) -> polys, with the reference's
    channel scaling: score = [..0], geo = [..1:5] * 512, theta =
    ([..5] - 0.5) * pi (east.py:79-90). Default obj_threshold 0.35 per
    base_detector.py:39-44."""
    output = np.asarray(output)
    return restore_polys_from_map(
        score_map=output[..., :1],
        geo_map=output[..., 1:5] * 512,
        theta_map=(output[..., 5:6] - 0.5) * np.pi,
        input_shape=np.asarray(input_shape),
        output_shape=np.asarray(output.shape[:-1]),
        normalize=normalize,
        threshold=obj_threshold,
    )
