"""Golden tests for box primitives.

Fixtures are the literal vectors from
/root/reference/tests/test_utils_boxes.py:27-234,242-272 (conversion, dezoom,
IoU/IoA exact values, sort orders).
"""

import numpy as np
import pytest

from ocr_spark.kernels.boxes import (
    compute_ioa,
    compute_iou,
    compute_union,
    convert_boxes,
)
from ocr_spark.kernels.sort import sort_boxes_xywh

IMAGE_H, IMAGE_W = 720, 1024

REL_XYWH = np.array([[0, 0, 1, 1], [0.25, 0.2, 0.1, 0.2], [0.5, 0.5, 0.5, 0.5]], dtype=np.float64)
REL_XYXY = np.array([[0, 0, 1, 1], [0.25, 0.2, 0.35, 0.4], [0.5, 0.5, 1, 1]], dtype=np.float64)
FACTOR = np.array([[IMAGE_W, IMAGE_H, IMAGE_W, IMAGE_H]], dtype=np.float64)
ABS_XYWH = (REL_XYWH * FACTOR).astype(np.int32)
ABS_XYXY = (REL_XYXY * FACTOR).astype(np.int32)


@pytest.mark.parametrize("source,target", [("xywh", "xyxy"), ("xyxy", "xywh"), ("xywh", "xywh")])
def test_convert_relative(source, target):
    src = REL_XYWH if source == "xywh" else REL_XYXY
    dst = REL_XYWH if target == "xywh" else REL_XYXY
    np.testing.assert_allclose(convert_boxes(src, source, target), dst, atol=1e-12)


def test_convert_rel_to_abs():
    out = convert_boxes(REL_XYWH, "xywh", "xyxy", normalize_mode="absolute", image_h=IMAGE_H, image_w=IMAGE_W)
    np.testing.assert_allclose(out, ABS_XYXY.astype(np.float64), atol=1e-9)


def test_convert_abs_to_rel():
    out = convert_boxes(ABS_XYWH, "xywh", "xyxy", normalize_mode="relative", image_h=IMAGE_H, image_w=IMAGE_W)
    np.testing.assert_allclose(out, REL_XYXY, atol=5e-4)


def test_poly_roundtrip():
    poly = convert_boxes(REL_XYXY, "xyxy", "poly")
    assert poly.shape == (3, 4, 2)
    back = convert_boxes(poly, "poly", "xyxy")
    np.testing.assert_allclose(back, REL_XYXY, atol=1e-12)


def test_dezoom():
    # test_utils_boxes.py:116-135 literal cases
    np.testing.assert_allclose(
        convert_boxes([0.0, 0.0, 1.0, 1.0], "xywh", dezoom_factor=0.5),
        np.array([[0.25, 0.25, 0.5, 0.5]]),
    )
    np.testing.assert_allclose(
        convert_boxes([0.0, 0.0, 1.0, 1.0], "xywh", dezoom_factor=2), np.array([[0, 0, 1, 1]])
    )
    np.testing.assert_allclose(
        convert_boxes([0.25, 0.25, 0.5, 0.5], "xywh", dezoom_factor=2), np.array([[0, 0, 1, 1]])
    )
    np.testing.assert_allclose(
        convert_boxes([0.5, 0.5, 0.5, 0.5], "xywh", dezoom_factor=2),
        np.array([[0.25, 0.25, 0.75, 0.75]]),
    )


def test_single_iou():
    box1 = np.array([[100, 101, 200, 201]], dtype=np.float64)
    box2 = box1 + 1
    np.testing.assert_allclose(compute_iou(box1, box2), [0.96097656633], atol=1e-9)


def test_iou_matrix():
    bb1 = [100, 101, 200, 201]
    bb1_off = [101, 102, 201, 202]
    top_left = [0, 2, 1, 3]
    far = [1300, 1400, 1500, 1401]
    far_pred = [1000, 1400, 1200, 1401]
    expected = np.array(
        [[0.96097656633, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 0.0]], dtype=np.float64
    )
    y_true = np.array([bb1, top_left, far], dtype=np.float64)
    y_pred = np.array([bb1_off, top_left, far_pred], dtype=np.float64)
    np.testing.assert_allclose(compute_iou(y_true, y_pred, as_matrix=True), expected, atol=1e-9)
    np.testing.assert_allclose(
        compute_iou(y_true, y_pred, as_matrix=False), np.diagonal(expected), atol=1e-9
    )


def test_ioa():
    # xywh inputs converted to xyxy first (kernel contract)
    box1 = convert_boxes(np.array([[1, 1, 5, 10]], dtype=np.float64) + 0.0, "xywh", "xyxy")
    box2 = convert_boxes(np.array([[2, 2, 10, 20]], dtype=np.float64), "xywh", "xyxy")
    box3 = convert_boxes(np.array([[0, 0, 2, 2]], dtype=np.float64), "xywh", "xyxy")
    np.testing.assert_allclose(compute_ioa(box1, box2, as_matrix=False), [36 / 50], atol=1e-9)
    boxes = np.concatenate([box1, box2, box3], axis=0)
    np.testing.assert_allclose(
        compute_ioa(boxes, as_matrix=True),
        np.array([[1.0, 36 / 50, 1 / 50], [36 / 200, 1, 0], [1 / 4, 0, 1]]),
        atol=1e-9,
    )
    np.testing.assert_allclose(
        compute_ioa(boxes, boxes[[0, 2]], as_matrix=True),
        np.array([[1, 1 / 50], [36 / 200, 0], [1 / 4, 1]]),
        atol=1e-9,
    )


def test_union():
    boxes = np.array([[0.1, 0.2, 0.3, 0.4], [0.0, 0.3, 0.5, 0.35]])
    np.testing.assert_allclose(compute_union(boxes), [0.0, 0.2, 0.5, 0.4])


@pytest.mark.parametrize(
    "method,expected",
    [
        ("x", [0, 1, 2]),
        ("y", [0, 1, 2]),
        ("w", [0, 2, 1]),
        ("h", [0, 2, 1]),
        ("area", [0, 2, 1]),
        ("center", [1, 0, 2]),
        ("corner", [0, 1, 2]),
    ],
)
def test_sort(method, expected):
    # test_utils_boxes.py:242-272
    assert sort_boxes_xywh(REL_XYWH, method=method).tolist() == expected
    assert sort_boxes_xywh(ABS_XYWH.astype(np.float64), method=method).tolist() == expected


def test_sort_top_reading_order():
    # two visual rows with tolerance; members left-to-right
    boxes_xywh = np.array(
        [
            [0.5, 0.10, 0.2, 0.05],   # row 1 right
            [0.1, 0.11, 0.2, 0.05],   # row 1 left (slightly lower center, same band)
            [0.1, 0.50, 0.2, 0.05],   # row 2
        ]
    )
    assert sort_boxes_xywh(boxes_xywh, method="top").tolist() == [1, 0, 2]


def test_combine_boxes_empty_and_single():
    import numpy as np

    from ocr_spark.kernels.combine import combine_boxes, combine_boxes_overlap

    out_boxes, out_idx, out_rows = combine_boxes_overlap(np.zeros((0, 4)))
    assert len(out_boxes) == 0 and out_idx == [] and out_rows == []

    boxes, idx, rows = combine_boxes(np.array([[0.1, 0.1, 0.4, 0.2]]))
    assert len(boxes) == 1 and len(idx) == 1 and len(rows) == 1


def test_dezoom_relative_clamps_to_unit_even_with_image_size():
    import numpy as np

    from ocr_spark.kernels.boxes import convert_boxes

    out = convert_boxes(
        np.array([[0.8, 0.8, 0.15, 0.15]]),
        "xywh",
        "xyxy",
        dezoom_factor=2.0,
        image_h=512,
        image_w=512,
    )
    assert out[0, 2] <= 1.0 + 1e-12 and out[0, 3] <= 1.0 + 1e-12
