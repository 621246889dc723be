"""Tests for the EAST map decode kernel (D2) + merge/split text (F7).

EAST semantics per /root/reference/models/detection/east.py:64-190;
merge_texts fixtures verbatim from
/root/reference/tests/test_utils_text.py:190-207.
"""

import numpy as np
import pytest

from ocr_spark.kernels.boxes import convert_boxes
from ocr_spark.kernels.east_decode import decode_east_output, restore_polys_from_map
from ocr_spark.kernels.textproc import merge_texts, split_text


def _make_map(h=16, w=16, cells=((4, 4), (10, 12))):
    """Synthesize an axis-aligned EAST output: for each hot cell, score=0.9,
    distances (top,bottom,left,right) = 8px each, angle=0."""
    out = np.zeros((h, w, 6), dtype=np.float64)
    for (r, c) in cells:
        out[r, c, 0] = 0.9
        out[r, c, 1:5] = 8.0 / 512.0  # geo channels scaled by 1/512
        out[r, c, 5] = 0.5  # theta = (0.5 - 0.5) * pi = 0
    return out


def test_decode_axis_aligned():
    input_shape = np.array([64, 64])  # 4x upscale from 16x16 grid
    out = _make_map()
    boxes = decode_east_output(out, input_shape, obj_threshold=0.5)
    assert boxes["format"] == "poly"
    assert boxes["boxes"].shape == (2, 4, 2)
    np.testing.assert_allclose(boxes["scores"], [0.9, 0.9])

    # cell (4,4) -> pixel (16,16), distances 8 -> poly corners (8..24)/64
    xyxy = convert_boxes(boxes["boxes"].astype(np.float64), "poly", "xyxy")
    np.testing.assert_allclose(xyxy[0], [8 / 64, 8 / 64, 24 / 64, 24 / 64], atol=1e-6)
    # y-sorted: cell row 4 before row 10
    assert xyxy[0][1] < xyxy[1][1]


def test_decode_rotated_box_stays_in_bounds():
    out = _make_map(cells=((8, 8),))
    out[8, 8, 5] = 0.5 + 0.25 / np.pi * 2  # theta = 0.5 rad-ish rotation
    boxes = decode_east_output(out, np.array([64, 64]), obj_threshold=0.5)
    assert len(boxes["boxes"]) == 1
    poly = boxes["boxes"][0] * 64
    # rotated square, same center
    np.testing.assert_allclose(poly.mean(axis=0), [32, 32], atol=1e-4)


def test_decode_filters_out_of_image():
    # hot cell at the very corner: > 1 corner falls outside -> dropped
    out = _make_map(cells=((0, 0),))
    boxes = decode_east_output(out, np.array([64, 64]), obj_threshold=0.5)
    assert len(boxes["boxes"]) == 0


def test_threshold_passthrough():
    out = _make_map()
    boxes = decode_east_output(out, np.array([64, 64]), obj_threshold=0.95)
    assert len(boxes["boxes"]) == 0


@pytest.mark.parametrize(
    "texts,max_length,target",
    [
        (["a", "b", "c", "d"], 2, [[0, 1], [2, 3]]),
        (["a", "b", "c", "d"], 3, [[0, 1, 2], [3]]),
        (["ab", "c", "def", "g"], 3, [[0, 1], [2], [3]]),
    ],
)
def test_merging_simple(texts, max_length, target):
    _, _, indices = merge_texts(texts, max_length)
    assert indices == target


@pytest.mark.parametrize(
    "texts,max_length,target",
    [
        (["a", "b", "c", "d"], 2, [[0, 1], [2, 3]]),
        (["ab", "c", "def", "g"], 3, [[0, 1, 2], [3]]),
        (["Hello World", "!"], 3, [[0, 1]]),
        (["Hello", "World", "!", "This", "is a test"], 3, [[0, 1, 2], [3], [4]]),
    ],
)
def test_merging_words(texts, max_length, target):
    _, _, indices = merge_texts(texts, max_length, tokenizer=lambda t: t.split())
    assert indices == target


def test_split_text_respects_max_length():
    text = "First sentence here. Second sentence is a bit longer. Third one."
    chunks = split_text(text, 30)
    assert all(len(c) <= 30 + 5 for c in chunks)
    # content preserved in order
    joined = " ".join(chunks)
    assert "First sentence" in joined and "Third one" in joined


def test_yolo_decode_basic():
    """D7 decode: grid-unit centers normalize, low-score overlapping anchor
    suppressed, labels from argmax class."""
    import numpy as np

    from ocr_spark.kernels.yolo_decode import decode_yolo_output

    out = np.zeros((4, 4, 2, 5 + 2), dtype=np.float64)
    # cell (1,2): confident class-1 box, centered at grid (2.5, 1.5), size 2x1
    out[1, 2, 0, :4] = [2.5, 1.5, 2.0, 1.0]
    out[1, 2, 0, 4] = 1.0
    out[1, 2, 0, 6] = 0.9  # class 1
    # same cell, overlapping lower-score anchor, same class -> suppressed
    out[1, 2, 1, :4] = [2.6, 1.5, 2.0, 1.0]
    out[1, 2, 1, 4] = 1.0
    out[1, 2, 1, 6] = 0.6
    # far cell, different class, survives independently
    out[3, 0, 0, :4] = [0.5, 3.5, 1.0, 1.0]
    out[3, 0, 0, 4] = 0.8
    out[3, 0, 0, 5] = 0.9  # class 0

    boxes, labels, scores = decode_yolo_output(out, obj_threshold=0.35, nms_threshold=0.3)
    assert len(boxes) == 2
    got = {int(l): (b, s) for b, l, s in zip(boxes, labels, scores)}
    np.testing.assert_allclose(got[1][0], [0.375, 0.25, 0.875, 0.5], atol=1e-9)
    assert got[1][1] == 0.9
    np.testing.assert_allclose(got[0][0], [0.0, 0.75, 0.25, 1.0], atol=1e-9)


def test_yolo_decode_clamps_and_drops_degenerate():
    import numpy as np

    from ocr_spark.kernels.yolo_decode import decode_yolo_output

    out = np.zeros((2, 2, 1, 6), dtype=np.float64)
    # center at the very corner with a huge box: clamps to [0,1]
    out[0, 0, 0, :4] = [0.0, 0.0, 10.0, 10.0]
    out[0, 0, 0, 4] = 1.0
    out[0, 0, 0, 5] = 0.9
    # zero-size box: degenerate, dropped despite the high score
    out[1, 1, 0, :4] = [1.5, 1.5, 0.0, 0.0]
    out[1, 1, 0, 4] = 1.0
    out[1, 1, 0, 5] = 0.9
    boxes, labels, scores = decode_yolo_output(out)
    assert len(boxes) == 1
    np.testing.assert_allclose(boxes[0], [0.0, 0.0, 1.0, 1.0], atol=1e-9)


def test_yolo_operator_on_spark(spark):
    from ocr_spark.operators.detect_maps import (
        detect_yolo_from_maps,
        synth_yolo_maps_df,
    )
    from tests.conftest import SF_SMOKE

    out = detect_yolo_from_maps(synth_yolo_maps_df(spark, SF_SMOKE, limit=50))
    rows = out.collect()
    assert len(rows) > 50  # multiple detections per map
    assert all(0.0 <= r.x0 <= r.x1 <= 1.0 for r in rows)
    assert all(r.score > 0.35 for r in rows)
