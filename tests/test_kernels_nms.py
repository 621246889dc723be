"""Golden tests for NMS / LANMS.

Fixtures from /root/reference/tests/test_utils_boxes.py:559-637: the 4-box
chain, standard-NMS survivors [0, 2], LANMS union / average / nms-after /
iterative-merge expectations.
"""

import numpy as np

from ocr_spark.kernels.nms import lanms, nms

BOXES = np.array(
    [[0, 0, 0.2, 0.2], [0.1, 0.1, 0.3, 0.3], [0.2, 0.2, 0.4, 0.4], [0.3, 0.3, 0.5, 0.5]],
    dtype=np.float64,
)


def _survivors(result):
    boxes, _, valids = result
    return np.asarray(boxes)[np.asarray(valids)]


def test_standard_nms():
    np.testing.assert_allclose(
        _survivors(nms(BOXES, nms_threshold=0.1, method="nms")), BOXES[[0, 2]], atol=1e-12
    )


def test_nms_passthrough():
    boxes, _, valids = nms(BOXES, nms_threshold=1.0)
    assert valids.all()
    np.testing.assert_allclose(boxes, BOXES)


def test_nms_max_output_size():
    out = _survivors(nms(BOXES, nms_threshold=0.1, max_output_size=1, method="nms"))
    np.testing.assert_allclose(out, BOXES[[0]], atol=1e-12)


def test_lanms_union():
    out = _survivors(nms(BOXES, nms_threshold=0.1, merge_threshold=0.1, method="lanms"))
    np.testing.assert_allclose(
        out, np.array([[0, 0, 0.3, 0.3], [0.2, 0.2, 0.5, 0.5]]), atol=1e-12
    )


def test_lanms_average():
    out = _survivors(
        nms(BOXES, nms_threshold=0.1, merge_threshold=0.1, merge_method="average", method="lanms")
    )
    np.testing.assert_allclose(
        out, np.array([[0.05, 0.05, 0.25, 0.25], [0.25, 0.25, 0.45, 0.45]]), atol=1e-12
    )


def test_lanms_nms_after_merge():
    out = _survivors(nms(BOXES, nms_threshold=0.01, merge_threshold=0.1, method="lanms"))
    np.testing.assert_allclose(out, np.array([[0, 0, 0.3, 0.3]]), atol=1e-12)


def test_lanms_is_iterative():
    out = _survivors(nms(BOXES, nms_threshold=0.1, merge_threshold=0.01, method="lanms"))
    np.testing.assert_allclose(out, np.array([[0, 0, 0.5, 0.5]]), atol=1e-12)


def test_nms_scores_reorder():
    scores = np.array([0.1, 0.9, 0.2, 0.8])
    boxes, s, valids = nms(BOXES, scores, nms_threshold=0.1, method="nms")
    # sorted by descending score: boxes[1], boxes[3] kept (iou(1,3)=0)
    np.testing.assert_allclose(np.asarray(boxes)[valids], BOXES[[1, 3]], atol=1e-12)
    np.testing.assert_allclose(np.asarray(s)[valids], [0.9, 0.8])


def test_lanms_deterministic():
    a = lanms(BOXES, merge_threshold=0.01, nms_threshold=0.1)
    b = lanms(BOXES.copy(), merge_threshold=0.01, nms_threshold=0.1)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[2], b[2])
