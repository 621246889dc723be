"""Box drawing + the annotated-detection sink."""

import hashlib

import numpy as np

from ocr_spark.kernels.draw import draw_boxes


def test_draw_strokes_expected_pixels():
    img = np.full((10, 20), 255, dtype=np.uint8)
    out = draw_boxes(img, [(0.25, 0.2, 0.75, 0.8)], color=(255, 0, 0))
    assert out.shape == (10, 20, 3)
    # top edge row 2, cols 5..15 is red; interior stays white
    assert (out[2, 5:16] == [255, 0, 0]).all()
    assert (out[5, 10] == [255, 255, 255]).all()
    # left/right edges
    assert (out[2:9, 5] == [255, 0, 0]).all()
    assert (out[2:9, 15] == [255, 0, 0]).all()


def test_draw_clamps_and_copies():
    img = np.zeros((4, 4), dtype=np.uint8)
    out = draw_boxes(img, [(-1.0, -1.0, 2.0, 2.0)])
    assert out.shape == (4, 4, 3)
    assert (img == 0).all()  # input untouched


def test_annotate_detections_on_synth_corpus(spark):
    from ocr_spark.operators.multimodal import annotate_detections
    from ocr_spark.sources.pages import pages_df

    rows = annotate_detections(pages_df(spark, "/root/testdata/sf0.001")).collect()
    assert rows  # 5% of pages are image-flavor
    from ocr_spark.kernels.imagecodec import png_decode

    for r in rows[:3]:
        assert r.n_boxes > 0
        img = png_decode(bytes(r.annotated))
        assert img.shape == (r.height, r.width, 3)
        # something red got stroked
        red = (img[:, :, 0] == 255) & (img[:, :, 1] == 0) & (img[:, :, 2] == 0)
        assert red.any()
    # byte determinism across parallelism
    d1 = sorted((r.url, hashlib.sha256(bytes(r.annotated)).hexdigest()) for r in rows)
    rows2 = annotate_detections(
        pages_df(spark, "/root/testdata/sf0.001", partitions=3)
    ).collect()
    d2 = sorted((r.url, hashlib.sha256(bytes(r.annotated)).hexdigest()) for r in rows2)
    assert d1 == d2


def test_annotated_bytes_pinned_to_committed_fixture(spark):
    """Byte-identity of the annotated-PNG sink against a COMMITTED digest
    (tests/fixtures/annotated_digest.json) — the VERDICT r03 #4 contract:
    any drift in decode, box math, stroke rasterization, or the PNG
    encoder shows up as a digest mismatch."""
    import json
    import os

    from ocr_spark.operators.multimodal import annotate_detections
    from ocr_spark.sources.pages import pages_df

    want = json.load(
        open(
            os.path.join(
                os.path.dirname(__file__), "fixtures", "annotated_digest.json"
            )
        )
    )
    rows = annotate_detections(pages_df(spark, want["sf_dir"])).collect()
    pairs = sorted(
        (r.url, hashlib.sha256(bytes(r.annotated)).hexdigest()) for r in rows
    )
    overall = hashlib.sha256(
        "\n".join(f"{u}|{d}" for u, d in pairs).encode()
    ).hexdigest()
    assert len(pairs) == want["n_images"]
    assert overall == want["digest"]
