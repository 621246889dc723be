"""AVI container codec (kernels/avicodec.py) and the video_frames
operator: DIB exact round-trip with pinned orientation, MJPEG frames
through the repo's JPEG decoder, tolerant chunk walk, malformed-input
policy, and fuzz."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from ocr_spark.kernels.avicodec import AviError, avi_decode_frames, avi_encode
from ocr_spark.kernels.imagecodec import jpeg_decode, jpeg_encode


def test_dib_roundtrip_exact_and_orientation():
    # width 6 -> row stride needs padding (6*3=18 -> 20); distinct corner
    # pixel pins top-down RGB orientation through the bottom-up BGR wire
    img = np.zeros((4, 6, 3), dtype=np.uint8)
    img[0, 0] = (255, 10, 20)   # top-left red-ish
    img[3, 5] = (1, 2, 3)       # bottom-right
    frames, fps, w, h = avi_decode_frames(avi_encode([img, img + 1], fps=25))
    assert (fps, w, h) == (25, 6, 4)
    assert len(frames) == 2
    assert (frames[0] == img).all()
    assert (frames[1] == img + 1).all()


def test_mjpeg_frames_route_through_jpeg_decoder():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, size=(16, 16, 3), dtype=np.uint8)
    jp = jpeg_encode(img, quality=90)
    frames, fps, w, h = avi_decode_frames(
        avi_encode([jp, jp], fps=10, size=(16, 16))
    )
    assert (w, h) == (16, 16) and len(frames) == 2
    # byte-identical to decoding the same JPEG directly
    direct = jpeg_decode(jp)
    if direct.ndim == 2:
        direct = np.stack([direct] * 3, axis=-1)
    assert (frames[0] == direct).all()


def test_broken_frame_skipped_others_survive():
    img = np.full((4, 4, 3), 9, dtype=np.uint8)
    blob = bytearray(avi_encode([img, img], fps=10))
    # corrupt the SECOND frame payload (flip bytes near the end)
    blob[-10:-6] = b"\xff\xff\xff\xff"
    frames, _, _, _ = avi_decode_frames(bytes(blob))
    assert len(frames) >= 1 and (frames[0] == img).all()


def test_malformed_raises_avierror():
    for blob in (b"", b"RIFF\x00\x00\x00\x00WAVE", b"RIFF\x04\x00\x00\x00AVI "):
        with pytest.raises(AviError):
            avi_decode_frames(blob)
    with pytest.raises(AviError):
        avi_encode([])


@given(st.binary(max_size=300))
@settings(max_examples=150, deadline=None)
def test_avi_decode_garbage_raises_only_avierror(blob):
    try:
        avi_decode_frames(blob)
    except AviError:
        pass


@given(
    st.lists(st.integers(min_value=0, max_value=255), min_size=1, max_size=6),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=9),
)
@settings(max_examples=100, deadline=None)
def test_avi_dib_roundtrip_fuzz(values, w, h):
    frames_in = [np.full((h, w, 3), v, dtype=np.uint8) for v in values]
    frames, _, ww, hh = avi_decode_frames(avi_encode(frames_in, fps=5))
    assert (ww, hh) == (w, h) and len(frames) == len(frames_in)
    for got, exp in zip(frames, frames_in):
        assert (got == exp).all()


def test_video_frames_spark(spark):
    from ocr_spark.operators.multimodal import video_frames

    img = np.full((6, 8, 3), 2, dtype=np.uint8)
    rows = pd.DataFrame(
        {
            "blob_id": [1, 2],
            "blob": [avi_encode([img, img, img], fps=10), b"junk"],
        }
    )
    out = video_frames(spark.createDataFrame(rows), every_k=2).collect()
    got = {(r.blob_id, r.frame_idx): r.pixel_sum for r in out}
    assert got == {(1, 0): 6 * 8 * 3 * 2, (1, 2): 6 * 8 * 3 * 2}


def test_parse_vtt_blocks_and_timestamps():
    from ocr_spark.kernels.vtt import parse_vtt

    body = (
        "WEBVTT\n\nNOTE a comment\nthat spans lines\n\n"
        "id-1\n00:01.500 --> 00:03.250\nhello\nworld\n\n"
        "01:02:03.004 --> 01:02:04.500 align:start\nsecond cue\n\n"
        "bad --> cue\nskipped text\n\n"
        "00:05.000 --> 00:04.000\nnegative duration dropped\n"
    )
    cues = parse_vtt(body)
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in cues] == [
        (1500, 3250, "hello\nworld"),
        (3723004, 3724500, "second cue"),
    ]
    assert [c["cue_idx"] for c in cues] == [0, 1]
    # bytes with BOM, malformed junk: never raises
    assert parse_vtt(b"\xef\xbb\xbfWEBVTT\n") == []
    assert parse_vtt(b"\x00\xff garbage") == []


def test_vtt_cues_spark_zero_exchange(spark):
    from ocr_spark.operators.multimodal import vtt_cues

    df = spark.createDataFrame(
        [(1, "WEBVTT\n\n00:01.000 --> 00:02.000\nhi\n"), (2, None)],
        "blob_id long, vtt string",
    )
    out = vtt_cues(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = out.collect()
    assert len(rows) == 1 and rows[0].start_ms == 1000 and rows[0].text == "hi"
