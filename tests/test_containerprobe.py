"""MP4/WebM container metadata probes (kernels/containerprobe) + the
video_meta operator: build -> probe identity, truncation/garbage
tolerance, unknown-container accounting."""

import pytest

from ocr_spark.kernels.containerprobe import (
    mp4_build,
    mp4_probe,
    video_container_probe,
    webm_build,
    webm_probe,
)

TRACKS = [
    {"track_type": "video", "codec": "avc1", "width": 640, "height": 360},
    {"track_type": "audio", "codec": "mp4a"},
]


def test_mp4_roundtrip():
    b = mp4_build(
        major_brand="mp42", timescale=700, duration_ticks=1234, tracks=TRACKS
    )
    m = mp4_probe(b)
    assert m["container"] == "mp4" and m["major_brand"] == "mp42"
    assert m["timescale"] == 700 and m["duration_ms"] == 1234 * 1000 // 700
    assert [t["codec"] for t in m["tracks"]] == ["avc1", "mp4a"]
    assert m["tracks"][0]["track_type"] == "video"
    assert (m["tracks"][0]["width"], m["tracks"][0]["height"]) == (640, 360)
    assert m["tracks"][1]["track_type"] == "audio"
    assert m["tracks"][1]["width"] == 0


def test_webm_roundtrip():
    w = webm_build(
        timecode_scale=1_000_000,
        duration_ticks=4321,
        tracks=[
            {"track_type": "video", "codec": "V_VP9", "width": 1280, "height": 720},
            {"track_type": "audio", "codec": "A_OPUS"},
        ],
    )
    m = webm_probe(w)
    assert m["container"] == "webm" and m["major_brand"] == "webm"
    assert m["timescale"] == 1_000_000 and m["duration_ms"] == 4321
    assert [t["codec"] for t in m["tracks"]] == ["V_VP9", "A_OPUS"]
    assert (m["tracks"][0]["width"], m["tracks"][0]["height"]) == (1280, 720)


def test_magic_dispatch():
    b = mp4_build(tracks=TRACKS)
    w = webm_build(tracks=[])
    assert video_container_probe(b)["container"] == "mp4"
    assert video_container_probe(w)["container"] == "webm"
    assert video_container_probe(b"not a video at all") is None
    assert video_container_probe(b"") is None


@pytest.mark.parametrize("cut", [0, 5, 10, 20, 40, 80, 120])
def test_truncation_never_raises(cut):
    b = mp4_build(tracks=TRACKS)
    w = webm_build(tracks=[{"track_type": "video", "codec": "V_VP9", "width": 8, "height": 8}])
    for blob in (b[:cut], w[:cut]):
        r = video_container_probe(blob)
        assert r is None or isinstance(r, dict)


def test_corrupt_interior_never_raises():
    b = bytearray(mp4_build(tracks=TRACKS))
    for i in range(30, min(len(b), 200), 7):
        b[i] ^= 0xFF
    r = mp4_probe(bytes(b))
    assert isinstance(r, dict) and r["container"] == "mp4"
    w = bytearray(webm_build(tracks=[{"track_type": "audio", "codec": "A_OPUS"}]))
    for i in range(5, len(w), 3):
        w[i] ^= 0xA5
    assert isinstance(webm_probe(bytes(w)), dict)


def test_large_vint_and_64bit_box():
    # a >127-byte payload exercises the multi-byte VINT encoder/parser
    tracks = [
        {"track_type": "video", "codec": "V_VP9", "width": 4096, "height": 2160}
    ] + [{"track_type": "audio", "codec": "A_OPUS"}] * 6
    m = webm_probe(webm_build(duration_ticks=99999, tracks=tracks))
    assert len(m["tracks"]) == 7 and m["duration_ms"] == 99999
    assert m["tracks"][0]["width"] == 4096


def test_video_meta_operator_accounts_every_blob(spark):
    from ocr_spark.operators.multimodal import video_meta

    rows = [
        (1, mp4_build(tracks=TRACKS)),
        (2, webm_build(tracks=[])),  # valid container, no tracks
        (3, b"garbage bytes here"),
    ]
    df = spark.createDataFrame(rows, "blob_id long, blob binary")
    out = video_meta(df).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["blob_id"], []).append(r)
    assert len(by_id[1]) == 2 and by_id[1][0]["container"] == "mp4"
    assert len(by_id[2]) == 1 and by_id[2][0]["track_no"] == 0
    assert len(by_id[3]) == 1 and by_id[3][0]["container"] == "unknown"
