"""SRT subtitle alignments (kernels/srt): reference parse_subtitles
join/add_time semantics in integer milliseconds."""

import pytest

from ocr_spark.kernels.srt import _time_ms, parse_srt

SRT = """1
00:00:01,000 --> 00:00:01,900
cue zero

2
00:00:02,000 --> 00:00:02,800
cue one

3
00:00:05,000 --> 00:00:05,700
cue two
second line
"""


def test_time_parse():
    assert _time_ms("00:00:01,000") == 1000
    assert _time_ms("01:02:03,456") == 3723456
    assert _time_ms("00:00:02.5") == 2500  # '.' separator, sub-3-digit frac
    assert _time_ms("00:10:00") == 600000  # no fraction


def test_join_and_padding_semantics():
    """100 ms gap < 300 ms threshold -> cues 0/1 join; 2.2 s gap splits;
    alignments get add_time padding with the reference's clamping: end =
    min(end + add, next_start); the LAST end pads unclamped."""
    out = parse_srt(SRT, join_threshold_ms=300, add_time_ms=500)
    assert len(out) == 2
    a, b = out
    assert a["text"] == "cue zero cue one"
    assert (a["start_ms"], a["end_ms"]) == (500, 3300)  # 1000-500, 2800+500
    assert b["text"] == "cue two second line"
    assert (b["start_ms"], b["end_ms"]) == (4500, 6200)  # 5000-500, 5700+500
    assert all(x["dur_ms"] == x["end_ms"] - x["start_ms"] for x in out)
    assert [x["seq"] for x in out] == [0, 1]


def test_no_join_when_threshold_zero():
    out = parse_srt(SRT, join_threshold_ms=0, add_time_ms=500)
    assert len(out) == 3
    assert [x["text"] for x in out] == ["cue zero", "cue one", "cue two second line"]
    # end of cue zero clamps at cue one's start (2000 < 1900+500)
    assert out[0]["end_ms"] == 2000
    assert out[1]["start_ms"] == 2000  # max(prev_end, 2000-500)


def test_end_clamp_to_next_start():
    body = "1\n00:00:01,000 --> 00:00:01,900\na\n\n2\n00:00:02,100 --> 00:00:03,000\nb\n"
    out = parse_srt(body, join_threshold_ms=100, add_time_ms=500)
    assert len(out) == 2
    assert out[0]["end_ms"] == 2100  # min(1900+500, 2100)
    assert out[0]["start_ms"] == 500


def test_malformed_blocks_tolerated():
    assert parse_srt("") == []
    assert parse_srt("garbage\nwithout timing\n") == []
    assert parse_srt("1\nnot a time line\ntext\n") == []
    mixed = "1\nbroken\n\n" + SRT
    assert len(parse_srt(mixed, join_threshold_ms=300)) == 2


def test_operator_rows(spark):
    from ocr_spark.operators.multimodal import srt_alignments

    df = spark.createDataFrame([(7, SRT), (8, None)], "blob_id long, srt string")
    out = srt_alignments(df, join_threshold_ms=300, add_time_ms=500).collect()
    assert {r["blob_id"] for r in out} == {7} and len(out) == 2
    assert out[0]["text"] == "cue zero cue one"
