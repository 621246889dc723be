"""RIFF/WAVE codec (kernels/wavcodec.py) and the audio_features operator:
encode/decode identity (16- and 8-bit, mono/stereo), tolerant chunk walk,
malformed-input policy, and hypothesis round-trip fuzz."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from ocr_spark.kernels.wavcodec import WavError, wav_decode, wav_encode


def test_roundtrip_mono16():
    s = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int32)
    out, rate = wav_decode(wav_encode(s, 16000))
    assert rate == 16000
    assert out.shape == (5, 1)
    assert (out[:, 0] == s).all()


def test_roundtrip_stereo16_and_8bit():
    s = np.array([[100, -100], [0, 127], [-128, 5]], dtype=np.int32)
    out, rate = wav_decode(wav_encode(s, 44100))
    assert out.shape == (3, 2) and rate == 44100 and (out == s).all()
    out8, _ = wav_decode(wav_encode(s, 8000, bits=8))
    assert (out8 == s).all()  # values within 8-bit range survive exactly


def test_unknown_chunks_skipped_and_odd_padding():
    s = np.array([7, -7, 7], dtype=np.int32)
    blob = wav_encode(s, 8000)
    # splice an odd-sized junk chunk between WAVE header and fmt
    junk = b"LIST" + (5).to_bytes(4, "little") + b"abcde" + b"\x00"
    spliced = blob[:12] + junk + blob[12:]
    out, _ = wav_decode(spliced)
    assert (out[:, 0] == s).all()


def test_truncated_data_yields_present_samples():
    blob = wav_encode(np.array([1, 2, 3, 4], dtype=np.int32), 8000)
    out, _ = wav_decode(blob[:-3])  # cut mid-sample
    assert out[:, 0].tolist() == [1, 2]


def test_malformed_raises_waverror():
    for blob in (b"", b"RIFFxxxx", b"RIFF\x00\x00\x00\x00WAVE",
                 b"OggS" + b"\x00" * 40):
        with pytest.raises(WavError):
            wav_decode(blob)
    # non-PCM tag and weird bit depth rejected
    good = bytearray(wav_encode(np.array([1], dtype=np.int32), 8000))
    bad_tag = bytes(good[:20]) + b"\x03\x00" + bytes(good[22:])
    with pytest.raises(WavError):
        wav_decode(bad_tag)


@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=64),
    st.sampled_from([1, 2, 3]),
    st.integers(min_value=1, max_value=192000),
)
@settings(max_examples=150, deadline=None)
def test_wav_roundtrip_fuzz(vals, n_ch, rate):
    n = (len(vals) // n_ch) * n_ch
    arr = np.array(vals[:n], dtype=np.int32).reshape(-1, n_ch)
    out, r = wav_decode(wav_encode(arr, rate))
    assert r == rate and out.shape == arr.shape and (out == arr).all()


@given(st.binary(max_size=200))
@settings(max_examples=150, deadline=None)
def test_wav_decode_garbage_raises_only_waverror(blob):
    try:
        wav_decode(blob)
    except WavError:
        pass


def test_audio_features_spark(spark):
    from ocr_spark.operators.multimodal import audio_features

    square = np.array([200, 200, -200, -200, 200, 200], dtype=np.int32)
    rows = pd.DataFrame(
        {
            "blob_id": [1, 2],
            "blob": [wav_encode(square, 8000), b"not a wav"],
        }
    )
    out = audio_features(spark.createDataFrame(rows)).collect()
    assert len(out) == 1  # undecodable blob skipped, no task failure
    r = out[0]
    assert (r.blob_id, r.sample_rate, r.n_channels, r.n_samples) == (1, 8000, 1, 6)
    assert r.peak == 200
    assert r.energy == 6 * 200 * 200
    assert r.zero_crossings == 2


def test_wav_encode_clips_out_of_range_16bit():
    out, _ = wav_decode(wav_encode(np.array([40000, -40000], dtype=np.int64), 8000))
    assert out[:, 0].tolist() == [32767, -32768]
