"""Perceptual image dHash (operators/multimodal.dhash64 / image_dhash) and
the generic Hamming banding (operators/dedup.hamming_near_pairs)."""

import numpy as np
import pytest

from ocr_spark.kernels import imagecodec as ic
from ocr_spark.operators.multimodal import dhash64, image_dhash


def _grid(fn):
    r = np.arange(8)[:, None]
    c = np.arange(9)[None, :]
    return np.broadcast_to(fn(r, c), (8, 9)).astype(np.uint8)


def test_dhash_bit_layout_pinned():
    # strictly increasing columns -> every comparison true -> all 64 bits
    # set -> signed -1
    img = _grid(lambda r, c: c * 20)
    assert dhash64(img) == -1
    # strictly decreasing -> no bits -> 0
    img = _grid(lambda r, c: 200 - c * 20)
    assert dhash64(img) == 0
    # first comparison of EVERY row true -> bit 63-(r*8) per row, signed
    img = _grid(lambda r, c: np.where(c == 0, 0, 10) - 0 * r)
    raw = sum(1 << (63 - 8 * r) for r in range(8))
    assert dhash64(img) == raw - (1 << 64)


def test_dhash_gray_conversion_and_block_mean():
    # RGB weights: a pure-green gradient must hash like its gray version
    rgb = np.zeros((8, 9, 3), dtype=np.uint8)
    rgb[..., 1] = _grid(lambda r, c: c * 25)
    gray = (587 * rgb[..., 1].astype(np.int64)) // 1000
    assert dhash64(rgb) == dhash64(gray.astype(np.uint8))
    # 16x18 image with 2x2 constant blocks == its 8x9 downscale
    small = _grid(lambda r, c: (r * 31 + c * 17) % 256)
    big = np.kron(small, np.ones((2, 2), dtype=np.uint8))
    assert dhash64(big) == dhash64(small)


def test_dhash_one_pixel_perturbation_is_near():
    base = _grid(lambda r, c: (r * 131 + c * 31 + 7) % 256)
    pert = base.copy()
    pert[0, 0] = (int(pert[0, 0]) + 40) % 256
    h1, h2 = dhash64(base), dhash64(pert)
    assert bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") <= 2


def test_dhash_rejects_too_small():
    with pytest.raises(ValueError):
        dhash64(np.zeros((4, 4), dtype=np.uint8))


def test_image_dhash_spark_real_png_and_null_robust(spark):
    base = _grid(lambda r, c: (r * 13 + c * c * 3) % 256)
    rows = [
        (0, bytearray(ic.png_encode(base))),
        (1, bytearray(b"not an image")),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "blob_id long, blob binary")
    got = {r["blob_id"]: r["dhash"] for r in image_dhash(df).collect()}
    assert got[0] == dhash64(base)
    assert got[1] is None and got[2] is None  # no task failure, NULL rows


def test_hamming_near_pairs_generic_recall(spark):
    from ocr_spark.operators.dedup import hamming_near_pairs

    sigs = [
        (0, 0x0123456789ABCDEF),
        (1, 0x0123456789ABCDEE),  # hamming 1 from doc 0
        (2, -0x7123456789ABCDF0),  # far from both
    ]
    df = spark.createDataFrame(sigs, "doc_id long, sig long")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in hamming_near_pairs(df, sig_col="sig", max_hamming=3).collect()
    }
    assert pairs == {(0, 1): 1}


# ---------------------------------------------------------------------------
# audio fingerprint (operators/multimodal.afp64 / audio_fingerprint)
# ---------------------------------------------------------------------------

def test_afp_bit_layout_and_channels():
    from ocr_spark.operators.multimodal import afp64

    # strictly decreasing energy staircase -> every comparison true -> -1
    s = np.repeat(np.arange(65, 0, -1) * 10, 10).astype(np.int64)
    assert afp64(s) == -1
    # increasing -> 0
    assert afp64(np.repeat(np.arange(65) * 10, 10)) == 0
    # stereo sums channels BEFORE the energy: a channel pair that cancels
    # to zero fingerprints like silence
    mono = np.repeat(np.arange(65, 0, -1) * 10, 10).astype(np.int64)
    stereo = np.stack([mono, -mono], axis=1)
    assert afp64(stereo) == 0


def test_afp_too_short_raises():
    from ocr_spark.operators.multimodal import afp64

    import pytest as _pytest

    with _pytest.raises(ValueError, match="65"):
        afp64(np.zeros(64, dtype=np.int64))


def test_audio_fingerprint_spark_real_wav_and_null(spark):
    from ocr_spark.kernels.wavcodec import wav_encode
    from ocr_spark.operators.multimodal import afp64, audio_fingerprint

    s = ((np.arange(650) * 37 + 11) % 1801 - 900).astype(np.int32)
    rows = [
        (0, bytearray(wav_encode(s, 8000))),
        (1, bytearray(b"RIFFgarbage")),
    ]
    df = spark.createDataFrame(rows, "blob_id long, blob binary")
    got = {r["blob_id"]: r["afp"] for r in audio_fingerprint(df).collect()}
    assert got[0] == afp64(s.astype(np.int64))
    assert got[1] is None
