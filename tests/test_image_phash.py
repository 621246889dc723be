"""DCT perceptual hash (operators/multimodal.phash64 / image_phash).

Reference analog: S1 load_image pixel grid (utils/image/image_io.py) is
what these perceptual signatures summarize; the hash itself is the
imagehash-style median pHash re-derived integer-exact so the DuckDB
oracle can replay it bit-for-bit.
"""

import numpy as np
import pytest

from ocr_spark.kernels import imagecodec as ic
from ocr_spark.operators.multimodal import _PHASH_COS, image_phash, phash64


def _grid16(fn):
    r = np.arange(16)[:, None]
    c = np.arange(16)[None, :]
    return np.broadcast_to(fn(r, c), (16, 16)).astype(np.uint8)


def test_phash_cos_table_is_integer_dct_basis():
    # scale 2^14, row 0 all equal (DC), exact symmetry C[k][n] vs DCT-II
    assert _PHASH_COS.dtype == np.int64
    assert _PHASH_COS.shape == (16, 16)
    assert (_PHASH_COS[0] == 1 << 14).all()
    ref = np.round((1 << 14) * np.cos(np.pi * (2 * np.arange(16)[None, :] + 1) * np.arange(16)[:, None] / 32))
    assert (_PHASH_COS == ref.astype(np.int64)).all()


def test_phash_constant_image_median_tie():
    # constant image: every AC coef = 0, DC huge -> only DC bit can pass
    # the strict > median comparison; median of [0]*63+[DC] lower-middle
    # is 0, so exactly the DC bit (k=0 -> bit 63) is set -> signed min+..
    h = phash64(_grid16(lambda r, c: 0 * r + 100))
    v = h + (1 << 64) if h < 0 else h
    assert v == 1 << 63


def test_phash_gray_conversion_matches_rgb():
    rgb = np.zeros((16, 16, 3), dtype=np.uint8)
    rgb[..., 1] = _grid16(lambda r, c: (c * 25 + r * 3) % 256)
    gray = (587 * rgb[..., 1].astype(np.int64)) // 1000
    assert phash64(rgb) == phash64(gray.astype(np.uint8))


def test_phash_area_mean_resize_matches_direct():
    # 32x32 image of 2x2 constant blocks == its 16x16 downscale
    small = _grid16(lambda r, c: (r * 31 + c * 17) % 256)
    big = np.kron(small, np.ones((2, 2), dtype=np.uint8))
    assert phash64(big) == phash64(small)


def test_phash_one_pixel_perturbation_flips_few_bits():
    # pHash's point vs dHash: a single-pixel edit spreads across all 64
    # DCT coefficients and only flips bits whose coefficient sits near
    # the median
    base = _grid16(lambda r, c: ((r * 131 + c * 37 + 11) * 7) % 256)
    pert = base.copy()
    pert[0, 0] = (int(pert[0, 0]) + 24) % 256
    h1, h2 = phash64(base), phash64(pert)
    assert bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") <= 3


def test_phash_brightness_shift_stable_dhash_analogy():
    # uniform +20 brightness: DC coef moves, every AC coef is UNCHANGED
    # (the DCT of a constant is DC-only), so at most the DC-vs-median and
    # median-boundary bits move -> small hamming
    base = _grid16(lambda r, c: (r * 29 + c * 41 + 3) % 200)
    bright = np.clip(base.astype(np.int64) + 20, 0, 255).astype(np.uint8)
    h1, h2 = phash64(base), phash64(bright)
    assert bin((h1 ^ h2) & ((1 << 64) - 1)).count("1") <= 2


def test_phash_rejects_too_small():
    with pytest.raises(ValueError):
        phash64(np.zeros((8, 8), dtype=np.uint8))


def test_image_phash_spark_real_png_and_null_robust(spark):
    base = _grid16(lambda r, c: (r * 13 + c * c * 3) % 256)
    rows = [
        (0, bytearray(ic.png_encode(base))),
        (1, bytearray(b"not an image")),
        (2, None),
    ]
    df = spark.createDataFrame(rows, "blob_id long, blob binary")
    got = {r["blob_id"]: r["phash"] for r in image_phash(df).collect()}
    assert got[0] == phash64(base)
    assert got[1] is None and got[2] is None  # no task failure, NULL rows
