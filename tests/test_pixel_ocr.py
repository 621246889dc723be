"""Real-pixel OCR: render -> PNG round trip -> projection-profile detect ->
template recognize, byte-identical for any font-charset text."""

import numpy as np
import pytest

from ocr_spark.kernels.glyphs import GLYPHS, TEMPLATES, glyph_bitmap
from ocr_spark.kernels.imagecodec import png_decode, png_encode
from ocr_spark.kernels.pixel_ocr import (
    detect_words,
    ocr_page,
    ocr_page_text,
    render_text_image,
    sanitize_for_font,
)


def test_glyphs_distinct_and_shaped():
    flat = {ch: g.tobytes() for ch, g in GLYPHS.items()}
    assert len(set(flat.values())) == len(flat)  # no two glyphs identical
    assert glyph_bitmap("a").shape == (7, 5)
    assert not glyph_bitmap(" ").any()
    assert "?" not in TEMPLATES  # unknowns render as space, never classify


@pytest.mark.parametrize("scale", [1, 2, 3, 4])
def test_round_trip_all_chars_all_scales(scale):
    lines = ["abcdefghijklm", "nopqrstuvwxyz", "0123456789"]
    img = render_text_image(lines, scale=scale)
    back = png_decode(png_encode(img))
    assert ocr_page_text(back) == "\n".join(lines)


def test_narrow_glyph_words_stay_joined():
    # 'i'/'l'/'1' have empty border columns; the word detector must not
    # split around them and alignment search must place the grid right
    img = render_text_image(["iii lll ill lil 111"], scale=2)
    assert ocr_page_text(img) == "iii lll ill lil 111"


def test_detect_words_boxes_and_order():
    img = render_text_image(["ab cd", "efg"], scale=2)
    boxes = detect_words(img)
    assert len(boxes) == 3
    (a, b, c) = boxes
    assert a[1] == b[1] and c[1] > a[1]  # two rows
    assert a[0] < b[0]                   # left-to-right
    spans = ocr_page(img)
    assert [w for _, w in spans] == ["ab", "cd", "efg"]
    for (x0, y0, x1, y1), _ in spans:
        assert 0.0 <= x0 < x1 <= 1.0 and 0.0 <= y0 < y1 <= 1.0


def test_sanitize_for_font():
    assert sanitize_for_font("Hello, World! 42") == "hello world 42"
    assert sanitize_for_font("  a\t\nb  ") == "a b"
    assert sanitize_for_font("ÉÀ") == ""


def test_fuzz_round_trip():
    rng = np.random.RandomState(17)
    chars = list("abcdefghijklmnopqrstuvwxyz0123456789 ")
    for _ in range(20):
        lines = [
            "".join(rng.choice(chars, size=rng.randint(1, 25)))
            for _ in range(rng.randint(1, 4))
        ]
        expected = "\n".join(
            l for l in (sanitize_for_font(x) for x in lines) if l.strip()
        )
        img = render_text_image(lines, scale=int(rng.randint(1, 4)))
        assert ocr_page_text(img) == expected


def test_pixel_ocr_spark_operator(spark):
    from ocr_spark.operators.recognize import pixel_ocr_roundtrip

    parts = spark.read.parquet("/root/testdata/sf0.001/part.parquet").limit(60)
    out = pixel_ocr_roundtrip(parts)
    rows = {r.p_partkey: r.decoded for r in out.collect()}
    src = {r.p_partkey: r.p_name for r in parts.collect()}
    assert len(rows) == 60
    for k, name in src.items():
        assert rows[k] == sanitize_for_font(name), k
