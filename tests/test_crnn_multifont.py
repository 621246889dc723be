"""Multi-font CRNN (VERDICT r04 #6): the bold glyph set, cross-font
collision-freedom, the combined 72-class bank, and the per-font trained
fit."""

import itertools

import numpy as np
import pytest

from ocr_spark.kernels import crnn, pixel_ocr as px
from ocr_spark.kernels.glyphs import (
    BOLD_TEMPLATES,
    FONT_TEMPLATES,
    GLYPH_H,
    GLYPH_W,
    TEMPLATES,
)

MCHARS, MBANK = crnn.bank_from_font_templates(FONT_TEMPLATES)


def test_bold_is_a_distinct_font_same_metrics():
    assert set(BOLD_TEMPLATES) == set(TEMPLATES)
    changed = sum(
        not np.array_equal(BOLD_TEMPLATES[c], TEMPLATES[c]) for c in TEMPLATES
    )
    assert changed > 30  # genuinely different glyphs, not a rename
    for c in TEMPLATES:
        assert BOLD_TEMPLATES[c].shape == (GLYPH_H, GLYPH_W)


def test_all_72_templates_pairwise_distinct():
    seen = {}
    for f, tps in FONT_TEMPLATES.items():
        for c, t in tps.items():
            key = np.asarray(t, dtype=bool).tobytes()
            assert key not in seen, (f, c, seen[key])
            seen[key] = (f, c)


def test_no_cross_font_perfect_hit():
    """No 5-wide window of ANY two-glyph strip of font X exactly equals a
    font-Y template — the collision-freedom that lets one conv bank read
    both typefaces (pitch 6 >= window 5 bounds window contents to two
    neighbors, so this set is exhaustive)."""
    tpl_of = {
        f: {np.asarray(t, dtype=bool).tobytes(): c for c, t in tps.items()}
        for f, tps in FONT_TEMPLATES.items()
    }
    for fx, tps in FONT_TEMPLATES.items():
        other = [f for f in FONT_TEMPLATES if f != fx][0]
        for g1, g2 in itertools.product(tps.values(), repeat=2):
            strip = np.zeros((GLYPH_H, 4 + 5 + 1 + 5 + 4), dtype=bool)
            strip[:, 4:9] = g1
            strip[:, 10:15] = g2
            for o in range(strip.shape[1] - GLYPH_W + 1):
                w = strip[:, o : o + GLYPH_W].tobytes()
                assert w not in tpl_of[other], (fx, o, tpl_of[other][w])


@pytest.mark.parametrize("font", ["base", "bold"])
def test_exhaustive_reads_with_combined_bank(font):
    """Every 1- and 2-char word in EITHER font decodes byte-identically
    through the single combined bank — the multi-font twin of
    test_crnn.test_exhaustive_pairs_no_collision."""
    for word in itertools.chain(
        crnn.CRNN_CHARS,
        (a + b for a in crnn.CRNN_CHARS for b in crnn.CRNN_CHARS),
    ):
        img = px.render_text_image([word], scale=1, font=font)
        assert crnn.crnn_read_page(img, chars=MCHARS, bank=MBANK) == word


@pytest.mark.parametrize("scale", [1, 2, 3])
def test_multiline_both_fonts_at_scale(scale):
    text = ["the quick brown", "fox 1234"]
    for font in ("base", "bold"):
        img = px.render_text_image(text, scale=scale, font=font)
        assert crnn.crnn_read_page(img, chars=MCHARS, bank=MBANK) == "\n".join(text)


def test_trained_multifont_recovers_both_fonts(spark):
    from ocr_spark.operators.recognize import crnn_learned_bank_multifont

    # digits ride in every name so BOTH parity halves see every class
    # ~20 times — enough support for the majority vote to denoise
    rows = [
        (i, "quick brown fox jumps over lazy dog 0123456789 " * 2)
        for i in range(40)
    ]
    parts = spark.createDataFrame(rows, "p_partkey long, p_name string")
    chars, bank = crnn_learned_bank_multifont(parts, noise_milli=50)
    # the learned bank must equal the true per-font templates despite
    # noise — trained classes are exactly the chars each font's parity
    # half of the corpus actually contains (digits come from the keys)
    seen = {"base": set(), "bold": set()}
    for key, name in rows:
        font = "bold" if key % 2 else "base"
        seen[font].update(px.sanitize_for_font(f"{name} {key}").replace(" ", ""))
    want_chars, want_bank = crnn.bank_from_font_templates(
        {
            f: {c: FONT_TEMPLATES[f][c] for c in seen[f]}
            for f in FONT_TEMPLATES
        }
    )
    assert chars == want_chars
    assert np.array_equal(bank, want_bank)
    # partition invariance: the int count fan-in is order-free
    chars2, bank2 = crnn_learned_bank_multifont(parts.repartition(7), noise_milli=50)
    assert chars2 == chars and np.array_equal(bank2, bank)


def test_multifont_roundtrip_byte_identical(spark):
    """The real corpus (sf0.001, 200 parts): every page — half bold, at
    mixed scales — decodes byte-identically through the banks trained on
    that same two-font corpus."""
    from ocr_spark.operators.recognize import crnn_multifont_roundtrip

    parts = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    out = {r["p_partkey"]: r for r in crnn_multifont_roundtrip(parts).collect()}
    fonts_seen = set()
    for r in parts.select("p_partkey", "p_name").collect():
        row = out[r.p_partkey]
        assert row["font"] == ("bold" if r.p_partkey % 2 else "base")
        fonts_seen.add(row["font"])
        assert row["decoded"] == px.sanitize_for_font(f"{r.p_name} {r.p_partkey}")
    assert fonts_seen == {"base", "bold"}
