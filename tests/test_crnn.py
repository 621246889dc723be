"""CRNN-form forward pass (kernels/crnn.py): matched-filter conv bank +
CTC greedy decode on real pixels — the R4 mechanism with constructed
weights (reference architectures/crnn_arch.py:306-531 is the trained
counterpart; the conv->per-timestep-logits->CTC dataflow is the same).
"""

import itertools

import numpy as np
import pytest

from ocr_spark.kernels import crnn
from ocr_spark.kernels import pixel_ocr as px
from ocr_spark.kernels.ctc import ctc_greedy_decode_batch
from ocr_spark.kernels.imagecodec import png_decode, png_encode


def test_exhaustive_pairs_no_collision():
    """THE proof: a 5-wide window sees at most two neighboring glyphs
    (pitch 6 >= window 5), so decoding every single char and every ordered
    pair exhausts all window contents any text can produce. Exact decode
    everywhere == no misaligned window ever scores a perfect match for a
    wrong template."""
    for word in itertools.chain(
        crnn.CRNN_CHARS,
        (a + b for a in crnn.CRNN_CHARS for b in crnn.CRNN_CHARS),
    ):
        img = px.render_text_image([word], scale=1)
        assert crnn.crnn_read_page(img) == word


def test_logit_structure():
    """Integer logits; classes are even, blank odd — argmax can never tie
    across the blank/class boundary; a class wins iff its template match
    is PERFECT (dot 35 -> logit 70 > blank 69 > best-imperfect 68)."""
    img = px.render_text_image(["ab"], scale=1)
    (x0, y0, x1, y1) = px.detect_words(img)[0]
    strip = crnn.pool_to_font(img[y0:y1, x0:x1] < 128, 1)
    logits = crnn.crnn_word_logits(strip)
    assert logits.dtype == np.int64
    assert (logits[:, 0] == 69).all()
    assert (logits[:, 1:] % 2 == 0).all()
    assert logits[:, 1:].max() == 70  # the aligned perfect hits exist
    # exactly two perfect hits: one per glyph
    assert int((logits[:, 1:] == 70).sum()) == 2


def test_double_letters_survive_collapse():
    """'ll', 'oo': the 1-column letter gap forces a blank between the two
    perfect hits, so CTC collapse keeps both — the textbook CTC argument."""
    for word in ("ll", "oo", "aab", "zzz"):
        img = px.render_text_image([word], scale=1)
        assert crnn.crnn_read_page(img) == word


def test_pooling_is_exact_inverse_of_render_scale():
    """pool_to_font of a scale-s render equals the scale-1 render (block
    upscaling then block mean-pooling is the identity at font grid)."""
    for scale in (2, 3):
        img_s = px.render_text_image(["quick brown"], scale=scale)
        img_1 = px.render_text_image(["quick brown"], scale=1)
        for b_s, b_1 in zip(px.detect_words(img_s), px.detect_words(img_1)):
            x0, y0, x1, y1 = b_s
            pooled = crnn.pool_to_font(img_s[y0:y1, x0:x1] < 128, scale)
            u0, v0, u1, v1 = b_1
            raw = crnn.pool_to_font(img_1[v0:v1, u0:u1] < 128, 1)
            assert np.array_equal(pooled, raw)


@pytest.mark.parametrize("scale", [1, 2, 3])
def test_png_roundtrip_multiline(scale):
    lines = ["the quick brown fox 123", "jumps over 456", "lazy dogs"]
    img = png_decode(png_encode(px.render_text_image(lines, scale=scale)))
    got = crnn.crnn_read_page(img)
    assert got == "\n".join(px.sanitize_for_font(l) for l in lines)


def test_parity_with_known_pitch_recognizer():
    """CRNN path (no pitch assumption) == pixel_ocr template path (known
    pitch) on the same decoded pages."""
    rng = np.random.RandomState(3)
    chars = crnn.CRNN_CHARS
    for i in range(20):
        words = [
            "".join(chars[j] for j in rng.randint(0, 36, rng.randint(1, 9)))
            for _ in range(rng.randint(1, 5))
        ]
        img = png_decode(
            png_encode(px.render_text_image([" ".join(words)], scale=1 + i % 3))
        )
        assert crnn.crnn_read_page(img) == px.ocr_page_text(img)


def test_batched_equals_per_word():
    img = px.render_text_image(["alpha beta gamma"], scale=2)
    ink = img < 128
    strips = []
    for x0, y0, x1, y1 in px.detect_words(img):
        strips.append(crnn.pool_to_font(ink[y0:y1, x0:x1], 2))
    batched = crnn.crnn_read_words(strips)
    # differential reference: each word conv'd + decoded alone at its own
    # true length via crnn_word_logits (no common-width padding)
    solo = []
    for s in strips:
        logits = crnn.crnn_word_logits(s).astype(np.float64)
        tokens, _ = ctc_greedy_decode_batch(logits[None, :, :], blank=0)
        solo.append("".join(crnn.CRNN_CHARS[i - 1] for i in tokens[0]))
    assert batched == solo == ["alpha", "beta", "gamma"]


def test_empty_and_degenerate():
    assert crnn.crnn_read_words([]) == []
    blank_page = np.full((20, 30), 255, dtype=np.uint8)
    assert crnn.crnn_read_page(blank_page) == ""


# -- trained bank (round-3 closure of VERDICT r02 item 7) --------------------

def test_noise_mask_deterministic_and_nontrivial():
    m1 = crnn.glyph_noise_mask(42, 7, 50)
    m2 = crnn.glyph_noise_mask(42, 7, 50)
    assert np.array_equal(m1, m2) and m1.shape == (35,)
    # across many occurrences the flip rate approaches 5%
    total = sum(crnn.glyph_noise_mask(k, i, 50).sum() for k in range(50) for i in range(20))
    rate = total / (50 * 20 * 35)
    assert 0.03 < rate < 0.07
    assert crnn.glyph_noise_mask(1, 2, 0).sum() == 0


def test_trained_bank_recovers_font_and_is_partition_invariant(spark):
    from ocr_spark.kernels.glyphs import TEMPLATES
    from ocr_spark.operators.recognize import crnn_learned_bank

    parts = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    chars, bank = crnn_learned_bank(parts)
    # the fit must DENOISE 5%-flipped crops back to the exact font — and
    # only for classes the corpus contains (no digits/letters invented)
    t_chars, t_bank = crnn.bank_from_templates({c: TEMPLATES[c] for c in chars})
    assert chars == t_chars
    assert np.array_equal(bank, t_bank)
    chars2, bank2 = crnn_learned_bank(parts.repartition(2))
    assert chars2 == chars and np.array_equal(bank2, bank)


def test_training_examples_are_actually_noisy():
    # the 5% flip rate must make a detectable fraction of crops differ from
    # the font template — otherwise "training" would be copying
    from ocr_spark.kernels.glyphs import TEMPLATES

    n_diff = n_tot = 0
    for key in range(1, 40):
        text = px.sanitize_for_font(f"powder lace {key}")
        for i, ch in enumerate(text):
            if ch == " ":
                continue
            mask = crnn.glyph_noise_mask(key, i, 50)
            noisy = TEMPLATES[ch].ravel().astype(np.int64) ^ mask
            n_tot += 1
            n_diff += int((noisy != TEMPLATES[ch].ravel()).any())
    assert n_diff / n_tot > 0.6  # P(any of 35 pixels flips) ~ 1 - .95^35


def test_trained_roundtrip_byte_identical(spark):
    from ocr_spark.operators.recognize import crnn_trained_roundtrip

    parts = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    got = {
        r.p_partkey: r.decoded
        for r in crnn_trained_roundtrip(parts).collect()
    }
    for r in parts.select("p_partkey", "p_name").collect():
        assert got[r.p_partkey] == px.sanitize_for_font(f"{r.p_name} {r.p_partkey}")
