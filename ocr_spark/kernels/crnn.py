"""CRNN-form recognition forward pass on real pixels (R4 mechanism).

The reference's CRNN (architectures/crnn_arch.py:306-531) is a conv
feature extractor that turns a word image into a per-timestep class-score
sequence, decoded by CTC. This kernel reproduces that MECHANISM with
analytically constructed weights instead of trained ones:

- conv layer = matched-filter bank: one 7x5 filter per font glyph in
  +-1 ink coding, correlated at EVERY column (stride 1) of the word strip
  -> integer class scores per timestep (dot = 35 - 2*hamming, so a
  perfect template hit scores exactly 35);
- CTC head: blank logit is pinned between the best imperfect score (34)
  and a perfect hit (35), so the per-column argmax emits a glyph exactly
  at its true alignments and blank everywhere else; the standard CTC
  greedy collapse (kernels/ctc.py — the SAME decoder the fixture-logit
  channel uses) then yields the text. Double letters survive because the
  1-column letter gap forces a blank between the two perfect hits —
  the textbook CTC alignment argument, running on real pixels.

Unlike kernels/pixel_ocr.recognize_word (known-pitch cell slicing +
nearest template), this path assumes NO glyph pitch or alignment: the
conv scans every offset and CTC recovers the alignment, which is exactly
what makes the CRNN shape work on variable-advance renderings.

Correctness is exhaustively provable at font resolution: a 5-wide window
sees at most two neighboring glyphs (pitch 6 >= window 5), so the
all-pairs test in tests/test_crnn.py covers every window content any text
can produce — no wrong template can ever score a perfect 35.

Integer-exact throughout (logits are even integers, blank odd), decoded
with blank id 0 and classes 1..36 in sorted-char order.
"""

from __future__ import annotations

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

from .ctc import ctc_greedy_decode_batch
from .glyphs import GLYPH_H, GLYPH_W, TEMPLATES
from .pixel_ocr import detect_words

#: class order: blank (id 0) + glyphs sorted by char — matches the
#: first-minimum/lexicographic tie rule used everywhere else
CRNN_CHARS = sorted(TEMPLATES)
_BANK = (
    np.stack([TEMPLATES[c] for c in CRNN_CHARS]).astype(np.int64) * 2 - 1
).reshape(len(CRNN_CHARS), GLYPH_H * GLYPH_W)  # (36, 35) in {-1, +1}

#: a perfect correlation scores 2*35 = 70; the best imperfect one 68.
_BLANK_LOGIT = 69


def bank_from_templates(templates: dict[str, np.ndarray]) -> tuple[list[str], np.ndarray]:
    """{char: (7, 5) bool/0-1 template} -> (sorted chars, (C, 35) +-1 bank).

    The constructed module bank is `bank_from_templates(glyphs.TEMPLATES)`;
    a TRAINED bank (operators/recognize.crnn_trained_roundtrip) passes the
    majority-vote templates it learned from noisy corpus renders instead —
    same decode machinery either way."""
    chars = sorted(templates)
    bank = (
        np.stack([templates[c] for c in chars]).astype(np.int64) * 2 - 1
    ).reshape(len(chars), GLYPH_H * GLYPH_W)
    return chars, bank


_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def bank_from_font_templates(
    font_templates: dict[str, dict[str, np.ndarray]],
) -> tuple[list[str], np.ndarray]:
    """{font: {char: (7, 5) template}} -> (chars, (C, 35) +-1 bank) with
    one CLASS PER (font, char) in (font, char) sorted order; ``chars``
    carries the character of each class (decode reports text — the font
    distinction lives in which filter fired, and cross-font perfect hits
    are impossible: tests/test_crnn_multifont.py proves the 72-template
    bank collision-free the test_exhaustive_pairs way). This is how the
    reference's CRNN reads multiple typefaces with ONE conv stack
    (architectures/crnn_arch.py:306-531): more filters, same machinery."""
    classes = [
        (f, ch)
        for f in sorted(font_templates)
        for ch in sorted(font_templates[f])
    ]
    chars = [ch for _f, ch in classes]
    bank = (
        np.stack(
            [
                np.asarray(font_templates[f][ch], dtype=np.int64).ravel()
                for f, ch in classes
            ]
        )
        * 2
        - 1
    )
    return chars, bank


def glyph_noise_mask(key: int, idx: int, rate_milli: int) -> np.ndarray:
    """Deterministic per-glyph-occurrence pixel-flip mask, (35,) bool:
    pixel p flips iff splitmix64(key, idx, p) % 1000 < rate_milli.

    Hashes only stable row keys (doc key + character index), never
    partition ids — the training corpus is bit-identical under any
    parallelism, so the learned bank is too."""
    base = np.uint64((key * 1_000_003 + idx * 8_191 + 0x5851F42D) & 0xFFFFFFFFFFFFFFFF)
    x = base + np.arange(GLYPH_H * GLYPH_W, dtype=np.uint64) * np.uint64(
        0x9E3779B97F4A7C15
    )
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return (x % np.uint64(1000)) < np.uint64(rate_milli)


def pool_to_font(ink: np.ndarray, scale: int) -> np.ndarray:
    """(h, w) bool ink at an integer glyph scale -> (GLYPH_H, w/scale)
    font-resolution ink. The detector's boxes start on glyph-block
    boundaries (render scales each font pixel to a scale x scale block),
    so block mean-pooling is the exact inverse of the rendering upscale."""
    h = GLYPH_H * scale
    w = -(-ink.shape[1] // scale) * scale
    p = np.zeros((h, w), dtype=bool)
    p[: min(ink.shape[0], h), : ink.shape[1]] = ink[:h, :]
    return p.reshape(GLYPH_H, scale, w // scale, scale).mean(axis=(1, 3)) >= 0.5


def crnn_word_logits(font_ink: np.ndarray, *, bank: np.ndarray | None = None) -> np.ndarray:
    """(GLYPH_H, W) font-resolution ink -> (T, 1 + C) integer logits.

    T = W + GLYPH_W - 1 timesteps (the strip is padded GLYPH_W-1 paper
    columns on each side so every alignment of the first/last glyph is a
    full window). Column 0 is the CTC blank. ``bank`` overrides the
    constructed (C, 35) +-1 filter bank with a trained one."""
    if bank is None:
        bank = _BANK
    w = font_ink.shape[1]
    pad = GLYPH_W - 1
    padded = np.zeros((GLYPH_H, w + 2 * pad), dtype=bool)
    padded[:, pad : pad + w] = font_ink
    # im2col: all (7, 5) windows at stride 1 -> (T, 35) in {-1, +1}
    win = sliding_window_view(padded, (GLYPH_H, GLYPH_W))[0]
    t = win.shape[0]
    x = win.reshape(t, GLYPH_H * GLYPH_W).astype(np.int64) * 2 - 1
    logits = np.empty((t, 1 + len(bank)), dtype=np.int64)
    logits[:, 0] = _BLANK_LOGIT
    logits[:, 1:] = x @ bank.T * 2  # even integers in [-70, 70]
    return logits


def crnn_read_words(
    strips: list[np.ndarray],
    *,
    chars: list[str] | None = None,
    bank: np.ndarray | None = None,
) -> list[str]:
    """Batch of font-resolution word strips -> texts, via ONE padded
    (N, T, V) CTC greedy decode (the shared kernels/ctc.py path).

    The whole batch convs in one im2col matmul: strips are right-padded
    with paper to a common width, which cannot change any decode — an
    all-paper window never correlates perfectly with any glyph (no
    template is blank), so every extra timestep scores at most 68 < 69 =
    blank and collapses away. Decode-identical to the per-word path
    (differentially asserted in tests/test_crnn.py)."""
    if chars is None:
        chars = CRNN_CHARS
    if bank is None:
        bank = _BANK
    if not strips:
        return []
    n = len(strips)
    pad = GLYPH_W - 1
    w_max = max(s.shape[1] for s in strips)
    imgs = np.zeros((n, GLYPH_H, w_max + 2 * pad), dtype=bool)
    for i, s in enumerate(strips):
        imgs[i, :, pad : pad + s.shape[1]] = s
    t = w_max + pad  # windows per strip at stride 1
    win = sliding_window_view(imgs, (GLYPH_H, GLYPH_W), axis=(1, 2))
    x = win.reshape(n, t, GLYPH_H * GLYPH_W).astype(np.int64) * 2 - 1
    logits = np.empty((n, t, 1 + len(chars)), dtype=np.int64)
    logits[:, :, 0] = _BLANK_LOGIT
    logits[:, :, 1:] = x @ bank.T * 2
    tokens, _scores = ctc_greedy_decode_batch(logits.astype(np.float64), blank=0)
    return ["".join(chars[i - 1] for i in toks) for toks in tokens]


def crnn_read_page(
    img: np.ndarray,
    *,
    ink_threshold: int = 128,
    chars: list[str] | None = None,
    bank: np.ndarray | None = None,
) -> str:
    """page image -> text via detect (projection profiles) + CRNN-form
    recognize: words joined by spaces within a line, lines by newline —
    the same output contract as pixel_ocr.ocr_page_text, without its
    known-pitch assumption."""
    ink = img < ink_threshold
    boxes = detect_words(img)
    strips = []
    for x0, y0, x1, y1 in boxes:
        scale = max((y1 - y0) // GLYPH_H, 1)
        strips.append(pool_to_font(ink[y0:y1, x0:x1], scale))
    words = crnn_read_words(strips, chars=chars, bank=bank)
    lines: list[list[str]] = []
    last_y = None
    for (x0, y0, x1, y1), word in zip(boxes, words):
        if last_y is None or y0 != last_y:
            lines.append([])
            last_y = y0
        lines[-1].append(word)
    return "\n".join(" ".join(ws) for ws in lines)
