"""Pixel-level OCR: REAL detection and recognition on decoded images.

Closes the round-1 "recognize never sees a real glyph" boundary without
model weights: the detect and recognize stages operate on actual pixels —

- render: text lines -> grayscale page image (5x7 dot-matrix glyphs at an
  integer scale, 1-glyph-wide letter gaps, 3-wide word gaps) — the test
  corpus's image writer (kernels/glyphs.py is the font file);
- detect: horizontal projection profile -> text-row bands, then per-row
  vertical projection -> word boxes split at word-sized gaps. This is the
  classic segmentation-based text detector — the same IDEA as the
  reference's EAST score-map thresholding (dark-pixel density instead of
  a CNN score map), with boxes normalized to [0,1] like the reference's
  relative format;
- recognize: per word, glyph cells sliced at the known pitch, average-
  pooled back to 7x5, nearest-template (Hamming) classification over the
  font bank.

Deterministic end to end; the round trip render -> PNG encode -> decode ->
detect -> recognize -> text is BYTE-IDENTICAL for any text in the font
charset (a-z, 0-9, space), which gives the pixel path the same identity
oracle as ctc_roundtrip.
"""

from __future__ import annotations

import numpy as np

from .glyphs import GLYPH_H, GLYPH_W, GLYPHS, TEMPLATES

_LETTER_GAP = 1   # columns between glyphs (font units)
_WORD_GAP = 3     # columns between words
_LINE_GAP = 3     # rows between lines
_MARGIN = 2


def sanitize_for_font(text: str) -> str:
    """Lowercase; chars outside the font charset become spaces; whitespace
    collapses — the pixel channel's visible transform (same stance as
    ctc.sanitize_for_vocab)."""
    out = "".join(c if c in GLYPHS else " " for c in text.lower())
    return " ".join(out.split())


def render_text_image(
    lines: list[str], *, scale: int = 2, font: str = "base"
) -> np.ndarray:
    """text lines -> (H, W) uint8 grayscale page (ink 0, paper 255).

    Every char (including space, which renders blank) occupies one glyph
    cell at a fixed pitch, so line width = n_chars * pitch - letter_gap.
    ``font`` picks a glyph set from glyphs.FONT_GLYPHS (same 7x5 metrics
    for every font, so pitch/margins/pooling are font-independent)."""
    from .glyphs import FONT_GLYPHS

    glyph_set = FONT_GLYPHS[font]
    lines = [sanitize_for_font(l) for l in lines]
    pitch = GLYPH_W + _LETTER_GAP
    widths = [max(len(l), 1) * pitch - _LETTER_GAP for l in lines]
    page_w = max(widths) + 2 * _MARGIN
    page_h = len(lines) * (GLYPH_H + _LINE_GAP) - _LINE_GAP + 2 * _MARGIN

    img = np.zeros((page_h, page_w), dtype=bool)
    y = _MARGIN
    for line in lines:
        x = _MARGIN
        for ch in line:
            img[y : y + GLYPH_H, x : x + GLYPH_W] |= glyph_set.get(ch, glyph_set[" "])
            x += pitch
        y += GLYPH_H + _LINE_GAP
    big = np.repeat(np.repeat(img, scale, axis=0), scale, axis=1)
    return np.where(big, 0, 255).astype(np.uint8)


def _runs(mask: np.ndarray):
    """Boolean 1-D mask -> list of (start, end) index runs of True."""
    idx = np.flatnonzero(mask)
    if len(idx) == 0:
        return []
    splits = np.flatnonzero(np.diff(idx) > 1)
    starts = np.concatenate([[idx[0]], idx[splits + 1]])
    ends = np.concatenate([idx[splits], [idx[-1]]])
    return list(zip(starts, ends + 1))


def detect_words(img: np.ndarray, *, ink_threshold: int = 128):
    """grayscale page -> word boxes [(x0, y0, x1, y1) absolute pixels] in
    reading order (rows top-to-bottom, words left-to-right).

    Projection-profile segmentation: rows with any ink form line bands;
    within a band, column gaps wider than the letter gap split words.
    """
    ink = img < ink_threshold
    boxes = []
    for y0, y1 in _runs(ink.any(axis=1)):
        band = ink[y0:y1]
        col_runs = _runs(band.any(axis=0))
        if not col_runs:
            continue
        # the glyph grid scale falls out of the band height (glyphs span
        # all 7 font rows); an inter-word blank glyph cell guarantees a
        # gap >= 7*scale while intra-word gaps (letter gap + empty glyph
        # border columns) stay <= 4*scale -> split at 5*scale
        scale = max((y1 - y0) // GLYPH_H, 1)
        word_split = 5 * scale
        cur_s, cur_e = col_runs[0]
        spans = []
        for s, e in col_runs[1:]:
            if s - cur_e >= word_split:
                spans.append((cur_s, cur_e))
                cur_s, cur_e = s, e
            else:
                cur_e = e
        spans.append((cur_s, cur_e))
        for x0, x1 in spans:
            boxes.append((int(x0), int(y0), int(x1), int(y1)))
    return boxes


# vectorized template bank, char-sorted so argmin's first-minimum rule IS
# the lexicographic tie-break
_TPL_CHARS = sorted(TEMPLATES)
_TPL_STACK = np.stack([TEMPLATES[c] for c in _TPL_CHARS])  # (36, 7, 5) bool

# widest empty LEFT border any glyph actually has: bounds the alignment
# search (a word box can start at most this many font columns inside the
# first glyph's cell)
_MAX_LEFT_BORDER = max(
    int(np.argmax(t.any(axis=0))) for t in _TPL_STACK
)


def _word_cells(ink: np.ndarray, off: int, scale: int):
    """left-pad by ``off``, slice at the glyph pitch, pool to (n, 7, 5)."""
    pitch = (GLYPH_W + _LETTER_GAP) * scale
    h = GLYPH_H * scale
    w = ink.shape[1] + off
    n = -(-w // pitch)
    padded = np.zeros((h, n * pitch), dtype=bool)
    padded[: ink.shape[0], off : off + ink.shape[1]] = ink[:h]
    cells = padded.reshape(h, n, pitch).transpose(1, 0, 2)[:, :, : GLYPH_W * scale]
    blank = ~cells.any(axis=(1, 2))
    pooled = (
        cells.reshape(n, GLYPH_H, scale, GLYPH_W, scale).mean(axis=(2, 4)) >= 0.5
    )
    return pooled, blank


def recognize_word(img: np.ndarray, box, *, ink_threshold: int = 128) -> str:
    """word box -> text via nearest-template matching over glyph cells.

    The box's left edge is the first INK column, which for glyphs with
    empty border columns ('i', '1', ...) is offset inside the glyph cell;
    alignment is recovered by a grid search over left paddings (<= 2*scale
    border columns), keeping the offset with the smallest total template
    distance — fully deterministic, and each offset evaluates the WHOLE
    word as one (n_cells, 36) tensor distance."""
    x0, y0, x1, y1 = box
    ink = img[y0:y1, x0:x1] < ink_threshold
    scale = max((y1 - y0) // GLYPH_H, 1)

    best_chars, best_total = [], 10 ** 9
    for off in range(_MAX_LEFT_BORDER * scale + 1):
        pooled, blank = _word_cells(ink, off, scale)
        d = (pooled[:, None] ^ _TPL_STACK[None]).sum(axis=(2, 3))  # (n, 36)
        cell_best = d.argmin(axis=1)
        cell_dist = d[np.arange(len(d)), cell_best]
        total = int(cell_dist[~blank].sum()) + int(blank.sum()) * GLYPH_H * GLYPH_W
        if total < best_total:
            best_total = total
            best_chars = [_TPL_CHARS[i] for i, b in zip(cell_best, blank) if not b]
            if best_total == 0:  # exact template hit: unbeatable
                break
    return "".join(best_chars)


def ocr_page(img: np.ndarray) -> list[tuple[tuple, str]]:
    """page image -> [(normalized box, word text)] in reading order."""
    h, w = img.shape[:2]
    out = []
    for box in detect_words(img):
        text = recognize_word(img, box)
        x0, y0, x1, y1 = box
        out.append(((x0 / w, y0 / h, x1 / w, y1 / h), text))
    return out


def ocr_page_text(img: np.ndarray) -> str:
    """page image -> extracted text: words joined by spaces within a line,
    lines by newline (reading order from the detector)."""
    h = img.shape[0]
    lines: list[list[str]] = []
    last_y = None
    for (x0, y0, x1, y1), word in ocr_page(img):
        if last_y is None or abs(y0 - last_y) > 1e-9:
            lines.append([])
            last_y = y0
        lines[-1].append(word)
    return "\n".join(" ".join(ws) for ws in lines)
