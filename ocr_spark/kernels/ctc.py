"""CTC decoding: vectorized greedy best-path + per-sequence beam search.

Semantics parity (reference citations, behavior only — new implementation):
- ctc_decode contract (blank index 0, greedy or beam strategy, scores
  length-normalized by the valid frame count):
  /root/reference/utils/text/ctc_decoder.py:14-36
- OCR callsite uses beam width 10 and a length-power rescore 0.25:
  /root/reference/models/ocr/base_ocr.py:113-115
- token -> text via a char-level vocab with blank at index 0:
  /root/reference/models/ocr/crnn.py:23,33-38,
  /root/reference/utils/text/tokenizer.py:599-669

Decode semantics (pinned by our own fixtures, FIXTURES.md §3):
- ``logits`` are unnormalized scores (T, V); probabilities are obtained with
  a numerically-stable log-softmax.
- greedy: per-frame argmax over the first ``length`` frames -> collapse
  consecutive repeats -> drop blanks; score = sum of selected per-frame
  log-probs / length.
- beam: standard CTC prefix beam search in log space; score of a prefix is
  log(p_blank + p_nonblank), normalized by length on return.

Greedy is the default hot path (vectorized over the whole Arrow batch);
beam is a per-sequence loop used only where fixtures demand it
(SURVEY.md §7 risk 7).
"""

from __future__ import annotations

import numpy as np

NEG_INF = -np.inf


def log_softmax(logits: np.ndarray, axis: int = -1) -> np.ndarray:
    shifted = logits - logits.max(axis=axis, keepdims=True)
    return shifted - np.log(np.exp(shifted).sum(axis=axis, keepdims=True))


def collapse_repeats_drop_blank(path: np.ndarray, blank: int = 0) -> list[int]:
    """Best-path collapse: merge consecutive duplicates, then remove blanks."""
    if len(path) == 0:
        return []
    keep = np.ones(len(path), dtype=bool)
    keep[1:] = path[1:] != path[:-1]
    collapsed = path[keep]
    return collapsed[collapsed != blank].astype(np.int64).tolist()


def ctc_greedy_decode_batch(logits: np.ndarray, lengths=None, blank: int = 0):
    """Vectorized greedy decode over a padded (N, T, V) batch.

    Returns (tokens: list[list[int]], scores: np.ndarray of shape (N,)) with
    scores length-normalized (ctc_decoder.py:32).
    """
    logits = np.asarray(logits, dtype=np.float64)
    n, t, _ = logits.shape
    if lengths is None:
        lengths = np.full((n,), t, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)

    # argmax(log_softmax(x)) == argmax(x), and at the argmax the shifted
    # logit is exactly 0, so logp[best] == -log(sum(exp(x - max))) — same
    # floating-point ops as full log_softmax + gather (bitwise-identical
    # scores) without materializing the (N, T, V) log-softmax array
    m = logits.max(axis=-1)  # (N, T)
    best = logits.argmax(axis=-1)  # (N, T)
    best_logp = -np.log(np.exp(logits - m[..., None]).sum(axis=-1))

    valid = np.arange(t)[None, :] < lengths[:, None]
    scores = np.where(valid, best_logp, 0.0).sum(axis=1) / np.maximum(lengths, 1)

    tokens = [
        collapse_repeats_drop_blank(best[i, : lengths[i]], blank=blank) for i in range(n)
    ]
    return tokens, scores


def ctc_beam_decode(
    logits: np.ndarray,
    length=None,
    blank: int = 0,
    beam_width: int = 10,
    top_paths: int = 1,
    length_power: float = 0.0,
):
    """CTC prefix beam search over one (T, V) sequence.

    Returns list of (tokens, normalized_score) of length ``top_paths``,
    best first; score is frame-normalized (total logp / T,
    ctc_decoder.py:32). Deterministic: ties broken by prefix
    (lexicographic). ``length_power`` > 0 ranks the FINAL hypotheses by
    total_logp / (len(tokens)+1)**p — the reference's OCR callsite uses
    0.25 (base_ocr.py:115) to soften the short-sequence bias; unlike a
    constant normalization this per-beam key can change which hypothesis
    wins. 0.0 (default) ranks by raw total probability.
    """
    logits = np.asarray(logits, dtype=np.float64)
    t_max = logits.shape[0] if length is None else int(length)
    logp = log_softmax(logits[:t_max])

    # beams: prefix(tuple) -> (log_p_blank, log_p_nonblank)
    beams = {(): (0.0, NEG_INF)}
    for t in range(t_max):
        frame = logp[t]
        new_beams: dict[tuple, tuple[float, float]] = {}

        def _add(prefix, pb, pnb):
            opb, opnb = new_beams.get(prefix, (NEG_INF, NEG_INF))
            new_beams[prefix] = (np.logaddexp(opb, pb), np.logaddexp(opnb, pnb))

        for prefix, (pb, pnb) in beams.items():
            total = np.logaddexp(pb, pnb)
            # blank extends: prefix unchanged
            _add(prefix, total + frame[blank], NEG_INF)
            for c in range(len(frame)):
                if c == blank:
                    continue
                p_c = frame[c]
                if prefix and prefix[-1] == c:
                    # same symbol again merges into the prefix (non-blank
                    # ending); emitting a NEW c needs an intervening blank
                    _add(prefix, NEG_INF, pnb + p_c)
                    _add(prefix + (c,), NEG_INF, pb + p_c)
                else:
                    _add(prefix + (c,), NEG_INF, total + p_c)

        scored = sorted(
            new_beams.items(),
            key=lambda kv: (-np.logaddexp(kv[1][0], kv[1][1]), kv[0]),
        )
        beams = dict(scored[:beam_width])

    norm = max(t_max, 1)
    results = sorted(
        ((np.logaddexp(pb, pnb), prefix) for prefix, (pb, pnb) in beams.items()),
        key=lambda sv: (
            -(sv[0] / (len(sv[1]) + 1) ** length_power if length_power else sv[0]),
            sv[1],
        ),
    )
    return [(list(prefix), score / norm) for score, prefix in results[:top_paths]]


def sanitize_for_vocab(text: str, vocab_index: dict) -> str:
    """Lowercase + map chars outside the vocab to space — the exact visible
    transform of the recognition channel (the CRNN vocab is lowercase, so
    any decode output is too). ONE definition, shared by the extraction
    operator, the recognize stage, and the pages synthesizer's
    by-construction goldens: a corpus with uppercase/exotic chars stays
    byte-identical end to end."""
    return "".join(c if c in vocab_index else " " for c in text.lower())


def encode_text(text: str, vocab_index: dict, *, unknown: int | None = None) -> list[int]:
    """Char-level encode (tokenizer.py:599-669 char path): unknown chars are
    dropped (None) or mapped to ``unknown``. Round-trips with decode_tokens."""
    out = []
    for c in text:
        idx = vocab_index.get(c, unknown)
        if idx is not None:
            out.append(idx)
    return out


def decode_tokens(tokens, vocab, blank: int = 0) -> str:
    """ids -> text via char vocab; blanks/negatives skipped
    (tokenizer.py:599-656 char-level path)."""
    return "".join(vocab[i] for i in tokens if i != blank and 0 <= i < len(vocab))


def make_vocab(chars: str = " abcdefghijklmnopqrstuvwxyz0123456789.,!?-'\"") -> list[str]:
    """Char vocab with the CTC blank at index 0 (crnn.py:23,33-38)."""
    return ["<blank>"] + list(chars)


def synth_logits_for_text(text: str, vocab: list[str], *, repeat: int = 2, gap_blank: bool = True, margin: float = 8.0):
    """Deterministic fixture synthesis (FIXTURES.md §3): emit ``repeat``
    frames per char with an interleaved blank between equal neighbors, so
    collapse-repeats + drop-blank reproduces ``text`` under both greedy and
    beam decode. Returns float32 (T, V) logits."""
    index = {c: i for i, c in enumerate(vocab)}
    frames: list[int] = []
    prev = None
    for c in text:
        idx = index[c]
        if gap_blank and prev == idx:
            frames.append(0)
        frames.extend([idx] * repeat)
        prev = idx
    if not frames:
        frames = [0]
    logits = np.full((len(frames), len(vocab)), -margin / 2.0, dtype=np.float32)
    logits[np.arange(len(frames)), frames] = margin / 2.0
    return logits
