"""Unigram-LM subword tokenization (Kudo 2018, ACL — the SentencePiece
unigram model): segment a word into the piece sequence maximizing the sum
of piece log-probabilities.

Exactness contract (shared with the DSIR / ngram-LM kernels): piece
scores are INTEGER milli-log-probs, so the Viterbi argmax is integer
arithmetic with a total deterministic order — maximize score, break ties
by the SMALLEST cut bitmask (bit i-1 set = a cut after character i).
Minimizing the bitmask is a valid DP objective because a prefix's cut
bits are strictly below any suffix's cut bits: for equal scores, the
globally minimal mask is reached through the minimal-mask prefix at
every position (disjoint bit ranges make mask composition additive).
The oracle enumerates ALL 2^(L-1) segmentations per word and must land
on the identical (score, mask); the DP here is just the O(L^2) route to
the same point.

Piece scoring: a multi-char piece outside the vocab scores
``DISALLOWED`` (never competitive — the all-singles fallback always
beats it); a single char outside the vocab scores ``unk_milli``.

Training (``train_unigram_counts``-style hard EM) lives in
operators/tokenize.py where the distributed count tables are; this
kernel is the per-word math both the operator and its tests share.
"""

from __future__ import annotations

DISALLOWED = -100_000_000


def piece_score(piece: str, vocab: dict[str, int], unk_milli: int) -> int:
    s = vocab.get(piece)
    if s is not None:
        return s
    return unk_milli if len(piece) == 1 else DISALLOWED


def viterbi_segment(
    word: str, vocab: dict[str, int], *, unk_milli: int = -15_000
) -> tuple[list[str], int, int]:
    """Best segmentation of ``word``: (pieces, score_milli, cut_mask).
    Maximize total score; ties take the smallest cut bitmask."""
    n = len(word)
    if n == 0:
        return [], 0, 0
    # best[i] = (score, mask, start_of_last_piece) for word[:i]
    best: list[tuple[int, int] | None] = [None] * (n + 1)
    back: list[int] = [0] * (n + 1)
    best[0] = (0, 0)
    for i in range(1, n + 1):
        cand: tuple[int, int] | None = None
        cand_j = 0
        for j in range(i):
            prev = best[j]
            if prev is None:
                continue
            sc = prev[0] + piece_score(word[j:i], vocab, unk_milli)
            mask = prev[1] | ((1 << (j - 1)) if j > 0 else 0)
            t = (sc, mask)
            if cand is None or sc > cand[0] or (sc == cand[0] and mask < cand[1]):
                cand = t
                cand_j = j
        best[i] = cand
        back[i] = cand_j
    pieces: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        pieces.append(word[j:i])
        i = j
    pieces.reverse()
    score, mask = best[n]  # type: ignore[misc]
    return pieces, score, mask


def enumerate_best(
    word: str, vocab: dict[str, int], *, unk_milli: int = -15_000
) -> tuple[list[str], int, int]:
    """Brute-force reference: score every 2^(L-1) cut mask.  Test-only
    (the DuckDB oracle is the same enumeration in SQL)."""
    n = len(word)
    best = None
    for m in range(1 << max(0, n - 1)):
        cuts = [i for i in range(1, n) if (m >> (i - 1)) & 1]
        bounds = [0] + cuts + [n]
        pieces = [word[a:b] for a, b in zip(bounds, bounds[1:])]
        sc = sum(piece_score(p, vocab, unk_milli) for p in pieces)
        if best is None or sc > best[1] or (sc == best[1] and m < best[2]):
            best = (pieces, sc, m)
    return best  # type: ignore[return-value]
