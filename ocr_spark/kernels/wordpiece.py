"""WordPiece tokenization (Wu et al. 2016; the BERT tokenizer's subword
step): greedy longest-match-first segmentation against a piece vocab
where non-initial pieces carry the ``##`` continuation prefix.

Semantics (BERT reference behavior):
- scan the word left to right; at each position take the LONGEST vocab
  piece matching the remaining text (``##``-prefixed form when the
  position is not the word start);
- if at any position no piece matches, the WHOLE word maps to a single
  ``[UNK]`` token (WordPiece is all-or-nothing per word, unlike BPE's
  byte fallback).

Determinism contract: greedy longest-match is decision-free — at a given
position at most one vocab entry of each length can match (two distinct
same-length pieces cannot both equal the same substring), so the
tokenization is a pure function of (word, vocab) with no tie-break rule
needed at all. The DuckDB oracle replays the greedy scan step by step
with unrolled join+argmax rounds and must land on the identical piece
sequence.

Training (the likelihood-gain pair-merge loop) lives in
operators/tokenize.py next to the BPE/unigram trainers; this kernel is
the per-word inference math shared by the operator, the trainer's
re-segmentation step, and the tests.
"""

from __future__ import annotations

UNK = "[UNK]"


def wordpiece_segment(
    word: str, vocab: set[str] | dict, *, max_piece_len: int = 100
) -> tuple[list[str], bool]:
    """Greedy longest-match-first WordPiece split of ``word``.

    Returns ``(pieces, is_unk)``; ``pieces == [UNK]`` and ``is_unk`` when
    any position has no matching piece. ``vocab`` holds word-initial
    pieces bare and continuation pieces with the ``##`` prefix.
    """
    n = len(word)
    if n == 0:
        return [], False
    pieces: list[str] = []
    pos = 0
    while pos < n:
        end = min(n, pos + max_piece_len)
        found = None
        while end > pos:
            cand = word[pos:end] if pos == 0 else "##" + word[pos:end]
            if cand in vocab:
                found = cand
                break
            end -= 1
        if found is None:
            return [UNK], True
        pieces.append(found)
        pos = end
    return pieces, False


def train_wordpiece(
    word_counts: dict[str, int], n_merges: int
) -> set[str]:
    """Likelihood-gain WordPiece training (the Schuster & Nakajima 2012
    criterion): each round merge the adjacent symbol pair maximizing
    count(ab) / (count(a) * count(b)) — the pair whose merge most
    increases a unigram LM's corpus likelihood. Exact arithmetic: pair
    scores compare by integer cross-multiplication (via Fraction), ties
    break lexicographically, so training is deterministic.

    Returns the piece vocab: all single-symbol pieces (word-initial bare
    + ``##`` continuations) plus one merged piece per round.
    """
    from fractions import Fraction

    words: dict[tuple, int] = {}
    for w, c in word_counts.items():
        if not w:
            continue
        sym = (w[0],) + tuple("##" + ch for ch in w[1:])
        words[sym] = words.get(sym, 0) + c

    vocab: set[str] = {s for sym in words for s in sym}
    for _ in range(n_merges):
        pair_counts: dict[tuple, int] = {}
        single_counts: dict[str, int] = {}
        for sym, c in words.items():
            for s in sym:
                single_counts[s] = single_counts.get(s, 0) + c
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        scores = {
            p: Fraction(c, single_counts[p[0]] * single_counts[p[1]])
            for p, c in pair_counts.items()
        }
        best_score = max(scores.values())
        # deterministic tie-break: among max-score pairs take the smallest
        a, b = min(p for p, s in scores.items() if s == best_score)
        merged = a + b[2:]  # continuation symbols always carry '##'
        vocab.add(merged)
        new_words: dict[tuple, int] = {}
        for sym, c in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_words[t] = new_words.get(t, 0) + c
        words = new_words
    return vocab
