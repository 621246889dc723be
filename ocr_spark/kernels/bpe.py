"""F11: byte-pair-encoding machinery (train + apply).

The reference ships only the APPLY half (the canonical GPT-2 merge loop,
/root/reference/utils/text/text_processing.py:330-368) and never uses it
at char-level inference; for a training-data engine the tokenizer matters
(token budgeting, dedup keys), so this module carries both halves:

- ``bpe_apply``: the standard greedy lowest-rank merge loop (public
  algorithm; behavior matches the reference's ``bpe``).
- ``train_bpe``: Sennrich-style training over a word-frequency table —
  repeatedly merge the globally most frequent adjacent pair; ties break
  lexicographically so training is DETERMINISTIC.

The Spark-native split lives in operators/tokenize.py: word counting is
distributed (one groupBy), merge training runs on the bounded top-K word
list on the driver (the coarse-quantizer pattern, like IVF centroids), and
encoding broadcasts the rank table once per executor.
"""

from __future__ import annotations


def get_pairs(word: tuple) -> set:
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


def bpe_apply(token: str, ranks: dict, end_of_word: str | None = None) -> tuple:
    """Greedy BPE merge loop: repeatedly merge the pair with the LOWEST
    rank until no mergeable pair remains. Returns the symbol tuple."""
    if end_of_word is None:
        word = tuple(token)
    else:
        word = tuple(token[:-1]) + (token[-1] + end_of_word,) if token else (end_of_word,)
    if len(word) < 2:
        return word

    while True:
        pairs = get_pairs(word)
        best = min(pairs, key=lambda p: (ranks.get(p, float("inf")), p))
        if best not in ranks:
            return word
        first, second = best
        merged = []
        i = 0
        while i < len(word):
            if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                merged.append(first + second)
                i += 2
            else:
                merged.append(word[i])
                i += 1
        word = tuple(merged)
        if len(word) == 1:
            return word


def train_bpe(word_counts: dict[str, int], n_merges: int, *, end_of_word: str = "</w>"):
    """Learn ``n_merges`` merge rules from a word->count table.

    Returns ranks: {(first, second): rank}. Deterministic: the most
    frequent pair wins each round, ties break lexicographically.
    """
    vocab = {}
    for w, c in word_counts.items():
        if not w:
            continue
        sym = tuple(w[:-1]) + (w[-1] + end_of_word,)
        vocab[sym] = vocab.get(sym, 0) + c

    ranks: dict[tuple, int] = {}
    for rank in range(n_merges):
        pair_counts: dict[tuple, int] = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        ranks[best] = rank
        first, second = best
        new_vocab = {}
        for sym, c in vocab.items():
            merged = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == first and sym[i + 1] == second:
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(sym[i])
                    i += 1
            key = tuple(merged)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return ranks


def encode_text_bpe(
    text: str,
    ranks: dict,
    *,
    end_of_word: str = "</w>",
    cache: dict | None = None,
    cache_cap: int = 1 << 18,
) -> list[str]:
    """Whitespace-pretokenized BPE encode: each word runs the merge loop.

    ``cache`` memoizes word -> symbol tuple (GPT-2's own trick): natural
    text is Zipfian, so a per-partition cache turns the merge loop into a
    dict hit for almost every token. Bounded by ``cache_cap`` (reset when
    full) so a pathological unique-word stream cannot grow memory."""
    out: list[str] = []
    if cache is None:
        cache = {}
    for w in text.split():
        toks = cache.get(w)
        if toks is None:
            toks = bpe_apply(w, ranks, end_of_word=end_of_word)
            if len(cache) >= cache_cap:
                cache.clear()
            cache[w] = toks
        out.extend(toks)
    return out
