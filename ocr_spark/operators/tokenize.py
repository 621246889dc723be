"""Distributed BPE tokenization over the documents table (F11 + the
token-budgeting staple of a training-data pipeline).

Shape at 100 TB:
- word counting is ONE codegen'd groupBy over exploded words with map-side
  partial aggregation (the only corpus-wide shuffle);
- merge training consumes only the bounded top-K word list on the driver
  (rank by (count desc, word) -> deterministic), exactly the bounded-sample
  pattern of the IVF coarse quantizer;
- encoding broadcasts the rank table once per executor inside an
  Arrow-batched mapInPandas (north_rule: decoder tables once per executor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..kernels import bpe as bpe_kernel


def corpus_word_counts(docs: DataFrame, *, lowercase: bool = True) -> DataFrame:
    text = F.lower(F.col("text")) if lowercase else F.col("text")
    words = F.split(F.trim(text), r"\s+")
    from ..plans.session import widen

    return (
        widen(docs).select(F.explode(words).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_bpe_merges(
    docs: DataFrame, *, n_merges: int = 200, top_k_words: int = 20000
) -> dict:
    """Distributed count -> bounded driver-side merge training."""
    top = (
        corpus_word_counts(docs)
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(top_k_words)
        .collect()
    )
    return bpe_kernel.train_bpe({r["word"]: int(r["cnt"]) for r in top}, n_merges)


def bpe_encode_table(docs: DataFrame, ranks: dict) -> DataFrame:
    """(doc_id, text) -> (doc_id, n_words, n_bpe_tokens, head_tokens_csv).

    The rank table ships in the UDF closure (one broadcast per executor);
    integer/string outputs only, so the fixture oracle hashes exactly.
    """

    def gen(batches):
        import pandas as pd

        cache: dict = {}  # word->tokens memo shared across the partition
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = bpe_kernel.encode_text_bpe(
                    str(text).lower(), ranks, cache=cache
                )
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_words": len(str(text).split()),
                        "n_bpe_tokens": len(toks),
                        "head_tokens_csv": ",".join(toks[:12]),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_words", "n_bpe_tokens", "head_tokens_csv"]
            )

    return docs.select("doc_id", "text").mapInPandas(
        gen, schema="doc_id long, n_words int, n_bpe_tokens int, head_tokens_csv string"
    )


# --------------------------------------------------------------------------
# Unigram-LM tokenization (Kudo 2018 — the SentencePiece unigram model)
# --------------------------------------------------------------------------

#: Literal evaluation vocab (integer milli-log-probs) shared by the
#: `unigram_segment` query and its DuckDB enumeration oracle — the single
#: source of truth both sides render from.
UNIGRAM_VOCAB: dict[str, int] = {
    "the": -2500, "ing": -3000, "ion": -3200, "er": -3500, "an": -3600,
    "re": -3700, "in": -3400, "on": -3800, "at": -3900, "es": -4000,
    "ed": -4100, "en": -4200, "ti": -4300, "te": -4400, "or": -4500,
    "st": -4600, "ar": -4700, "nd": -4800, "al": -4900, "nt": -5000,
    "th": -3050, "he": -3150,
    "e": -2800, "t": -3100, "a": -3300, "o": -3500, "i": -3600,
    "n": -3700, "s": -3800, "r": -3900, "h": -4000, "l": -4100,
    "d": -4200, "c": -4300, "u": -4400, "m": -4500,
}

UNK_MILLI = -15_000


def unigram_segment_table(
    words: DataFrame,
    vocab: dict[str, int] | None = None,
    *,
    unk_milli: int = UNK_MILLI,
    word_col: str = "word",
) -> DataFrame:
    """(word) -> (word, segmentation, score_milli, n_pieces, cut_mask) via
    exact integer Viterbi (kernels/unigram.py).  ONE Arrow stage; the
    vocab ships in the closure (broadcast once per executor).  The cut
    bitmask makes the deterministic tie-break externally visible — the
    oracle enumerates all 2^(L-1) masks and must land on the same one."""
    vocab = dict(UNIGRAM_VOCAB if vocab is None else vocab)

    def gen(batches):
        import pandas as pd

        from ..kernels.unigram import viterbi_segment

        for pdf in batches:
            out = {"word": [], "segmentation": [], "score_milli": [],
                   "n_pieces": [], "cut_mask": []}
            for w in pdf[word_col]:
                pieces, score, mask = viterbi_segment(str(w), vocab, unk_milli=unk_milli)
                out["word"].append(str(w))
                out["segmentation"].append(" ".join(pieces))
                out["score_milli"].append(score)
                out["n_pieces"].append(len(pieces))
                out["cut_mask"].append(mask)
            yield pd.DataFrame(out)

    return words.mapInPandas(
        gen,
        schema="word string, segmentation string, score_milli long, "
        "n_pieces int, cut_mask long",
    )


# --------------------------------------------------------------------------
# WordPiece tokenization (Wu et al. 2016 — the BERT tokenizer)
# --------------------------------------------------------------------------

#: Literal evaluation vocab shared by the `wordpiece` query and its DuckDB
#: greedy-replay oracle — the single source of truth both sides render
#: from. Word-initial pieces bare, continuations '##'-prefixed. 'q', 'x',
#: 'z' have no bare single and 'j', 'q', 'z' no continuation single, so
#: words touching them exercise the all-or-nothing [UNK] rule.
WORDPIECE_VOCAB: tuple[str, ...] = tuple(
    [c for c in "abcdefghijklmnoprstuvwy"]
    + ["##" + c for c in "abcdefghiklmnoprstuvwxy"]
    + ["the", "th", "re", "un", "in", "on", "an", "st", "wh", "no"]
    + ["##ing", "##tion", "##ion", "##ti", "##ed", "##er", "##es", "##at",
       "##or", "##en", "##nd", "##ar", "##st", "##th", "##he", "##ly"]
)


def wordpiece_segment_table(
    words: DataFrame,
    vocab: "set[str] | tuple[str, ...] | None" = None,
    *,
    word_col: str = "word",
) -> DataFrame:
    """(word) -> (word, segmentation, n_pieces, is_unk) via greedy
    longest-match-first WordPiece (kernels/wordpiece.py). ONE Arrow
    stage; the vocab ships in the closure (broadcast once per executor).
    Greedy longest-match is decision-free, so the DuckDB oracle replays
    it with unrolled join+argmax steps and must match exactly."""
    vset = frozenset(WORDPIECE_VOCAB if vocab is None else vocab)

    def gen(batches):
        import pandas as pd

        from ..kernels.wordpiece import wordpiece_segment

        for pdf in batches:
            out = {"word": [], "segmentation": [], "n_pieces": [], "is_unk": []}
            for w in pdf[word_col]:
                pieces, unk = wordpiece_segment(str(w), vset)
                out["word"].append(str(w))
                out["segmentation"].append(" ".join(pieces))
                out["n_pieces"].append(len(pieces))
                out["is_unk"].append(unk)
            yield pd.DataFrame(out)

    return words.mapInPandas(
        gen, schema="word string, segmentation string, n_pieces int, is_unk boolean"
    )


def train_wordpiece_vocab(
    docs: DataFrame, *, n_merges: int = 200, top_k_words: int = 20000
) -> set[str]:
    """Distributed word count -> bounded driver-side likelihood-gain merge
    training (kernels/wordpiece.train_wordpiece) — the same coarse-
    quantizer shape as train_bpe: the corpus-wide work is ONE groupBy,
    the driver holds only the top-K word list."""
    from ..kernels.wordpiece import train_wordpiece

    top = (
        corpus_word_counts(docs)
        .select(F.regexp_replace("word", "[^a-z]+", "").alias("word"), "cnt")
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.sum("cnt").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(top_k_words)
        .collect()
    )
    return train_wordpiece({r["word"]: int(r["cnt"]) for r in top}, n_merges)


def train_unigram(
    docs: DataFrame,
    *,
    max_piece_len: int = 4,
    vocab_size: int = 300,
    rounds: int = 2,
    unk_milli: int = UNK_MILLI,
) -> dict[str, int]:
    """Hard-EM unigram training (the Viterbi-re-estimation simplification
    of Kudo 2018 §3.2's EM + pruning loop), Spark-shaped:

    - seed counts: ONE exploded-substring groupBy over the word-count
      table (substrings built as pure Column algebra — no Python);
    - each round: segment the bounded word table with the current scores
      (one Arrow stage, scores in the closure), re-count pieces with one
      groupBy, floor-quantize ln(count/total) to integer millis;
    - the only driver-side state is the vocab itself (<= vocab_size +
      alphabet), the bounded-sample pattern shared with BPE/IVF training.

    Single characters are always retained so every word stays
    segmentable (losslessness is test-asserted)."""
    import math

    wc = corpus_word_counts(docs).select(
        F.regexp_replace("word", "[^a-z]+", "").alias("word"), "cnt"
    ).where(F.length("word") > 0)

    subs = F.expr(
        f"flatten(transform(sequence(1, least({max_piece_len}, length(word))), "
        "l -> transform(sequence(1, length(word) - l + 1), "
        "s -> substr(word, s, l))))"
    )
    counts = (
        wc.select(F.explode(subs).alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("total"))
    )

    def to_scores(rows) -> dict[str, int]:
        singles = [(r["piece"], int(r["total"])) for r in rows if len(r["piece"]) == 1]
        multis = [(r["piece"], int(r["total"])) for r in rows if len(r["piece"]) > 1]
        multis.sort(key=lambda t: (-t[1], t[0]))
        keep = dict(singles)
        keep.update(multis[: max(0, vocab_size - len(singles))])
        z = sum(keep.values())
        return {p: math.floor(1000.0 * math.log(c / z)) for p, c in keep.items()}

    scores = to_scores(counts.collect())

    for _ in range(rounds):
        snap = dict(scores)

        def gen(batches, _scores=snap):
            import pandas as pd

            from ..kernels.unigram import viterbi_segment

            for pdf in batches:
                ps, cs = [], []
                for w, c in zip(pdf["word"], pdf["cnt"]):
                    pieces, _, _ = viterbi_segment(str(w), _scores, unk_milli=unk_milli)
                    ps.extend(pieces)
                    cs.extend([int(c)] * len(pieces))
                yield pd.DataFrame({"piece": ps, "cnt": pd.array(cs, dtype="int64")})

        recount = (
            wc.mapInPandas(gen, schema="piece string, cnt long")
            .groupBy("piece")
            .agg(F.sum("cnt").alias("total"))
        )
        scores = to_scores(recount.collect())
    return scores
