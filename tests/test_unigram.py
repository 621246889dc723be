"""Unigram-LM tokenization: Viterbi vs full enumeration (the same check
the DuckDB oracle performs in SQL), hard-EM training invariants, and the
Spark operator's parity with the kernel."""

import random

from ocr_spark.kernels.unigram import enumerate_best, viterbi_segment
from ocr_spark.operators.tokenize import UNIGRAM_VOCAB, train_unigram, unigram_segment_table


def test_viterbi_equals_enumeration_fuzz():
    rng = random.Random(7)
    letters = "abcdefghijklmnopqrstuvwxyz"
    words = ["the", "testing", "nation", "a", "zz", "xyzzyq"] + [
        "".join(rng.choice(letters) for _ in range(rng.randint(1, 10)))
        for _ in range(200)
    ]
    for w in words:
        assert viterbi_segment(w, UNIGRAM_VOCAB) == enumerate_best(w, UNIGRAM_VOCAB), w


def test_segmentation_is_lossless_and_tiebreak_is_minimal_mask():
    pieces, score, mask = viterbi_segment("testing", UNIGRAM_VOCAB)
    assert "".join(pieces) == "testing"
    # two-way tie seeking: a vocab where 'ab' == 'a'+'b' exactly
    v = {"ab": -2000, "a": -1000, "b": -1000}
    pieces, score, mask = viterbi_segment("ab", v)
    assert score == -2000 and mask == 0 and pieces == ["ab"]  # min mask wins


def test_empty_word():
    assert viterbi_segment("", UNIGRAM_VOCAB) == ([], 0, 0)


def test_train_unigram_learns_repeated_pieces(spark):
    rows = [(i, "running jumping testing resting waiting") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    scores = train_unigram(docs, vocab_size=30, rounds=2)
    assert "ing" in scores  # the shared suffix must survive pruning
    assert all(isinstance(s, int) for s in scores.values())
    # losslessness: every corpus word segments and reassembles
    for w in ["running", "jumping", "testing", "resting", "waiting"]:
        pieces, _, _ = viterbi_segment(w, scores)
        assert "".join(pieces) == w
    # determinism
    again = train_unigram(docs, vocab_size=30, rounds=2)
    assert scores == again


def test_operator_matches_kernel(spark):
    words = ["the", "nation", "qqq", "standard"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r.word: r for r in unigram_segment_table(df).collect()}
    for w in words:
        pieces, score, mask = viterbi_segment(w, UNIGRAM_VOCAB)
        assert got[w].segmentation == " ".join(pieces)
        assert got[w].score_milli == score
        assert got[w].cut_mask == mask
        assert got[w].n_pieces == len(pieces)
