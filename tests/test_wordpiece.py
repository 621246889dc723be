"""WordPiece: greedy longest-match semantics, the all-or-nothing [UNK]
rule, likelihood-gain training invariants, and the Spark operator's
parity with the kernel."""

import random

from ocr_spark.kernels.wordpiece import UNK, train_wordpiece, wordpiece_segment
from ocr_spark.operators.tokenize import (
    WORDPIECE_VOCAB,
    train_wordpiece_vocab,
    wordpiece_segment_table,
)

VSET = frozenset(WORDPIECE_VOCAB)


def test_longest_match_first():
    # 'the' is in vocab bare; greedy takes it whole, not 'th'+'##e'
    assert wordpiece_segment("the", VSET) == (["the"], False)
    # 'thee': 'the' matches first (longest at pos 0), then '##e'
    assert wordpiece_segment("thee", VSET) == (["the", "##e"], False)
    # continuation longest-match: 'resting' -> 're' + '##st' + '##ing'
    pieces, unk = wordpiece_segment("resting", VSET)
    assert not unk and "".join(p.lstrip("#") for p in pieces) == "resting"
    assert pieces[0] == "re" and pieces[-1] == "##ing"


def test_unk_is_all_or_nothing():
    # 'q' has no bare single-char piece -> any word STARTING with q that
    # no multi-char piece covers dies entirely, even if the rest is easy
    assert wordpiece_segment("qat", VSET) == ([UNK], True)
    # 'j' has no continuation single: words with interior 'j' die unless
    # a multi-char piece spans it
    assert wordpiece_segment("aj", VSET) == ([UNK], True)
    # but word-initial 'j' is fine
    assert wordpiece_segment("ja", VSET) == (["j", "##a"], False)


def test_segmentation_is_lossless_fuzz():
    rng = random.Random(11)
    letters = "abcdefghijklmnopqrstuvwxyz"
    for _ in range(300):
        w = "".join(rng.choice(letters) for _ in range(rng.randint(1, 10)))
        pieces, unk = wordpiece_segment(w, VSET)
        if unk:
            assert pieces == [UNK]
        else:
            assert "".join(p[2:] if p.startswith("##") else p for p in pieces) == w
            assert all(p in VSET for p in pieces)


def test_empty_word():
    assert wordpiece_segment("", VSET) == ([], False)


def test_train_wordpiece_merges_by_likelihood_gain():
    # 'xz' occurs always together while 'a','b' are common apart:
    # count(xz)/(count(x)count(z)) = 50/(50*50) >> count(ab)/(count(a)count(b))
    counts = {"xz": 50, "ab": 30, "ax": 0, "aa": 40, "ba": 40}
    vocab = train_wordpiece({k: v for k, v in counts.items() if v}, 2)
    assert "x##z" not in vocab  # merged symbol is 'x' + '##z'[2:] = 'xz'
    assert "xz" in vocab
    # determinism
    again = train_wordpiece({k: v for k, v in counts.items() if v}, 2)
    assert vocab == again


def test_operator_matches_kernel(spark):
    words = ["the", "nation", "qqq", "standard", "whether", "aj"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r.word: r for r in wordpiece_segment_table(df).collect()}
    for w in words:
        pieces, unk = wordpiece_segment(w, VSET)
        assert got[w].segmentation == " ".join(pieces)
        assert got[w].n_pieces == len(pieces)
        assert got[w].is_unk == unk


def test_train_vocab_spark(spark):
    rows = [(i, "running jumping testing resting waiting") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = train_wordpiece_vocab(docs, n_merges=40, top_k_words=100)
    # the shared 'ing' suffix must be merged into one continuation piece
    assert "##ing" in vocab
    # every corpus word segments losslessly under the trained vocab
    for w in ["running", "jumping", "testing", "resting", "waiting"]:
        pieces, unk = wordpiece_segment(w, vocab)
        assert not unk
        assert "".join(p[2:] if p.startswith("##") else p for p in pieces) == w
