"""Readability scores: hand-computed Flesch/FK values, syllable heuristic
edges, the empty-document contract, and the zero-exchange plan shape."""

from ocr_spark.operators.text_analysis import readability_scores


def _one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return readability_scores(df).collect()[0]


def test_hand_computed_flesch(spark):
    # "the cat sat. it ran fast." -> 2 sentences, 6 words
    # syllables: the=1 (runs e=1, no silent-e since runs==1), cat=1, sat=1,
    # it=1, ran=1, fast=1 -> 6
    r = _one(spark, "the cat sat. it ran fast.")
    assert (r.n_sentences, r.n_words, r.n_syllables) == (2, 6, 6)
    assert r.flesch_micro == 206835000 - (1015000 * 6) // 2 - (84600000 * 6) // 6
    assert r.fk_grade_micro == (390000 * 6) // 2 + (11800000 * 6) // 6 - 15590000


def test_silent_e_and_vowel_runs(spark):
    # "coffee table" -> coffee: runs o,ee = 2, ends 'e' -> 1; wait: runs are
    # 'o','ee' = 2, silent-e applies -> 1. table: 'a','e' = 2 runs -> 1.
    r = _one(spark, "coffee table")
    assert r.n_syllables == 2
    # single-run word ending in e keeps its floor of 1: "we" -> 1
    assert _one(spark, "we").n_syllables == 1
    # y counts as a vowel: "rhythm" -> 1 run
    assert _one(spark, "rhythm").n_syllables == 1


def test_empty_and_no_terminator(spark):
    r = _one(spark, "")
    assert (r.n_sentences, r.n_words, r.n_syllables) == (1, 0, 0)
    assert r.flesch_micro is None and r.fk_grade_micro is None
    # no sentence terminator floors at 1 sentence
    assert _one(spark, "no terminator here").n_sentences == 1


def test_plan_is_exchange_free(spark):
    df = spark.createDataFrame([(1, "a b c.")], "doc_id long, text string")
    plan = readability_scores(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
