"""Interpolated Kneser-Ney bigram scoring (operators/lm.kneser_ney_score)."""

from pyspark.sql import functions as F

from ocr_spark.operators.lm import kneser_ney_score, ngram_lm_counts


def _bi(spark, texts):
    train = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    _, bi, _ = ngram_lm_counts(train, min_count=2)
    return bi


def test_continuation_count_beats_raw_frequency(spark):
    # the classic KN motivation: "francisco" is frequent but only ever
    # follows "san"; "york" follows three different words. After an
    # UNSEEN context the model must prefer york despite francisco's
    # higher raw count.
    texts = ["san francisco " * 10, "new york new york", "old york old york", "big york big york"]
    bi = _bi(spark, texts)
    probe = spark.createDataFrame(
        [(0, "zzz francisco"), (1, "zzz york")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["kn_milli"] for r in kneser_ney_score(probe, bi).collect()}
    assert got[1] > got[0]  # higher log-prob for the diverse-context word


def test_seen_bigram_outscores_unseen_same_context(spark):
    texts = ["a b a b a b", "a c x y x y"]
    bi = _bi(spark, texts)
    probe = spark.createDataFrame(
        [(0, "a b"), (1, "a z")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["kn_milli"] for r in kneser_ney_score(probe, bi).collect()}
    assert got[0] > got[1]


def test_zero_bigram_docs_kept_with_null_norm(spark):
    bi = _bi(spark, ["a b a b"])
    probe = spark.createDataFrame(
        [(0, "single"), (1, ""), (2, "a b")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in kneser_ney_score(probe, bi).collect()}
    assert set(rows) == {0, 1, 2}
    for did in (0, 1):
        assert rows[did]["n_bigrams"] == 0
        assert rows[did]["kn_milli"] == 0
        assert rows[did]["kn_per_bigram_milli"] is None
    assert rows[2]["n_bigrams"] == 1


def test_probabilities_bounded(spark):
    # every per-bigram term is a log of a probability in (0, 1]: the
    # per-bigram normalized score can never exceed 0
    texts = ["the cat sat on the mat " * 3, "a cat ran to a mat " * 3]
    bi = _bi(spark, texts)
    probe = spark.createDataFrame(
        list(enumerate(texts + ["totally unseen words here"])),
        "doc_id long, text string",
    )
    for r in kneser_ney_score(probe, bi).collect():
        if r["kn_per_bigram_milli"] is not None:
            assert r["kn_per_bigram_milli"] <= 0
