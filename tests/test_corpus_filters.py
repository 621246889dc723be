"""Corpus-filter operators: unit semantics + DuckDB oracle parity at
smoke scale (the same compare the driver runs at sf0.01)."""

import duckdb
import pytest

import __spark_entry__ as entry_mod
from ocr_spark.operators import corpus_filters as cf
from tests.conftest import SF_SMOKE

NEW_QUERIES = ["c4_clean", "pii_redact", "ngram_spans", "hash_embed", "bigram_lm",
               "dup_spans", "decontaminate", "stratified_sample"]


# ---------------------------------------------------------------------------
# unit semantics
# ---------------------------------------------------------------------------

def test_c4_line_and_page_rules(spark):
    df = spark.createDataFrame(
        [
            # 3 good lines + 1 unterminated + 1 short + 1 javascript
            (0, "Good line with five words.\nno terminal punct here\n"
                "too short.\nplease enable javascript now ok.\n"
                "Another good line here!\nThird good line is here?"),
            (1, "lorem ipsum dolor sit amet.\nGood line here one.\n"
                "Good line here two.\nGood line here three."),   # page drop
            (2, "var x = { a: 1 }.\nGood line here one.\n"
                "Good line here two.\nGood line here three."),   # page drop
            (3, "Only one good line here.\nsecond has no punct\nthird short."),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in cf.c4_line_clean(df).collect()}
    assert set(rows) == {0}  # 1,2 page-dropped; 3 below min_lines
    assert rows[0].n_lines == 6
    assert rows[0].n_kept == 3
    assert rows[0].clean_text.split("\n") == [
        "Good line with five words.",
        "Another good line here!",
        "Third good line is here?",
    ]


def test_pii_redact_counts_and_text(spark):
    df = spark.createDataFrame(
        [
            (0, "mail a.b+c@sub.ex.org then call 415-555-0042 via 10.0.0.1 twice 10.0.0.2"),
            (1, "nothing sensitive here at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in cf.pii_redact(df).collect()}
    assert (rows[0].n_emails, rows[0].n_phones, rows[0].n_ips) == (1, 1, 2)
    assert rows[0].redacted_text == "mail [EMAIL] then call [PHONE] via [IP] twice [IP]"
    assert (rows[1].n_emails, rows[1].n_phones, rows[1].n_ips) == (0, 0, 0)
    assert rows[1].redacted_text == rows[1].text


def test_dup_ngram_uses_document_frequency(spark):
    # doc 2 repeats its own 5-gram twice but shares nothing cross-doc:
    # within-doc repetition must NOT count as duplication (doc_freq == 1)
    df = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "alpha beta gamma delta epsilon other words"),
            (2, "p q r s t p q r s t"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in cf.dup_ngram_spans(df, n=5).collect()}
    assert rows[0].n_ngrams == 2 and rows[0].n_dup == 1
    assert rows[1].n_ngrams == 3 and rows[1].n_dup == 1
    assert rows[2].n_ngrams == 6 and rows[2].n_dup == 0
    assert rows[2].dup_ratio == 0.0


def test_hash_embedding_matches_python_fold(spark):
    def poly(w):
        acc = 0
        for ch in w:
            acc = (acc * cf.POLY_MULT + ord(ch)) % cf.POLY_MOD
        return acc

    text = "spark scan merge spark"
    df = spark.createDataFrame([(0, text), (1, "  ")], "doc_id long, text string")
    rows = {r.doc_id: r for r in cf.hash_embedding(df, dim=16).collect()}
    expected = [0] * 16
    for w in text.split():
        h = poly(w)
        expected[h % 16] += 1 if h % 32 < 16 else -1
    assert rows[0].n_tokens == 4
    assert rows[0].emb_csv == ",".join(str(v) for v in expected)
    # blank doc: zero tokens, all-zero embedding (no NULL lanes)
    assert rows[1].n_tokens == 0
    assert rows[1].emb_csv == ",".join(["0"] * 16)


def test_bigram_lm_known_and_unknown(spark):
    df = spark.createDataFrame(
        [(0, "THE the"), (1, "zzzz"), (2, "a a a")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in cf.bigram_lm_score(df).collect()}
    # 'the' -> th, he (both in the table); case-folded
    assert (rows[0].n_bigrams, rows[0].n_known, rows[0].bigram_score) == (4, 4, 1.0)
    assert (rows[1].n_bigrams, rows[1].n_known, rows[1].bigram_score) == (3, 0, 0.0)
    # single-char tokens yield no bigrams -> NULL score, not a crash
    assert rows[2].n_bigrams == 0 and rows[2].bigram_score is None


# ---------------------------------------------------------------------------
# oracle parity at smoke scale (the driver's compare, run locally)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", NEW_QUERIES)
def test_oracle_parity_smoke(spark, name):
    got = entry_mod.queries()[name](spark, SF_SMOKE).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    exp = con.sql(entry_mod.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(exp.columns)
    got = got[sorted(got.columns)].sort_values(by=sorted(got.columns)).reset_index(drop=True)
    exp = exp[sorted(exp.columns)].sort_values(by=sorted(exp.columns)).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    for col in got.columns:
        assert got[col].tolist() == exp[col].tolist(), f"{name}.{col} mismatch"


def test_dup_span_removal_rebuilds_text(spark):
    df = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon unique tail words"),
            (1, "prefix bit alpha beta gamma delta epsilon more stuff"),
            (2, "independent text with no shared five gram runs at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in cf.dup_span_removal(df, n=5).collect()}
    # the shared 5-gram covers tokens 1-5 of doc 0 and 3-7 of doc 1
    assert rows[0].n_removed == 5
    assert rows[0].clean_text == "unique tail words"
    assert rows[1].n_removed == 5
    assert rows[1].clean_text == "prefix bit more stuff"
    assert rows[2].n_removed == 0
    assert rows[2].clean_text == df.where("doc_id=2").first().text
    # full coverage -> empty string, not NULL
    both = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d e")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in cf.dup_span_removal(both, n=5).collect()}
    assert out[0].clean_text == "" and out[0].n_removed == 5


def test_decontaminate_flags_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (0, "q w e r t y u i o p extra words beyond the passage"),
            (1, "totally clean document with no benchmark overlap at all ok"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([("q w e r t y u i o p",)], "passage string")
    rows = {r.doc_id: r for r in cf.decontaminate(docs, bench, n=8).collect()}
    assert rows[0].is_contaminated and rows[0].n_hits == 3  # 3 distinct 8-grams
    assert not rows[1].is_contaminated and rows[1].n_hits == 0


def test_stratified_sample_deterministic_and_proportional(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr") for i in range(40)],
        "doc_id long, lang string",
    )
    a = sorted(r.doc_id for r in cf.stratified_sample(df, frac=0.25).collect())
    b = sorted(r.doc_id for r in cf.stratified_sample(df, frac=0.25).collect())
    assert a == b  # deterministic, not rand()
    out = cf.stratified_sample(df, frac=0.25).groupBy("lang").count().collect()
    assert {r.lang: r["count"] for r in out} == {"en": 5, "fr": 5}


def test_decontaminate_plan_broadcasts_benchmark(spark):
    df = entry_mod.queries()["decontaminate"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_ccnet_buckets_tie_safe_terciles(spark):
    import pandas as pd

    from ocr_spark.operators.corpus_filters import ccnet_buckets

    # fluent English, mid, and junk rows; ties (identical text) must land
    # in the same bucket
    texts = (
        ["the other and there in the end"] * 3     # high score, tied
        + ["zz qq xx vv kk"] * 3                    # zero score, tied
        + ["the xq on zz at kk"] * 3                # middle, tied
    )
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(9), "text": texts})
    )
    out = ccnet_buckets(df).collect()
    by_text_bucket = {}
    for r in out:
        by_text_bucket.setdefault(texts[r.doc_id], set()).add(r.bucket)
    # each tied group got exactly one bucket
    assert all(len(s) == 1 for s in by_text_bucket.values())
    buckets = {texts[r.doc_id]: r.bucket for r in out}
    assert buckets["the other and there in the end"] == "head"
    assert buckets["the xq on zz at kk"] == "middle"
    assert buckets["zz qq xx vv kk"] == "tail"
    # plan: the label side broadcasts (no extra wide exchange on docs)
    plan = ccnet_buckets(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan


def test_gopher_rules_signals_and_verdict(spark):
    """Each Gopher rule trips independently; signals are exact."""
    good = ("the quick brown fox and that dog have fun with words to be "
            "said of many things " * 3).strip()          # 48 words? ensure >=30
    df = spark.createDataFrame(
        [
            (0, good),                                   # passes all rules
            (1, "word " * 40 + "###### ..."),            # symbol ratio trips
            (2, "\n".join("- bullet item " + str(i) for i in range(10))),
            (3, "the and that " + "12345 " * 40),        # alpha frac trips
            (4, "zz yy xx " * 20),                       # no stopwords
            (5, ""),                                     # empty
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in cf.gopher_rules(
        df, min_words=10, min_mean_len=2.0, max_mean_len=10.0).collect()}

    assert out[0].passes
    assert out[0].stop_hits >= 2
    r1 = out[1]
    assert r1.symbol_word_ratio > 0.1 and not r1.passes
    # 6 '#' + 1 '...' = 7 symbols over 42 words
    assert r1.n_words == 42 and round(7 / 42, 6) == r1.symbol_word_ratio
    r2 = out[2]
    assert r2.bullet_line_frac == 1.0 and not r2.passes
    r3 = out[3]
    assert r3.alpha_word_frac < 0.8 and not r3.passes
    r4 = out[4]
    assert r4.stop_hits == 0 and not r4.passes
    r5 = out[5]
    assert r5.n_words == 0 and r5.mean_word_len is None and not r5.passes


def test_gopher_rules_zero_exchange_plan(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = cf.gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# soft404_flags
# ---------------------------------------------------------------------------

def test_soft404_truth_table(spark):
    from ocr_spark.operators.corpus_filters import soft404_flags

    pages = spark.createDataFrame(
        [
            ("a", 200, "404 Not Found", "x"),  # title hit -> flagged
            ("b", 404, "404 Not Found", "x"),  # hard 404: status gate
            ("c", 200, "Fine title", "The page you requested was not found."),
            ("d", 200, "Fine title",
             "An essay on 404 error pages. " + "w " * 200),  # long: NOT flagged
            ("e", 200, None, None),  # nulls degrade to not-flagged
        ],
        "url string, status int, title string, text string",
    )
    got = {r.url: r.is_soft404 for r in soft404_flags(pages).collect()}
    assert got == {"a": True, "b": False, "c": True, "d": False, "e": False}


def test_soft404_plan_zero_exchange_zero_python(spark):
    from ocr_spark.operators.corpus_filters import soft404_flags

    df = soft404_flags(
        spark.createDataFrame(
            [("u", 200, "t", "x")], "url string, status int, title string, text string"
        )
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan

# ---------------------------------------------------------------------------
# compression_ratio
# ---------------------------------------------------------------------------

def test_compression_ratio_separates_spam_from_prose(spark):
    import zlib

    prose = ("The committee reviewed seventeen proposals before lunch, "
             "rejecting most for budget reasons and two for scope creep.")
    spam = "spam click here " * 40
    df = spark.createDataFrame(
        [(1, prose), (2, spam), (3, None), (4, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in cf.compression_ratio(df).collect()}
    # pinned against stdlib zlib directly
    exp1 = 1000 * len(zlib.compress(prose.encode(), 6)) // len(prose.encode())
    exp2 = 1000 * len(zlib.compress(spam.encode(), 6)) // len(spam.encode())
    assert got[1].compress_milli == exp1 and not got[1].is_repetitive
    assert got[2].compress_milli == exp2 and got[2].is_repetitive
    assert got[2].compress_milli < 300 < got[1].compress_milli
    # NULL and empty text: NULL ratio, not repetitive
    assert got[3].compress_milli is None and not got[3].is_repetitive
    assert got[4].compress_milli is None and not got[4].is_repetitive


def test_compression_ratio_single_arrow_stage(spark):
    df = cf.compression_ratio(
        spark.createDataFrame([(1, "x")], "doc_id long, text string")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") == 1  # udf evaluated exactly once
