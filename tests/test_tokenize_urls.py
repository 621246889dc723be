"""BPE train/apply (F11), URL canonicalization, and the Gopher-style
repetition signals."""

import numpy as np
import pytest

from ocr_spark.kernels.bpe import bpe_apply, encode_text_bpe, train_bpe
from ocr_spark.operators.urls import canonical_url


# -- BPE --------------------------------------------------------------------

def test_train_bpe_learns_frequent_pairs():
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    ranks = train_bpe(counts, n_merges=10)
    # 'est</w>' must assemble from the most frequent pairs (newest+widest)
    toks = bpe_apply("newest", ranks, end_of_word="</w>")
    assert "".join(toks) == "newest</w>"
    assert any("est" in t for t in toks)
    # trained merges are deterministic across runs
    assert ranks == train_bpe(counts, n_merges=10)


def test_bpe_apply_merge_order_is_rank_greedy():
    # rank 0 merges first even when a later pair appears earlier in the word
    ranks = {("a", "b"): 1, ("b", "c"): 0}
    assert bpe_apply("abc", ranks) == ("a", "bc")
    # unknown pairs stay split
    assert bpe_apply("xyz", {}) == ("x", "y", "z")
    assert bpe_apply("", {}) == ()
    assert bpe_apply("q", {}) == ("q",)


def test_encode_roundtrip_concatenation():
    corpus = "the cat sat on the mat the cat ran " * 3
    words = corpus.split()
    counts = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    ranks = train_bpe(counts, n_merges=30)
    toks = encode_text_bpe(corpus, ranks)
    # lossless: stripping the end-of-word markers re-concatenates the text
    rebuilt = "".join(toks).replace("</w>", " ").strip()
    assert rebuilt == " ".join(words)
    # frequent words compress to one symbol
    assert "the</w>" in toks


def test_bpe_spark_operator(spark):
    from ocr_spark.operators.tokenize import bpe_encode_table, train_bpe_merges

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ranks = train_bpe_merges(docs, n_merges=50, top_k_words=2000)
    out = bpe_encode_table(docs, ranks)
    rows = out.collect()
    assert len(rows) == 500
    # merges compress: bpe token count < raw char count, >= word count
    r = next(r for r in rows if r.n_words > 5)
    assert r.n_bpe_tokens >= r.n_words


# -- URL canonicalization ---------------------------------------------------

@pytest.mark.parametrize(
    "url,expected",
    [
        ("HTTPS://Example.COM:443/a/b/../c?utm_source=x&b=2&a=1#f",
         "https://example.com/a/c?a=1&b=2"),
        ("http://Example.com:80/p", "http://example.com/p"),
        ("http://example.com:8080/p", "http://example.com:8080/p"),
        ("https://example.com", "https://example.com/"),
        ("https://example.com/x/?fbclid=abc", "https://example.com/x/"),
        ("https://example.com/x?b=2&a=1", "https://example.com/x?a=1&b=2"),
        ("https://example.com/a/./b//c", "https://example.com/a/b/c"),
    ],
)
def test_canonical_url(url, expected):
    assert canonical_url(url) == expected


def test_canonical_url_is_idempotent():
    urls = [
        "HTTPS://Example.COM:443/a/b/../c?utm_source=x&b=2&a=1#f",
        "http://u:p@Example.com:80/p?z=9&a=",
    ]
    for u in urls:
        once = canonical_url(u)
        assert canonical_url(once) == once


def test_url_dedup_groups(spark):
    from ocr_spark.contract import QUERIES

    out = QUERIES["url_canon"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    # doc_id%4 in {0,1} and %3 in {0,1,2} variants of the same page collapse
    by_canon = {}
    for r in rows:
        by_canon.setdefault(r.canonical_url, set()).add(r.url)
    assert any(len(v) > 1 for v in by_canon.values())
    for r in rows:
        assert "#" not in r.canonical_url
        assert "utm_" not in r.canonical_url and "fbclid" not in r.canonical_url


# -- repetition signals -----------------------------------------------------

def test_repetition_signals_values(spark):
    from ocr_spark.operators.text_analysis import repetition_signals

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "all words here are unique tokens"),
            (3, "one"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_signals(docs).collect()}
    assert got[1].n_words == 4
    assert got[1].distinct_word_ratio == 0.25
    assert got[1].top_word_frac == 1.0
    assert got[1].top_2gram_frac == 1.0
    assert got[2].distinct_word_ratio == 1.0
    assert np.isclose(got[2].top_word_frac, round(1 / 6, 6))
    assert got[3].top_2gram_frac is None  # single word: no 2-grams


def test_training_pipeline_v2_gates_repetitive_docs(spark):
    """The v2 pipeline's repetition gate must drop a spam page end to end
    while clean pages survive with BPE token budgets attached."""
    from pyspark.sql import functions as F

    from ocr_spark.contract import QUERIES

    out = QUERIES["training_pipeline_v2"](spark, "/root/testdata/sf0.001")
    n_ok = out.count()
    assert n_ok > 0
    row = out.first()
    assert row.n_bpe_tokens >= 1 and row.n_copies >= 1

    # direct gate check: a keyword-stuffed doc fails the thresholds
    from ocr_spark.operators.text_analysis import repetition_signals

    docs = spark.createDataFrame(
        [(1, "buy cheap buy cheap buy cheap buy cheap buy")],
        "doc_id long, text string",
    )
    sig = repetition_signals(docs).first()
    assert sig.top_word_frac > 0.5  # would be dropped by the v2 gate


def test_canonical_url_invalid_ports_never_raise():
    """Crawl reality: invalid ports must degrade, not kill the task."""
    assert canonical_url("http://example.com:99999/x") == "http://example.com:99999/x"
    assert canonical_url("http://example.com:abc/x") == "http://example.com:abc/x"
    assert canonical_url("") == ""


def test_registrable_domain_rule_classes(spark):
    from ocr_spark.operators.urls import registrable_domain

    cases = {
        # host: (public_suffix, registrable_domain)
        "a.b.example.com": ("com", "example.com"),
        "shop.co.uk": ("co.uk", "shop.co.uk"),
        "x.blogspot.com": ("blogspot.com", "x.blogspot.com"),
        "deep.sub.u.github.io": ("github.io", "u.github.io"),
        "co.uk": ("co.uk", None),
        "com": ("com", None),
        "x.w.ck": ("w.ck", "x.w.ck"),          # wildcard *.ck
        "w.ck": ("w.ck", None),                 # host IS the wildcard suffix
        "ck": ("ck", None),                     # bare wildcard base
        "www.ck": ("ck", "www.ck"),             # exception !www.ck
        "sub.www.ck": ("ck", "www.ck"),         # exception wins under subdomain
        "m.unlisted-tld": ("unlisted-tld", "m.unlisted-tld"),
        "bucket.s3.amazonaws.com": ("s3.amazonaws.com", "bucket.s3.amazonaws.com"),
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    out = {r.host: (r.public_suffix, r.registrable_domain)
           for r in registrable_domain(df).collect()}
    assert out == cases
    # pure column program: no exchange, no python stage
    plan = registrable_domain(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_leakage_safe_split_groups_domains(spark):
    from ocr_spark.operators.urls import leakage_safe_split

    hosts = [f"sub{i}.site{i % 7}.co.uk" for i in range(60)] + ["co.uk", "site0.co.uk"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    out = leakage_safe_split(df).collect()
    by_domain = {}
    for r in out:
        key = r.registrable_domain or r.public_suffix
        by_domain.setdefault(key, set()).add(r.split)
    # every registrable domain maps to exactly one split
    assert all(len(s) == 1 for s in by_domain.values())
    assert {r.split for r in out} <= {"train", "val", "test"}
    plan = leakage_safe_split(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_bitext_candidates(spark):
    from ocr_spark.operators.urls import bitext_candidates

    pages = spark.createDataFrame(
        [
            ("https://h.example/en/story", "en"),
            ("https://h.example/fr/story", "fr"),
            ("https://h.example/de/story", "de"),
            ("https://h.example/en/other", "en"),
            ("https://h.example/js/app", "xx"),     # 'js' not a lang segment
            ("https://h.example/plain", "en"),      # no lang segment
            ("https://h.example/pt", "pt"),         # segment at url end
            ("https://h.example/en", "en"),
        ],
        "url string, lang string",
    )
    out = {(r.lang_a, r.lang_b, r.pair_key) for r in bitext_candidates(pages).collect()}
    story_key = "https://h.example/*/story"
    end_key = "https://h.example/*"
    assert out == {
        ("de", "en", story_key),
        ("de", "fr", story_key),
        ("en", "fr", story_key),
        ("en", "pt", end_key),
    }


def test_bitext_no_self_pairs_or_dup_multiplication(spark):
    from ocr_spark.operators.urls import bitext_candidates

    pages = spark.createDataFrame(
        [
            ("https://h.example/en/story", "en"),
            ("https://h.example/en/story", "fr"),   # conflicting lang label
            ("https://h.example/fr/story", "fr"),
            ("https://h.example/fr/story", "fr"),   # duplicate row
        ],
        "url string, lang string",
    )
    out = bitext_candidates(pages).collect()
    # no url pairs with itself; duplicates don't multiply pairs
    assert all(r.url_a != r.url_b for r in out)
    pairs = {(r.url_a, r.lang_a, r.url_b, r.lang_b) for r in out}
    # only (en/story as 'en') x (fr/story as 'fr') survives: the
    # conflicting-label row shares either the url (self-pair) or the lang
    assert len(out) == len(pairs) == 1


def test_surt_keys_semantics(spark):
    """SURT contract: lowercase host, drop userinfo/:80/:443/www., reverse
    labels, keep path verbatim (default /), sort query k=v tokens, drop
    fragment and empty query."""
    from ocr_spark.operators.urls import surt_keys

    rows = [
        ("https://www.Example.COM/Path/X?b=2&a=1#frag",),
        ("http://user:pw@sub.site.org:80/",),
        ("https://plain.net",),
        ("https://one.two.three.example/p?z=9",),
    ]
    df = spark.createDataFrame(rows, "url string")
    got = {r.url: r.surt for r in surt_keys(df).collect()}
    assert got == {
        rows[0][0]: "com,example)/Path/X?a=1&b=2",
        rows[1][0]: "org,site,sub)/",
        rows[2][0]: "net,plain)/",
        rows[3][0]: "example,three,two,one)/p?z=9",
    }


# ---------------------------------------------------------------------------
# url_features (lexical spam signals)
# ---------------------------------------------------------------------------

def test_url_features_values(spark):
    from ocr_spark.operators.urls import url_features

    urls = spark.createDataFrame(
        [
            ("https://sub1.img-2x.example.com/a/b/c/9?x=1&y=2#f",),
            ("https://example.com/",),
            ("https://example.com",),  # no path at all
        ],
        "url string",
    )
    rows = {r.url: r for r in url_features(urls).collect()}
    r = rows["https://sub1.img-2x.example.com/a/b/c/9?x=1&y=2#f"]
    assert r.host_len == len("sub1.img-2x.example.com")
    assert r.subdomain_depth == 3 and r.host_hyphens == 1
    assert r.path_depth == 4 and r.n_params == 2
    assert r.digit_milli == 1000 * 5 // r.url_len
    assert rows["https://example.com/"].path_depth == 1
    assert rows["https://example.com"].path_depth == 0
    assert rows["https://example.com"].n_params == 0


def test_url_features_plan_zero_exchange_zero_python(spark):
    from ocr_spark.operators.urls import url_features

    df = url_features(spark.createDataFrame([("https://a.example/x",)], "url string"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_domain_prior_groups_by_etld1_and_broadcasts(spark):
    from pyspark.sql import functions as F

    from ocr_spark.operators.urls import domain_quality_prior

    rows = [
        (0, "www.a.co.uk", "clean text with several plain words here"),
        (1, "sub.a.co.uk", "numbers 11 22 33 44 55 66 77 88 99 00"),
        (2, "b.com", "short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    out = domain_quality_prior(df)
    got = {r.doc_id: r for r in out.collect()}
    # subdomains fold into ONE site
    assert got[0].domain == "a.co.uk" and got[1].domain == "a.co.uk"
    assert got[0].n_docs_domain == 2
    # doc 0: 0 digits -> 1000; doc 1: 37 chars, 9 spaces, 10 tokens ->
    # avg token len 2.8 passes the gate; 20 digits -> 1000-floor(20000/37)
    assert got[0].q_milli == 1000
    assert got[1].q_milli == 1000 - (1000 * 20) // 37
    assert got[0].prior_milli == (got[0].q_milli + got[1].q_milli) // 2
    assert got[0].delta_milli == got[0].q_milli - got[0].prior_milli
    # doc 2 fails the n_tokens gate -> 0
    assert got[2].q_milli == 0 and got[2].n_docs_domain == 1
    # the join back must be broadcast: pages never shuffle on domain
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_url_path_templates_trap_signature(spark):
    from pyspark.sql import functions as F

    from ocr_spark.operators.urls import url_path_templates

    rows = (
        [(f"https://trap.example/cal/20{i%30:02d}/{i%12}/{i}?x=1",) for i in range(60)]
        + [(f"https://trap.example/tag/{i%3}",) for i in range(60)]
        + [("https://trap.example/about",)] * 5
        + [(f"https://shop.example/p/{i:08x}",) for i in range(4)]
    )
    got = {
        (r["host"], r["template"]): (r["n_urls"], r["n_paths"])
        for r in url_path_templates(
            spark.createDataFrame(rows, "url string")
        ).collect()
    }
    # trap: every concrete path distinct under one template
    assert got[("trap.example", "/cal/{d}/{d}/{d}")] == (60, 60)
    # facet: many urls, few paths
    assert got[("trap.example", "/tag/{d}")] == (60, 3)
    assert got[("trap.example", "/about")] == (5, 1)
    # 8-hex ids collapse to {h}
    assert got[("shop.example", "/p/{h}")] == (4, 4)


def test_query_param_stats_finds_session_param(spark):
    from ocr_spark.operators.urls import query_param_stats

    rows = [
        (f"https://a.example/x?sess=s{i}&page={i % 3}&flag",) for i in range(30)
    ]
    got = {
        (r["host"], r["param"]): (r["n"], r["n_values"], r["ratio_milli"])
        for r in query_param_stats(
            spark.createDataFrame(rows, "url string")
        ).collect()
    }
    assert got[("a.example", "sess")] == (30, 30, 1000)  # strip candidate
    assert got[("a.example", "page")] == (30, 3, 100)  # real facet
    assert got[("a.example", "flag")] == (30, 1, 33)  # valueless param


def test_url_template_ops_zero_python(spark):
    from ocr_spark.operators.urls import query_param_stats, url_path_templates

    df = spark.createDataFrame([("https://a.example/p/1?x=2",)], "url string")
    for op in (url_path_templates, query_param_stats):
        plan = op(df)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "BatchEvalPython" not in plan
