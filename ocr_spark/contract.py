"""Driver contract: queries() + oracle_sql() + entry() (__spark_entry__.py).

One entry per implemented operator family from SURVEY.md §2 plus the
training-data-pipeline operators (dedup / similarity / text analysis).
Every SQL-expressible query has a DuckDB oracle with IDENTICAL column names
and explicitly-matched numeric semantics:

- double sums go through decimal(18,2) so both engines sum exactly;
- floor()/round() are explicit (Spark int-cast truncates, DuckDB rounds);
- float arrays are cast to double before cosine;
- every computed column is aliased the same on both sides.

Non-SQL-expressible ops (extraction pipeline, minhash/simhash with
xxhash64, grouped numpy kernels, multimodal stubs) are rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .operators import dedup as dedup_ops
from .operators import similarity as sim_ops
from .operators import text_analysis as ta
from .operators.boxes_ops import (
    combine_boxes_grouped,
    nms_grouped,
    reading_order_grouped,
)
from .operators.extract import extract_pages
from .operators.multimodal import blob_metadata
from .operators.recognize import ctc_roundtrip
from .sources.pages import pages_df


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# SQL-checkable queries (operator -> SURVEY.md §2 id in the comment)
# --------------------------------------------------------------------------

def q_size_filter(spark, sf):  # P3 SizeFilter analog: range predicates
    li = _t(spark, sf, "lineitem")
    return li.where(
        (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20) & (F.col("l_discount") >= 0.02)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


def q_region_filter(spark, sf):  # P4 RegionFilter analog: center-in-region
    p = _t(spark, sf, "part")
    return p.where(
        (F.col("p_size") >= 15) & (F.col("p_size") <= 35)
        & (F.col("p_retailprice") >= 920) & (F.col("p_retailprice") <= 980)
    ).select("p_partkey", "p_name", "p_size", "p_retailprice")


def q_union_agg(spark, sf):  # A1 compute_union: min/max per group
    o = _t(spark, sf, "orders")
    return o.groupBy("o_custkey").agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )


def q_median_threshold(spark, sf):  # A4 adaptive median threshold (exact)
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


def q_window_topk(spark, sf):  # T1/T2 score-sort + top-k per group
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    )


def q_anti_join(spark, sf):  # J4 predicted-cache resume anti-join
    # customers with no event activity — the "pending work" shape of the
    # lineage resume join (pages ⟕anti lineage on url)
    c = _t(spark, sf, "customer")
    ev = _t(spark, sf, "events")
    return c.join(
        ev.select(F.col("user_id").alias("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey", "c_name")


def q_order_weight(spark, sf):  # W10 order-weight window sort
    e = _t(spark, sf, "events")
    weight = (
        F.when(F.col("event_type") == "error", 0)
        .when(F.col("event_type") == "click", 1)
        .otherwise(2)
    )
    w = Window.partitionBy("user_id").orderBy(weight, F.asc("event_id"))
    return (
        e.withColumn("weight", weight)
        .withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= 5)
        .select("user_id", "event_id", "weight", "pos")
    )


def q_sessionize(spark, sf):  # training-pipeline: gap-based sessionization
    """Classic lag + gap-flag + cumulative-sum window chain: a new session
    starts after > 30 min of inactivity per user. At scale this is one
    shuffle on user_id reused by all three window functions (same
    partitioning), then a plain aggregation."""
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = F.unix_timestamp("ts")  # whole seconds == DuckDB date_diff(second)
    gap = ts_s - F.lag(ts_s).over(w)
    sess = (
        e.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .withColumn("session_id", F.sum("new_sess").over(w))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias("sum_value"),
        )
    )


def q_clean_text(spark, sf):  # F4 cleaners: collapse/lower/trim
    from .functions.text_functions import clean_text_expr

    d = _t(spark, sf, "documents")
    cleaned = clean_text_expr("text")
    return d.select(
        "doc_id", cleaned.alias("cleaned"), F.length(cleaned).alias("n_chars_clean")
    )


def q_levenshtein(spark, sf):  # F1 normalized edit distance (builtin case)
    c = _t(spark, sf, "customer")
    target = "Customer#000000042"
    lev = F.levenshtein(F.col("c_name"), F.lit(target))
    return c.select(
        "c_custkey",
        lev.cast("int").alias("lev"),
        F.round(lev / F.lit(len(target)), 6).alias("lev_norm"),
    )


def q_group_concat(spark, sf):  # A5 ordered group concat
    d = _t(spark, sf, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list("doc_id")), lambda x: x.cast("string")),
            ",",
        ).alias("doc_ids"),
    )


def q_dedup_exact(spark, sf):  # dedup: exact (hash-groupBy)
    return dedup_ops.exact_duplicates(_t(spark, sf, "documents"))


def q_line_dedup(spark, sf):  # CCNet/RefinedWeb cross-doc line boilerplate
    """Documents enriched with deterministic boilerplate lines (a nav line
    on every doc, one of two share/footer lines by parity) -> lines whose
    normalized form spans >= 3 docs are dropped everywhere, text
    reassembled in order."""
    d = _t(spark, sf, "documents")
    shared = F.when(
        F.col("doc_id") % 2 == 0, F.lit("Share this page on social media")
    ).otherwise(F.lit("Copyright Example Site. All rights reserved."))
    enriched = d.select(
        "doc_id",
        F.concat_ws(
            "\n", F.lit("Home | About | Contact"), F.col("text"), shared
        ).alias("text"),
    )
    return dedup_ops.line_boilerplate_dedup(enriched, min_df=3)


def q_host_templates(spark, sf):  # SITE-scoped template/boilerplate removal
    """7 synthetic hosts; every page of a host gets that host's nav line,
    ~2/3 of its pages (doc_id % 3 != 0 -> 66% >= the 60% threshold) get
    its footer. Both must strip per-host while each page's own body
    survives; the oracle replays the df/n_pages integer threshold."""
    d = _t(spark, sf, "documents")
    m = (F.col("doc_id") % 7).cast("string")
    nav = F.concat(F.lit("site "), m, F.lit(" home products about contact"))
    footer = F.when(
        F.col("doc_id") % 3 != 0, F.concat(F.lit("\ncopyright site "), m)
    ).otherwise(F.lit(""))
    enriched = d.select(
        "doc_id",
        F.concat(F.lit("site"), m, F.lit(".example")).alias("host"),
        F.concat(nav, F.lit("\n"), F.col("text"), footer).alias("text"),
    )
    return dedup_ops.host_template_strip(enriched, pct=60, min_df=3)


def q_fingerprint(spark, sf):  # fingerprinting (md5 of normalized text)
    return ta.fingerprint(_t(spark, sf, "documents"))


def q_token_count(spark, sf):  # token counting
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        ta.token_count(F.col("text")).cast("int").alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )


def q_quality(spark, sf):  # quality scoring
    return ta.quality_features(_t(spark, sf, "documents"))


def q_langid(spark, sf):  # language-ID heuristic
    return ta.langid(_t(spark, sf, "documents"))


def q_repetition(spark, sf):  # Gopher-style within-doc repetition signals
    return ta.repetition_signals(_t(spark, sf, "documents"))


def q_url_canon(spark, sf):  # crawl URL canonicalization + dedup key
    """Deterministically messied URLs (case/ports/tracking params/fragments
    per doc_id residue) -> canonical form + exact dup-group count."""
    from .operators.urls import canonicalize_urls

    d = _t(spark, sf, "documents").select("doc_id")
    messy = d.select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 4 == 0, F.lit("HTTPS://Example.COM:443"))
            .when(F.col("doc_id") % 4 == 1, F.lit("https://example.com"))
            .when(F.col("doc_id") % 4 == 2, F.lit("http://Example.com:80"))
            .otherwise(F.lit("http://example.com")),
            F.lit("/p/"),
            (F.col("doc_id") % 100).cast("string"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=feed&b=2&a=1"))
            .when(F.col("doc_id") % 3 == 1, F.lit("?a=1&b=2&fbclid=xyz"))
            .otherwise(F.lit("?b=2&a=1#section")),
        ).alias("url"),
    )
    canon = canonicalize_urls(messy)
    w = Window.partitionBy("canonical_url")
    return canon.select(
        "doc_id",
        "url",
        "canonical_url",
        F.count(F.lit(1)).over(w).cast("long").alias("n_same_canonical"),
    )


def q_url_features(spark, sf):  # lexical URL spam features (pure Column)
    """Synthetic urls with host/path/query/fragment variants; Spark
    derives the integer features with regexp_count Column algebra, the
    oracle re-derives each count with DuckDB's independent regex engine
    (length-delta form) over the identically constructed strings."""
    from .operators.urls import url_features

    d = _t(spark, sf, "documents").select("doc_id")
    k = F.col("doc_id")
    ks = k.cast("string")
    host = F.when(
        k % 3 == 0,
        F.concat(F.lit("sub"), ks, F.lit(".img-"), ks, F.lit(".example.com")),
    ).otherwise(F.lit("example.com"))
    path = F.when(k % 2 == 0, F.concat(F.lit("/a/b/c/"), ks)).otherwise(
        F.concat(F.lit("/p"), ks)
    )
    query = (
        F.when(k % 4 == 0, F.lit("?x=1&y=2&z=3"))
        .when(k % 4 == 1, F.lit("?q="))
        .otherwise(F.lit(""))
    )
    frag = F.when(k % 5 == 0, F.lit("#frag-9")).otherwise(F.lit(""))
    urls = d.select(
        "doc_id",
        F.concat(F.lit("https://"), host, path, query, frag).alias("url"),
    )
    return url_features(urls)


def q_soft404(spark, sf):  # soft-404 detection (200-status error shells)
    """Deterministic (status, title, text) case table: hard 404s must NOT
    flag (status gate), '404' titles flag, short error bodies flag, a
    LONG article that merely mentions '404 error' must NOT flag. The
    oracle states the closed-form truth table."""
    from .operators.corpus_filters import soft404_flags

    d = _t(spark, sf, "documents").select("doc_id")
    k = F.col("doc_id")
    ks = k.cast("string")
    pages = d.select(
        "doc_id",
        F.concat(F.lit("https://h.example/p/"), ks).alias("url"),
        F.when(k % 5 == 0, F.lit(404)).otherwise(F.lit(200)).alias("status"),
        F.when(k % 3 == 0, F.lit("404 Not Found — example"))
        .when(k % 3 == 1, F.lit("Article about cats"))
        .alias("title"),
        F.when(k % 4 == 0, F.lit("The page you requested was not found."))
        .when(
            k % 4 == 1,
            F.concat(
                F.lit("Long article mentioning a 404 error once. "),
                F.repeat(F.lit("lorem ipsum dolor sit amet "), 10),
            ),
        )
        .when(k % 4 == 2, F.lit("Normal short note."))
        .alias("text"),
    )
    return soft404_flags(pages)


def q_bpe_tokens(spark, sf):  # F11: distributed-count BPE train + encode
    from .operators.tokenize import bpe_encode_table, train_bpe_merges

    docs = _t(spark, sf, "documents")
    ranks = train_bpe_merges(docs, n_merges=120, top_k_words=8000)
    return bpe_encode_table(docs, ranks)


def q_c4_clean(spark, sf):  # C4-style line/page cleaning (Raffel et al. 2020)
    """Deterministically messied pages (6 synthesized lines per doc: good
    sentences, an unterminated line, a javascript notice, and residue-gated
    short / brace / lorem-ipsum lines) -> C4 line+page filters."""
    from .operators.corpus_filters import c4_line_clean

    d = _t(spark, sf, "documents")
    t = F.col("text")
    k = F.col("doc_id")
    l1 = F.concat(F.substring(t, 1, 60), F.lit("."))
    l2 = F.substring(t, 61, 40)
    l3 = F.concat(
        F.lit("please enable javascript to view "), F.substring(t, 1, 12), F.lit(".")
    )
    l4 = F.when(k % 5 == 0, F.lit("too short.")).otherwise(
        F.concat(F.substring(t, 101, 50), F.lit("!"))
    )
    l5 = F.when(k % 7 == 0, F.lit("uses { braces } badly.")).otherwise(
        F.concat(F.substring(t, 151, 45), F.lit("?"))
    )
    l6 = F.when(k % 11 == 0, F.lit("standard lorem ipsum filler text.")).otherwise(
        F.concat(F.substring(t, 201, 30), F.lit("."))
    )
    messy = d.select("doc_id", F.concat_ws("\n", l1, l2, l3, l4, l5, l6).alias("text"))
    return c4_line_clean(messy)


def q_pii_redact(spark, sf):  # PII regex redaction with per-class counts
    from .operators.corpus_filters import pii_redact

    d = _t(spark, sf, "documents")
    k = F.col("doc_id")
    tail = (
        F.when(
            k % 3 == 0,
            F.concat(
                F.lit(" contact user"), (k % 50).cast("string"),
                F.lit("@mail"), (k % 5).cast("string"), F.lit(".org now"),
            ),
        )
        .when(
            k % 3 == 1,
            F.concat(
                F.lit(" call 415-555-"), F.lpad((k % 10000).cast("string"), 4, "0"),
                F.lit(" or visit 192.168."), (k % 256).cast("string"),
                F.lit("."), (k % 100).cast("string"),
            ),
        )
        .otherwise(F.lit(" no pii in this one"))
    )
    messy = d.select("doc_id", F.concat(F.substring(F.col("text"), 1, 80), tail).alias("text"))
    return pii_redact(messy).select(
        "doc_id", "n_emails", "n_phones", "n_ips", "redacted_text"
    )


def q_ngram_spans(spark, sf):  # Lee et al. cross-doc duplicated n-grams
    from .operators.corpus_filters import dup_ngram_spans

    d = _t(spark, sf, "documents")
    boiler = F.when(
        F.col("doc_id") % 3 == 0,
        F.lit(" subscribe to our newsletter for daily updates today"),
    ).otherwise(F.lit(""))
    messy = d.select(
        "doc_id", F.concat(F.substring(F.col("text"), 1, 200), boiler).alias("text")
    )
    return dup_ngram_spans(messy, n=5)


def q_hash_embed(spark, sf):  # hashing-trick signed bag-of-words embedding
    from .operators.corpus_filters import hash_embedding

    d = _t(spark, sf, "documents")
    return hash_embedding(
        d.select("doc_id", F.substring(F.col("text"), 1, 300).alias("text")), dim=16
    )


def q_bigram_lm(spark, sf):  # char-bigram LM plausibility score
    from .operators.corpus_filters import bigram_lm_score

    d = _t(spark, sf, "documents")
    return bigram_lm_score(
        d.select("doc_id", F.substring(F.col("text"), 1, 300).alias("text"))
    )


def q_ngram_lm(spark, sf):  # corpus-trained stupid-backoff bigram LM score
    """Train pruned unigram/bigram tables on the doc_id%7==0 slice (the
    'high-quality target' stand-in), score EVERY doc with the Brants et
    al. 2007 stupid-backoff estimator in integer milli-log units."""
    from .operators.lm import ngram_lm_counts, stupid_backoff_score

    d = _t(spark, sf, "documents").select(
        "doc_id", F.substring(F.col("text"), 1, 300).alias("text")
    )
    train = d.filter(F.col("doc_id") % 7 == 0)
    uni, bi, n = ngram_lm_counts(train, min_count=2)
    return stupid_backoff_score(d, uni, bi, n)


def q_kn_lm(spark, sf):  # corpus-trained interpolated Kneser-Ney bigram LM
    """Same train slice and pruned bigram table as ngram_lm, scored with
    interpolated Kneser-Ney (the KenLM/CCNet smoothing) instead of stupid
    backoff — continuation counts and totals all derive from the one
    pruned table, so the oracle re-derives the whole model."""
    from .operators.lm import kneser_ney_score, ngram_lm_counts

    d = _t(spark, sf, "documents").select(
        "doc_id", F.substring(F.col("text"), 1, 300).alias("text")
    )
    train = d.filter(F.col("doc_id") % 7 == 0)
    _, bi, _ = ngram_lm_counts(train, min_count=2)
    return kneser_ney_score(d, bi)


def q_jaccard_cjk(spark, sf):  # char-shingle near-dup over unsegmented text
    """Whitespace-free Han documents (groups of 10 share a 40-char base
    drawn from a 10-glyph alphabet; each doc appends a short per-doc
    tail) are near-dup-paired with CHARACTER 6-grams — word shingles see
    one 'token' per doc here and find nothing. Same exact prefix-filter
    machinery, unit='char'; the oracle runs naive all-pairs over the
    same substring grams."""
    d = _t(spark, sf, "documents").select("doc_id").where(F.col("doc_id") < 100)
    alph = "日月火水木金土山川田"
    # pseudo-random per-GROUP glyph sequence (a cyclic index would make
    # every group's gram set identical — all pairs would match)
    base = F.expr(
        "array_join(transform(sequence(1, 40), i -> "
        f"substring('{alph}', CAST(((doc_id div 10) * 31 + i * 17) % 97 % 10 AS INT) + 1, 1)), '')"
    )
    tail = F.expr(
        f"repeat(substring('{alph}', CAST(doc_id % 10 AS INT) + 1, 1), "
        "CAST(doc_id % 4 AS INT))"
    )
    docs = d.select("doc_id", F.concat(base, tail).alias("text"))
    return dedup_ops.ngram_jaccard_pairs(
        docs, threshold=0.5, shingle=6, unit="char"
    )


def q_script_mix(spark, sf):  # Unicode-script histogram + dominant script
    """Docs are salted with repeated Cyrillic/Han/Greek/Arabic snippets by
    residue so every script bucket and the tiebreak both occur; counts
    come from one regexp_count per explicit codepoint range (identical
    class in Java regex and RE2), dominant from a struct-greatest argmax
    the oracle replays."""
    from .operators.text_analysis import script_mix

    d = _t(spark, sf, "documents")
    k = F.col("doc_id")
    salted = F.concat(
        F.substring(F.col("text"), 1, 120),
        F.when(
            k % 4 == 1, F.expr("repeat(' привет мир', CAST(doc_id % 40 AS INT) + 1)")
        )
        .when(k % 4 == 2, F.expr("repeat(' 你好世界', CAST(doc_id % 20 AS INT) + 1)"))
        .when(
            k % 4 == 3,
            F.expr("repeat(' γειά σου', CAST(doc_id % 7 AS INT) + 1)"),
        )
        .otherwise(
            F.when(k % 8 == 0, F.expr("repeat(' مرحبا', CAST(doc_id % 9 AS INT) + 1)"))
            .otherwise(F.lit(""))
        ),
    )
    return script_mix(d.select("doc_id", salted.alias("text")))


def q_nb_classifier(spark, sf):  # trained Naive Bayes quality filter
    """Multinomial NB trained ON-CLUSTER against the doc_id%7==0 'target
    domain' slice (the CCNet looks-like-Wikipedia shape), scoring every
    doc with Laplace-smoothed milli-log-odds. The oracle re-derives the
    class counts, the quantized per-word weights, the OOV/prior
    constants, and every doc score."""
    from .operators.lm import nb_train_score

    d = _t(spark, sf, "documents").select(
        "doc_id", F.substring(F.col("text"), 1, 300).alias("text")
    )
    return nb_train_score(d, F.col("doc_id") % 7 == 0)


def q_dup_spans(spark, sf):  # Lee et al. duplicated-span REMOVAL
    """Same messy input as ngram_spans; removes every token covered by a
    cross-doc duplicated 5-gram and returns the rebuilt text per doc."""
    from .operators.corpus_filters import dup_span_removal

    d = _t(spark, sf, "documents")
    boiler = F.when(
        F.col("doc_id") % 3 == 0,
        F.lit(" subscribe to our newsletter for daily updates today"),
    ).otherwise(F.lit(""))
    messy = d.select(
        "doc_id", F.concat(F.substring(F.col("text"), 1, 200), boiler).alias("text")
    )
    return dup_span_removal(messy, n=5)


def _sa_docs(spark, sf):
    """Shared input for the suffix-array queries: 400 docs clamped to a
    '#'-free alphabet, every 3rd doc carrying a boilerplate sentence (so
    cross-doc duplicated substrings exist by construction), each closed
    by the unique terminator '#doc_id#' that makes all suffixes
    distinct."""
    d = _t(spark, sf, "documents").where(F.col("doc_id") < 400)
    boiler = F.when(
        F.col("doc_id") % 3 == 0,
        F.lit(" free shipping on orders over fifty dollars today"),
    ).otherwise(F.lit(""))
    s = F.concat(
        F.regexp_replace(F.lower(F.substring(F.col("text"), 1, 240)), "[^a-z ]", ""),
        boiler,
        F.lit("#"),
        F.col("doc_id").cast("string"),
        F.lit("#"),
    )
    return d.select("doc_id", s.alias("s"))


def q_suffix_rank(spark, sf):  # distributed suffix array (prefix doubling)
    """Manber–Myers prefix doubling on Spark: O(log maxlen) rounds, each
    one (doc, pos+k) equi-join plus one two-pass global dense rank —
    suffix STRINGS are never materialized, only (doc, pos, rank) ints.
    The oracle sorts the actual suffix substrings; DENSE ranks must
    agree position-for-position (the only ties are sub-5-char
    terminator-tail suffixes shared across docs)."""
    from .operators.suffix import suffix_array

    sa = suffix_array(_sa_docs(spark, sf), id_col="doc_id", text_col="s")
    return sa.select(
        "doc_id", F.col("pos").cast("long").alias("pos"), F.col("rnk").alias("rnk")
    )


def q_sa_dups(spark, sf):  # exact duplicated substrings via SA adjacency
    """Lee et al. 2021 read-out: suffixes adjacent in suffix-array order
    that share an exact 25-char prefix = every duplicated >=25-char
    substring occurrence, found with zero all-pairs work. The oracle
    re-derives the SA by sorting suffix strings and replays the
    adjacency + prefix check."""
    from .operators.suffix import adjacent_dup_grams, suffix_array

    docs = _sa_docs(spark, sf)
    sa = suffix_array(docs, id_col="doc_id", text_col="s")
    return adjacent_dup_grams(
        docs, sa, gram_len=25, id_col="doc_id", text_col="s"
    ).select(
        "doc_a",
        F.col("pos_a").cast("long").alias("pos_a"),
        "doc_b",
        F.col("pos_b").cast("long").alias("pos_b"),
        "gram",
        "cross_doc",
    )


def q_decontaminate(spark, sf):  # benchmark n-gram decontamination
    """Benchmark passages are synthesized from every 97th doc's chars
    21..140; docs sharing any word 8-gram with a passage are flagged.
    The tiny benchmark-gram side is broadcast (plan-asserted)."""
    from .operators.corpus_filters import decontaminate

    d = _t(spark, sf, "documents")
    bench = d.where(F.col("doc_id") % 97 == 0).select(
        F.substring(F.col("text"), 21, 120).alias("passage")
    )
    return decontaminate(d, bench, n=8)


def q_compression_ratio(spark, sf):  # zlib too-compressible quality gate
    """Natural documents text vs a synthetic repetitive tail (every 7th
    doc gets 'spam spam ...' appended): the repetitive docs must flag.
    zlib is not expressible in SQL -> committed fixture oracle from this
    same kernel."""
    from .operators.corpus_filters import compression_ratio

    d = _t(spark, sf, "documents")
    k = F.col("doc_id")
    body = F.when(
        k % 7 == 0, F.concat(F.lit(""), F.repeat(F.lit("spam click here "), 40))
    ).otherwise(F.substring(F.col("text"), 1, 400))
    return compression_ratio(d.select("doc_id", body.alias("text")))


def q_stratified_sample(spark, sf):  # deterministic per-language sampling
    from .operators.corpus_filters import stratified_sample

    return stratified_sample(_t(spark, sf, "documents"), frac=0.25, strata_col="lang")


def _snapshots(spark, sf) -> DataFrame:
    """Multi-snapshot crawl table synthesized from documents: 1-3 captures
    per url (doc_id % 3 + 1), alternating content fingerprints."""
    d = _t(spark, sf, "documents")
    k = F.col("doc_id")
    v = F.explode(F.sequence(F.lit(0), (k % 3).cast("int"))).alias("v")
    s = d.select("doc_id", "text", v)
    return s.select(
        F.concat(
            F.lit("https://host"), (k % 50).cast("string"),
            F.lit(".example/p/"), k.cast("string"),
        ).alias("url"),
        (F.lit(1700000000) + F.col("v") * 86400 + k % 1000)
        .cast("long")
        .alias("warc_epoch"),
        F.md5(
            F.concat(
                F.substring(F.col("text"), 1, 50),
                F.when((k + F.col("v")) % 2 == 0, F.lit(" rev")).otherwise(F.lit("")),
            )
        ).alias("fingerprint"),
    )


def q_url_latest(spark, sf):  # cross-crawl dedup: newest snapshot per url
    from .operators.crawl_history import latest_snapshot

    return latest_snapshot(_snapshots(spark, sf))


def q_url_changes(spark, sf):  # per-url crawl timeline / change detection
    from .operators.crawl_history import snapshot_changes

    return snapshot_changes(_snapshots(spark, sf))


def q_refresh_schedule(spark, sf):  # adaptive re-crawl scheduling
    """Integer next-fetch estimates on the same synthetic crawl timeline
    as url_changes; the oracle extends its own window SQL with the
    clamp/div arithmetic."""
    from .operators.crawl_history import refresh_schedule

    return refresh_schedule(_snapshots(spark, sf))


def q_revisit(spark, sf):  # WARC response/revisit record classification
    """Over the shared crawl timeline: a capture whose fingerprint was
    already stored for the url becomes a 'revisit' pointing at the
    original epoch (the WARC 1.1 §6.7.2 storage-dedup convention). The
    3-capture urls alternate fingerprints, so capture v2 revisits v0 —
    the oracle re-derives the min-epoch window in SQL."""
    from .operators.crawl_history import revisit_records

    return revisit_records(_snapshots(spark, sf))


def q_redirects(spark, sf):  # redirect-chain resolution (pointer doubling)
    """Synthetic redirect graph over the documents urls: doc i redirects
    to doc i-1 unless i % 13 == 0 (the terminals), so chains run 0..12
    hops and the 9..12 tail exercises the max_hops=8 cap (resolved=false).
    The oracle walks the SAME chains with a recursive CTE capped at 8
    steps — unit-step semantics, which pointer doubling must reproduce
    exactly."""
    from .operators.crawl_edge import resolve_redirects

    d = _t(spark, sf, "documents")
    k = F.col("doc_id")

    def _url(i):
        return F.concat(
            F.lit("https://host"), (i % 50).cast("string"),
            F.lit(".example/p/"), i.cast("string"),
        )

    edges = d.select(
        _url(k).alias("url"),
        F.when(k % 13 != 0, _url(k - 1)).alias("redirect_to"),
    )
    return resolve_redirects(edges, max_hops=8)


def q_mirror_hosts(spark, sf):  # cross-host content-mirror detection
    """Synthetic mirror corpus: each doc appears on 1-3 hosts
    (m{(doc_id + v*17) % 40}) under one content fingerprint; docs with
    doc_id % 11 == 0 share a single boilerplate fingerprint spread over
    many hosts, which must be dropped by the max_hosts_per_fp cap rather
    than explode into quadratic pairs."""
    from .operators.crawl_history import mirror_hosts

    d = _t(spark, sf, "documents")
    k = F.col("doc_id")
    v = F.explode(F.sequence(F.lit(0), (k % 3).cast("int"))).alias("v")
    s = d.select("doc_id", "text", v)
    snaps = s.select(
        F.concat(
            F.lit("m"), ((F.col("doc_id") + F.col("v") * 17) % 40).cast("string")
        ).alias("host"),
        F.when(F.col("doc_id") % 11 == 0, F.lit("BOILER"))
        .otherwise(F.md5(F.substring("text", 1, 40)))
        .alias("fingerprint"),
    )
    return mirror_hosts(snaps, min_shared=2, max_hosts_per_fp=8)


def q_page_meta(spark, sf):  # head metadata: title/canonical/desc/lang/hreflang
    """HTML heads constructed per doc_id with known fields (missing
    title/canonical/description/lang cases, relative canonical hrefs,
    hreflang alternates); the parser must recover EXACTLY the closed-form
    case table the oracle states directly."""
    from .operators.page_meta import extract_page_meta

    d = _t(spark, sf, "documents")
    k = F.col("doc_id")
    ks = k.cast("string")
    host = F.concat(F.lit("https://host"), (k % 50).cast("string"), F.lit(".example"))
    url = F.concat(host, F.lit("/p/"), ks)
    html = F.concat(
        F.lit("<!DOCTYPE html><html"),
        F.when(k % 7 != 0, F.lit(' lang="en-GB"')).otherwise(F.lit("")),
        F.lit("><head>"),
        F.when(
            k % 4 != 0,
            F.concat(F.lit("<title>Doc "), ks, F.lit(" — news</title>")),
        ).otherwise(F.lit("")),
        F.when(
            k % 3 != 0,
            F.concat(
                F.lit('<link rel="canonical" href="'),
                F.when(k % 5 == 0, F.concat(F.lit("/canon/"), ks)).otherwise(
                    F.concat(F.lit("https://canon.example/c/"), ks)
                ),
                F.lit('">'),
            ),
        ).otherwise(F.lit("")),
        F.when(
            k % 2 == 0,
            F.concat(F.lit('<meta name="description" content="Summary '), ks, F.lit('">')),
        ).otherwise(F.lit("")),
        F.when(
            k % 6 == 0,
            F.concat(
                F.lit('<link rel="alternate" hreflang="fr" href="https://fr.example/p/'),
                ks,
                F.lit('"><link rel="alternate" hreflang="de" href="https://de.example/p/'),
                ks,
                F.lit('">'),
            ),
        ).otherwise(F.lit("")),
        F.lit("</head><body><p>x</p></body></html>"),
    )
    pages = d.select(url.alias("url"), html.cast("binary").alias("html"))
    return extract_page_meta(pages)


def q_http_headers(spark, sf):  # WARC response-header parse + revalidation plan
    """Raw HTTP/1.1 header blocks constructed per doc_id (status
    variants, redirect Location, quoted/weak ETags, RFC 822
    Last-Modified, Cache-Control max-age/no-store, header-name case
    variation, a body line past the blank separator that must NOT be
    read) are PARSED by operators/http_headers.py; the oracle states the
    closed-form case table, re-deriving epochs via make_timestamp."""
    from .operators.http_headers import http_header_fields

    d = _t(spark, sf, "documents")
    k = F.col("doc_id")
    ks = k.cast("string")
    url = F.concat(F.lit("https://host"), (k % 50).cast("string"),
                   F.lit(".example/p/"), ks)
    status = F.when(k % 10 == 7, F.lit("301 Moved Permanently")).when(
        k % 10 == 9, F.lit("404 Not Found")
    ).otherwise(F.lit("200 OK"))
    raw = F.concat(
        F.lit("HTTP/1.1 "), status, F.lit("\r\n"),
        F.when(k % 2 == 0,
               F.lit("Content-Type: text/html; charset=UTF-8\r\n"))
        .otherwise(F.lit("content-type: application/pdf\r\n")),
        F.when((k % 3 != 0) & (k % 9 == 1),
               F.concat(F.lit('ETag: W/"v'), ks, F.lit('"\r\n')))
        .when(k % 3 != 0,
              F.concat(F.lit('etag: "v'), ks, F.lit('"\r\n')))
        .otherwise(F.lit("")),
        F.when(
            k % 4 != 1,
            F.concat(
                F.lit("Last-Modified: Mon, "),
                ((k % 27) + 1).cast("string"),
                F.lit(" Jun 2026 "),
                ((k % 14) + 10).cast("string"),
                F.lit(":15:30 GMT\r\n"),
            ),
        ).otherwise(F.lit("")),
        F.when(k % 5 == 0, F.lit("Cache-Control: public, max-age=3600\r\n"))
        .when(k % 5 == 1, F.lit("CACHE-CONTROL: no-store\r\n"))
        .otherwise(F.lit("")),
        F.when(k % 10 == 7,
               F.concat(F.lit("Location: https://moved.example/p/"), ks,
                        F.lit("\r\n")))
        .otherwise(F.lit("")),
        F.lit("\r\nETag: \"body-noise-must-not-parse\"\r\n"),
    )
    resp = d.select(url.alias("url"), raw.cast("binary").alias("http_headers"))
    return http_header_fields(resp)


def q_og_meta(spark, sf):  # OpenGraph + JSON-LD structured metadata
    """Heads constructed per doc_id exercise attribute-order variants,
    single/double quoting, a duplicate og:title (FIRST wins), a
    malformed JSON-LD block (skipped, not counted), and an @graph
    wrapper (first node's @type); the oracle states the closed-form
    case table directly."""
    from .operators.page_meta import extract_og_meta

    d = _t(spark, sf, "documents")
    k = F.col("doc_id")
    ks = k.cast("string")
    host = F.concat(F.lit("https://host"), (k % 50).cast("string"), F.lit(".example"))
    url = F.concat(host, F.lit("/p/"), ks)
    html = F.concat(
        F.lit("<!DOCTYPE html><html><head>"),
        # og:title — attr order flips by parity; duplicate on k%6==0 loses
        F.when(
            (k % 3 != 0) & (k % 2 == 0),
            F.concat(F.lit('<meta property="og:title" content="OG Doc '), ks, F.lit('">')),
        )
        .when(
            (k % 3 != 0) & (k % 2 == 1),
            F.concat(F.lit("<meta content='OG Doc "), ks, F.lit("' property='og:title'>")),
        )
        .otherwise(F.lit("")),
        F.when(
            k % 6 == 0,
            F.lit('<meta property="og:title" content="WRONG duplicate">'),
        ).otherwise(F.lit("")),
        F.when(k % 2 == 0, F.lit('<meta property="og:type" content="article">')).otherwise(
            F.lit("")
        ),
        F.when(
            k % 4 != 0,
            F.concat(F.lit('<meta property="og:url" content="'), host, F.lit("/og/"), ks, F.lit('">')),
        ).otherwise(F.lit("")),
        F.when(
            k % 5 == 0,
            F.concat(F.lit('<meta property="og:image" content="https://img.example/'), ks, F.lit('.jpg">')),
        ).otherwise(F.lit("")),
        # JSON-LD: even docs a NewsArticle object (+ one malformed block on
        # k%8==0 that must be skipped); k%4==1 an @graph wrapper
        F.when(
            k % 2 == 0,
            F.concat(
                F.lit('<script type="application/ld+json">{"@context":'
                      '"https://schema.org","@type":"NewsArticle","headline":"H'),
                ks,
                F.lit('"}</script>'),
            ),
        ).otherwise(F.lit("")),
        F.when(
            k % 8 == 0,
            F.lit('<script type="application/ld+json">{"@type": broken</script>'),
        ).otherwise(F.lit("")),
        F.when(
            k % 4 == 1,
            F.lit('<script type="application/ld+json">{"@graph":[{"@type":'
                  '"WebSite"},{"@type":"Organization"}]}</script>'),
        ).otherwise(F.lit("")),
        F.lit("</head><body><p>x</p></body></html>"),
    )
    pages = d.select(url.alias("url"), html.cast("binary").alias("html"))
    return extract_og_meta(pages)


def q_pagination_chains(spark, sf):  # multi-page article stitching
    """Pages carry rel=next links forming chains of 4 consecutive doc_ids
    (block k//4; <link> head tag on even ids, body <a rel> anchor on odd —
    both forms must parse); extract_pagination recovers the edges and
    resolve_redirects assembles each chain by pointer doubling. The
    oracle computes the block arithmetic directly: series key is the
    block terminal, pos_from_end = 3 - k%4."""
    from .operators.crawl_edge import resolve_redirects
    from .operators.page_meta import extract_pagination

    d = _t(spark, sf, "documents")
    k = F.col("doc_id")

    def _url(i):
        return F.concat(
            F.lit("https://host"), (i % 50).cast("string"),
            F.lit(".example/p/"), i.cast("string"),
        )

    nxt = F.concat(F.lit('href="'), _url(k + 1), F.lit('"'))
    html = F.concat(
        F.lit("<!DOCTYPE html><html><head>"),
        F.when(
            (k % 4 != 3) & (k % 2 == 0),
            F.concat(F.lit('<link rel="next" '), nxt, F.lit(">")),
        ).otherwise(F.lit("")),
        F.lit("</head><body><p>part</p>"),
        F.when(
            (k % 4 != 3) & (k % 2 == 1),
            F.concat(F.lit("<a "), nxt, F.lit(' rel="nofollow next">more</a>')),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    pages = d.select(_url(k).alias("url"), html.cast("binary").alias("html"))
    edges = (
        extract_pagination(pages)
        .where(F.col("next_url").isNotNull())
        .select("url", F.col("next_url").alias("redirect_to"))
    )
    chains = resolve_redirects(edges, max_hops=4)
    return chains.select(
        "url",
        F.col("final_url").alias("series_key"),
        F.col("n_hops").alias("pos_from_end"),
        F.col("resolved").alias("complete"),
    )


def q_provenance(spark, sf):  # license + publication-time provenance
    """Case table per doc_id: rel=license CC links (variant+version
    parsed), relative license hrefs (RFC-3986 resolved), a CC0 url
    WITHOUT rel=license (variant still mined from the body), ISO
    article:published_time metas (one invalid that must fall through to
    the <time datetime> tag path), zone offsets. The oracle re-derives
    epochs via make_timestamp."""
    from .operators.page_meta import extract_provenance

    d = _t(spark, sf, "documents")
    k = F.col("doc_id")
    ks = k.cast("string")
    host = F.concat(F.lit("https://host"), (k % 50).cast("string"), F.lit(".example"))
    url = F.concat(host, F.lit("/p/"), ks)
    day = ((k % 9) + 10).cast("string")
    hour = ((k % 12) + 10).cast("string")
    html = F.concat(
        F.lit("<!DOCTYPE html><html><head>"),
        F.when(
            k % 4 == 0,
            F.concat(
                F.lit('<meta property="article:published_time" content="2026-03-'),
                day, F.lit("T"), hour, F.lit(':15:30Z">'),
            ),
        )
        .when(
            k % 4 == 2,
            F.lit('<meta property="article:published_time" content="yesterday">'),
        )
        .otherwise(F.lit("")),
        F.lit("</head><body>"),
        F.when(
            k % 3 == 0,
            F.lit('<a rel="license" href="https://creativecommons.org/'
                  'licenses/by-sa/4.0/">CC</a>'),
        )
        .when(k % 3 == 1, F.lit('<link rel="license" href="/license">'))
        .otherwise(F.lit("")),
        F.when(
            k % 6 == 5,
            F.lit('<a href="https://creativecommons.org/publicdomain/zero/'
                  '1.0/">CC0</a>'),
        ).otherwise(F.lit("")),
        F.when(
            k % 4 == 1,
            F.concat(
                F.lit('<time datetime="2026-04-'),
                day, F.lit("T"), hour, F.lit(':15:30+02:00">then</time>'),
            ),
        ).otherwise(F.lit("")),
        F.lit("<p>x</p></body></html>"),
    )
    pages = d.select(url.alias("url"), html.cast("binary").alias("html"))
    return extract_provenance(pages)


def q_snapshot_drift(spark, sf):  # graded change magnitude between snapshots
    """Same synthetic crawl timeline as url_changes but carrying snapshot
    TEXT (first 200 chars, alternating revision marker); drift is 1000 -
    shingle-Jaccard_milli vs the previous snapshot."""
    from .operators.crawl_history import snapshot_drift

    d = _t(spark, sf, "documents")
    k = F.col("doc_id")
    v = F.explode(F.sequence(F.lit(0), (k % 3).cast("int"))).alias("v")
    s = d.select("doc_id", "text", v)
    snaps = s.select(
        F.concat(
            F.lit("https://host"), (F.col("doc_id") % 50).cast("string"),
            F.lit(".example/p/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        (F.lit(1700000000) + F.col("v") * 86400 + F.col("doc_id") % 1000)
        .cast("long")
        .alias("warc_epoch"),
        F.concat(
            F.substring("text", 1, 200),
            F.when(
                (F.col("doc_id") + F.col("v")) % 2 == 0,
                F.lit(" revision marker alpha"),
            ).otherwise(F.lit("")),
        ).alias("snap_text"),
    )
    return snapshot_drift(snaps)


def q_snapshot_diff(spark, sf):  # minimal edit script between snapshots
    """Myers line diff over a residue-constructed snapshot timeline:
    snapshot v edits exactly one base line (position (doc_id*13+v*7) % n,
    revision counter bumped) and appends a line when (doc_id+v) % 3 == 0.
    The Spark side builds the line arrays with pure Column algebra and
    diffs them with the GENERIC O(ND) kernel; the oracle re-derives the
    unique minimal script arithmetically — two independent derivations
    of every edited line."""
    from .operators.crawl_history import snapshot_line_diff

    d = _t(spark, sf, "documents")
    v = F.explode(
        F.sequence(F.lit(0), (F.lit(1) + F.col("doc_id") % 3).cast("int"))
    ).alias("v")
    s = d.select("doc_id", v)
    base = F.expr(
        "transform(sequence(0, int(3 + doc_id % 4) - 1), i -> concat("
        " 'para ', cast(i as string), ' rev ', cast(size(filter("
        "   sequence(0, v), s -> s >= 1"
        "   and (doc_id * 13 + s * 7) % (3 + doc_id % 4) = i)) as string)))"
    )
    appends = F.expr(
        "transform(filter(sequence(0, v), s -> s >= 1 and (doc_id + s) % 3 = 0),"
        " s -> concat('appended ', cast(s as string)))"
    )
    snaps = s.select(
        F.concat(
            F.lit("https://host"), (F.col("doc_id") % 50).cast("string"),
            F.lit(".example/p/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        (F.lit(1700000000) + F.col("v") * 86400).cast("long").alias("warc_epoch"),
        F.concat(base, appends).alias("lines"),
    )
    return snapshot_line_diff(snaps)


def q_mirror_clusters(spark, sf):  # mirror farms: components of mirror graph
    """Connected components over the q_mirror_hosts pair graph; the
    oracle computes the same closure with a recursive CTE and takes the
    per-host min reachable host."""
    from .operators.crawl_history import mirror_clusters

    return mirror_clusters(q_mirror_hosts(spark, sf))


def q_surt(spark, sf):  # SURT keys for range-partitionable URL indexes
    """Messy-url corpus (mixed-case hosts, www., default ports, unsorted
    query params, fragments) -> (url, surt); the oracle re-derives every
    string transform independently in DuckDB SQL."""
    from .operators.urls import surt_keys

    d = _t(spark, sf, "documents")
    k = F.col("doc_id")
    url = F.concat(
        F.lit("https://"),
        F.when(k % 4 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("Host"), (k % 50).cast("string"), F.lit(".Example.org"),
        F.when(k % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/P/"), k.cast("string"),
        F.when(
            k % 2 == 0, F.concat(F.lit("?b=2&a="), (k % 7).cast("string"))
        ).otherwise(F.lit("")),
        F.when(k % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    return surt_keys(d.select(url.alias("url"))).select("url", "surt")


def q_token_budget(spark, sf):  # greedy quality-ordered token budget per lang
    from .operators.corpus_filters import token_budget_sample

    d = _t(spark, sf, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        ((F.col("doc_id") * 37) % 100).cast("long").alias("quality"),
        ta.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    return token_budget_sample(scored, budget=3000, strata_col="lang")


def q_page_links(spark, sf):  # link graph: byte-level anchor extraction
    """REAL path: charset-aware decode + anchor scan + RFC-3986 resolution
    over the raw html bytes. The oracle re-derives every link from the
    corpus-construction residues (sources/pages.py nav + related-footer
    blocks) — two independent derivations that must agree row-for-row."""
    from .operators.link_graph import extract_page_links

    return extract_page_links(pages_df(spark, sf))


#: selector set for the css_select query — each targets a deterministic
#: region of the synthetic page grammar (sources/pages._html_doc) so the
#: DuckDB oracle can re-derive every match arithmetically from residues.
CSS_QUERY_SELECTORS = (
    "nav li > a",
    "#content > h2",
    "footer p a",
    "h1",
    "table td",
    'a[href^="/nav/"]',
    "#content > p",
)


def q_css_select(spark, sf):  # CSS select() over raw page bytes
    """REAL path: charset-aware decode + DOM parse + CSS-selector engine
    (kernels/css_select.py — the BeautifulSoup select() parity surface)
    over the raw html bytes; 7 selectors spanning combinators (child /
    descendant), id/attribute matching, and prefix attribute tests. The
    oracle re-derives every matched element's (match_idx, tag, text) from
    the corpus-construction residues — nav anchors, section heading,
    footer links, h1 pair, table cells, and the word-chunked content
    paragraphs including the cp1252/utf-16 charset extras."""
    from .operators.dom_query import css_select_table

    return css_select_table(pages_df(spark, sf), CSS_QUERY_SELECTORS)


def q_html_tables(spark, sf):  # relational lift of web tables
    """REAL path: charset-aware decode + table/tr/td cell scan over the raw
    html bytes -> (url, table_idx, row_idx, col_idx, cell) grid rows. The
    oracle re-derives every cell from the corpus-construction residues
    (sources/pages.py: header row (key,val) + data rows (row{r},
    (doc_id+r)%100)) — two independent derivations that must agree
    cell-for-cell."""
    from .operators.html_tables import extract_html_tables

    return extract_html_tables(pages_df(spark, sf))


def q_link_hosts(spark, sf):  # inter-host edge rollup of the link graph
    from .operators.link_graph import extract_page_links, host_graph

    return host_graph(extract_page_links(pages_df(spark, sf)))


def q_anchor_summary(spark, sf):  # per-target top-k anchor-text profile
    """Anchor text as target description: top-3 distinct anchors per
    dst_url by reference count, with distinct-referring-host counts. The
    oracle re-derives the whole profile from the corpus-construction
    residues (same independent-derivation bar as page_links)."""
    from .operators.link_graph import anchor_summary, extract_page_links

    return anchor_summary(extract_page_links(pages_df(spark, sf)), k=3)


def q_pagerank(spark, sf):  # fixed-point integer PageRank over host graph
    from .operators.link_graph import extract_page_links, host_graph, pagerank_hosts

    edges = host_graph(extract_page_links(pages_df(spark, sf)))
    return pagerank_hosts(edges).select(
        "host", F.col("rank").alias("rank_scaled")
    )


def q_hyperball(spark, sf):  # HyperBall harmonic centrality (HLL balls)
    """Boldi-Vigna 2013 harmonic centrality over the host graph: per-node
    HLL in-ball counters, one edge-join + register-max merge per round,
    telescoped integer-exact estimate deltas. The oracle replays every
    register of every round in DuckDB (the same poly-hash/rho pipeline as
    the hll_distinct oracle) and must land on the identical milli-scaled
    centralities — bit-for-bit, because the whole recurrence is integral."""
    from .operators.link_graph import extract_page_links, host_graph, hyperball_harmonic

    edges = host_graph(extract_page_links(pages_df(spark, sf)))
    return hyperball_harmonic(edges)


def q_homograph(spark, sf):  # IDN homograph pairs (TR#39 skeletons)
    """Cross-script lookalike host detection: NFC + confusable-fold
    skeletons, bucketed self-join. The corpus carries Cyrillic-substituted
    variants (о/ѕ/е for o/s/e) and a precomposed-vs-decomposed accent pair
    per residue class. The oracle folds with DuckDB's ICU nfc_normalize —
    a genuinely INDEPENDENT Unicode normalization implementation vs the
    Spark side's Python unicodedata — plus the same literal confusable
    map (operators.urls.CONFUSABLES, one source of truth)."""
    from .operators.urls import homograph_pairs

    d = _t(spark, sf, "documents")
    base = F.concat(
        F.lit("host"), (F.col("doc_id") % 50).cast("string"), F.lit(".example")
    )
    rows = [d.select(base.alias("host"))]
    for res, src, dst in ((1, "o", "о"), (2, "s", "ѕ"), (3, "e", "е")):
        rows.append(
            d.where(F.col("doc_id") % 4 == res).select(
                F.translate(base, src, dst).alias("host")
            )
        )
    tail = F.concat((F.col("doc_id") % 50).cast("string"), F.lit(".example"))
    rows.append(
        d.where(F.col("doc_id") % 10 == 5).select(
            F.concat(F.lit("caf\u00e9-"), tail).alias("host")
        )
    )
    rows.append(
        d.where(F.col("doc_id") % 10 == 5).select(
            F.concat(F.lit("cafe\u0301-"), tail).alias("host")
        )
    )
    hosts = rows[0]
    for r in rows[1:]:
        hosts = hosts.unionByName(r)
    return homograph_pairs(hosts)


#: shard roster for the rendezvous query — shared literal with the oracle
RENDEZVOUS_SHARDS = tuple(f"node{i:02d}" for i in range(16))


def q_rendezvous(spark, sf):  # HRW sharding + minimal-movement evidence
    """Rendezvous hashing of every url against 16 shards AND against the
    15-shard roster with node15 decommissioned: ``moved`` flags the keys
    whose assignment changed. The defining guarantee — only node15's own
    keys move — is checked by the oracle re-deriving both argmaxes and
    by a test asserting moved == (shard_a == 'node15')."""
    from .operators.layout import rendezvous_shard

    d = _t(spark, sf, "documents")
    url = F.concat(
        F.lit("https://host"), (F.col("doc_id") % 50).cast("string"),
        F.lit(".example/p/"), F.col("doc_id").cast("string"),
    )
    base = d.select(url.alias("url"))
    a = rendezvous_shard(F.col("url"), RENDEZVOUS_SHARDS)
    b = rendezvous_shard(F.col("url"), RENDEZVOUS_SHARDS[:-1])
    return base.select(
        "url",
        a.alias("shard_a"),
        b.alias("shard_b"),
        (a != b).alias("moved"),
    )


#: fetcher roster for the fetch-plan query — shared literal with the oracle
FETCHER_ROSTER = tuple(f"fetcher{i:02d}" for i in range(12))


def q_fetch_plan(spark, sf):  # frontier -> fetcher-shard assignment (HRW)
    """The reason crawlers use rendezvous hashing: every host routes to
    exactly ONE of 12 fetchers (politeness becomes a local property of
    that fetcher, no cross-fetcher coordination), and decommissioning a
    fetcher moves only its own hosts. Output: (fetcher, host, n_urls,
    fetcher_total) — the oracle replays the HRW argmax per host and both
    aggregates."""
    from .operators.layout import rendezvous_shard

    d = _t(spark, sf, "documents").select("doc_id")
    host = F.concat(
        F.lit("host"), (F.col("doc_id") % 97).cast("string"), F.lit(".example.com")
    )
    assigned = d.select(
        host.alias("host"),
        rendezvous_shard(host, FETCHER_ROSTER).alias("fetcher"),
    )
    per = assigned.groupBy("fetcher", "host").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls")
    )
    w = Window.partitionBy("fetcher")
    return per.select(
        "fetcher",
        "host",
        "n_urls",
        F.sum("n_urls").over(w).cast("long").alias("fetcher_total"),
    )


def q_annotate_meta(spark, sf):  # annotated-detection sink metadata
    """REAL path: codec decode -> ink-projection word detection -> box
    overlay -> PNG re-encode, projected to (url, n_boxes, width, height).
    The oracle re-derives every value from the render-geometry residues
    (pixel_ocr.render_text_image: pitch 6, margin 2, line gap 3, scale
    2/3 by residue; 3 lines x 4 words per image page, inter-word gaps
    always >= the 5*scale split threshold, so n_boxes == 12) — the
    detection side is proven byte-exact by the flagship goldens, this
    pins the SINK's geometry independently."""
    from .operators.multimodal import annotate_detections

    return annotate_detections(pages_df(spark, sf)).select(
        "url", "n_boxes", "width", "height"
    )


def q_profile(spark, sf):  # one-pass table profiling (data-quality summary)
    """Per-column nulls / exact distincts / native-order min-max of the
    documents table in ONE scan (single wide agg + stack unpivot — never
    a per-column job loop). The oracle re-derives each column's row with
    plain per-column SQL aggregates."""
    from .operators.profile import profile_table

    return profile_table(
        _t(spark, sf, "documents"), ["doc_id", "text", "lang", "source", "n_chars"]
    )


def q_ip_asn(spark, sf):  # bucketed range join (IP -> ASN enrichment)
    """The interval-join problem Spark plans as a nested loop: enrich a
    synthetic server-IP column against 512 non-overlapping ASN blocks.
    The operator prefix-buckets both sides and hash-equi-joins (explode
    fan-out <= width/2^20 + 1) — never |points| x |ranges|; a plan test
    asserts no nested-loop/cartesian node. The oracle runs the naive
    BETWEEN join in DuckDB — same rows, different algorithm."""
    from .operators.range_join import bucketed_range_join

    d = _t(spark, sf, "documents")
    points = d.select(
        "doc_id", F.expr("(doc_id * 2654435761) % 4294967296").alias("ip")
    )
    ranges = spark.range(512).select(
        F.expr("id * 8388608").alias("lo"),
        F.expr("id * 8388608 + (id * 2654435761) % 8388608").alias("hi"),
        F.expr("cast(64500 + id % 97 as int)").alias("asn"),
    )
    return bucketed_range_join(
        points, ranges, point_col="ip", bucket_bits=20, how="left"
    ).select("doc_id", "ip", "asn")


def q_zorder(spark, sf):  # Morton/Z-order layout keys (zone-map clustering)
    """Bit-interleaved (host-hash, day-bucket) layout keys: fixing a
    z-value prefix bounds BOTH axes, which is what makes the catalog's
    commit zone maps selective on host AND time at once. Pure Column bit
    algebra (64 shift/mask terms, zero exchanges, zero python); the
    oracle re-derives every z-value with DuckDB list arithmetic."""
    from .operators.layout import zorder_layout
    from .operators.sketches import _REG_INIT, _REG_MULT, _poly_hash_m

    d = _t(spark, sf, "documents")
    host = F.concat(
        F.lit("host"), (F.col("doc_id") % 50).cast("string"), F.lit(".example")
    )
    base = d.select(
        F.concat(
            F.lit("https://host"), (F.col("doc_id") % 50).cast("string"),
            F.lit(".example/p/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        (_poly_hash_m(host, init=_REG_INIT, mult=_REG_MULT) % 65536)
        .cast("int")
        .alias("xk"),
        F.expr("(1700000000 + (doc_id % 365) * 86400) div 86400 % 65536")
        .cast("int")
        .alias("yk"),
    )
    return zorder_layout(base, "xk", "yk")


def q_walks(spark, sf):  # hash-derandomized DeepWalk corpus
    """Perozzi et al. 2014 walk corpus over the host graph with HASH-
    derandomized step choice (polyhash(cur#start#w#t) % outdeg over the
    lexicographically indexed adjacency): byte-identical under any
    partitioning, and the oracle replays every step with unrolled
    joins + the same portable poly hash."""
    from .operators.link_graph import extract_page_links, host_graph, random_walks

    return random_walks(host_graph(extract_page_links(pages_df(spark, sf))))


def q_kcore(spark, sf):  # k-core membership by synchronous peeling
    """Seidman k-core (k=2) over the undirected host graph: fixed-round
    synchronous peel, broadcast survivor semi-joins. The oracle replays
    every round's restricted-degree table in DuckDB."""
    from .operators.link_graph import extract_page_links, host_graph, kcore_hosts

    return kcore_hosts(host_graph(extract_page_links(pages_df(spark, sf))))


def q_textrank(spark, sf):  # TextRank keywords (PageRank on word graph)
    """Mihalcea & Tarau 2004: PageRank over the word co-occurrence graph
    (adjacent lowercased a-z tokens, both directions = undirected). Runs
    the SAME fixed-point integer pagerank_hosts kernel as the host graph
    — one operator, two graphs — so ranks are bit-deterministic and the
    oracle replays the unrolled recurrence over an SQL-re-derived edge
    set."""
    from .operators.link_graph import pagerank_hosts

    d = _t(spark, sf, "documents")
    toks = d.where(F.col("doc_id") < 2000).select(
        F.expr(
            "filter(split(regexp_replace(lower(text), '[^a-z]+', ' '), ' '),"
            " x -> x <> '')"
        ).alias("ws")
    )
    pairs = toks.select(
        F.explode(
            F.expr(
                "filter(transform(ws, (w, i) -> case when i + 1 < size(ws)"
                " then struct(w as a, element_at(ws, i + 2) as b) end),"
                " p -> p is not null)"
            )
        ).alias("p")
    )
    edges = (
        pairs.select(F.col("p.a").alias("src_host"), F.col("p.b").alias("dst_host"))
        .where(F.col("src_host") != F.col("dst_host"))
    )
    und = edges.unionByName(
        edges.select(
            F.col("dst_host").alias("src_host"), F.col("src_host").alias("dst_host")
        )
    )
    return pagerank_hosts(und, n_iters=4).select(
        F.col("host").alias("word"), F.col("rank").alias("rank_scaled")
    )


def q_triangles(spark, sf):  # triangle count / clustering coefficient
    """Degree-oriented wedge-join triangle counting (Suri & Vassilvitskii
    2011) over the undirected host graph. The oracle counts the same
    triangles with a DIFFERENT orientation (lexicographic 3-way join) —
    two independent derivations; integral clustering coefficient."""
    from .operators.link_graph import extract_page_links, host_graph, triangle_counts

    return triangle_counts(host_graph(extract_page_links(pages_df(spark, sf))))


def q_trustrank(spark, sf):  # seeded TrustRank over the host graph
    """Gyongyi et al. 2004 trust propagation from a deterministic seed
    whitelist (numeric host suffix divisible by 5); the oracle unrolls
    all 5 integral iterations over the independently re-derived edges."""
    from .operators.link_graph import extract_page_links, host_graph, trustrank_hosts

    edges = host_graph(extract_page_links(pages_df(spark, sf)))
    seed = F.coalesce(
        F.regexp_extract(F.col("host"), r"host(\d+)\.example", 1).cast("int") % 5 == 0,
        F.lit(False),
    )
    return trustrank_hosts(edges, seed).select(
        "host", "is_seed", F.col("trust").alias("trust_scaled")
    )


def q_host_communities(spark, sf):  # LPA community detection (planted blocks)
    """Deterministic synchronous label propagation (operators/link_graph.
    label_propagation) over a planted-community residue graph: 360 nodes
    in 3 blocks of 120, each block internally connected by two unit-gcd
    chord permutations (7m+13, 11m+1 mod 120 — single cycles, so every
    block is connected and dense), blocks joined only by 3 bridge edges
    at the block bases. LPA floods each block's lexicographic-min labels
    through its core while the bridges lose every vote — communities
    never cross a block boundary. 12 rounds: past convergence of the
    community COUNT (12 communities, 4 per block, stable from round 12);
    synchronous LPA then sits in the textbook period-2 limit cycle, and
    the fixed round count pins one phase, so the result is exactly
    reproducible. The oracle replays all rounds (vote counts,
    max-count/min-label tie-breaks) bit-for-bit in unrolled SQL."""
    from .operators.link_graph import label_propagation

    d = _t(spark, sf, "documents").select((F.col("doc_id") % 360).alias("m"))
    n = F.col("m")

    def name(x):
        return F.concat(F.lit("n"), F.lpad(x.cast("string"), 3, "0"))

    base = n - n % 120
    e1 = d.select(
        name(n).alias("src_host"),
        name(base + (n % 120 * 7 + 13) % 120).alias("dst_host"),
    )
    e2 = d.select(
        name(n).alias("src_host"),
        name(base + (n % 120 * 11 + 1) % 120).alias("dst_host"),
    )
    bridges = d.where(n % 120 == 0).select(
        name(n).alias("src_host"), name((n + 120) % 360).alias("dst_host")
    )
    return label_propagation(e1.unionByName(e2).unionByName(bridges), n_iters=12)


def q_hits(spark, sf):  # HITS hubs/authorities (integer L-inf fixed point)
    """Kleinberg HITS over the same host graph as `pagerank`; the oracle
    unrolls all 8 half-steps (auth then hub per round, each max-normalized
    with integral //) over an independently re-derived edge set."""
    from .operators.link_graph import extract_page_links, hits_hosts, host_graph

    return hits_hosts(host_graph(extract_page_links(pages_df(spark, sf))))


def q_reciprocity(spark, sf):  # per-host outlink reciprocity (spam feature)
    from .operators.link_graph import extract_page_links, host_graph, host_reciprocity

    return host_reciprocity(host_graph(extract_page_links(pages_df(spark, sf))))


def q_bm25_topk(spark, sf):  # corpus keyword search: BM25 top-k
    from .operators.search import bm25_topk

    return bm25_topk(
        _t(spark, sf, "documents"), ["spark", "vector", "merge", "window"], k=15
    )


def q_phrase_topk(spark, sf):  # exact-phrase search via positional postings
    """Positional-index phrase query (operators/search.phrase_topk): docs
    where 'table' and 'hash' appear CONSECUTIVELY, ranked by occurrence
    count. The adjacency constraint pos_1 = pos_0 + 1 is an equi-join on
    positional postings; the oracle re-derives every posting position and
    the join from the shared tokenizer."""
    from .operators.search import phrase_topk

    return phrase_topk(_t(spark, sf, "documents"), ["table", "hash"], k=20)


def q_jaccard_pairs(spark, sf):  # near-dup: 3-gram-shingle Jaccard (exact, prefix-filtered)
    return dedup_ops.ngram_jaccard_pairs(_t(spark, sf, "documents"), threshold=0.5)


def q_containment(spark, sf):  # asymmetric containment (quote/excerpt pages)
    """Every 13th doc spawns a derived 'excerpt page' (doc_id + 100000,
    chars 20..179 of the source) so high-containment/low-Jaccard pairs
    exist by construction; containment_pairs must find excerpt->source
    (and any incidental) pairs exactly. The oracle runs the naive
    all-pairs form over the same unioned corpus."""
    d = _t(spark, sf, "documents").select("doc_id", "text")
    quotes = d.where(F.col("doc_id") % 13 == 2).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.substring("text", 20, 160).alias("text"),
    )
    return dedup_ops.containment_pairs(d.unionByName(quotes), threshold=0.7)


def _trap_urls(spark, sf):
    """Synthetic crawl-frontier URLs: a calendar trap (/cal/y/m/id), a
    hex-id product route (/p/{8-hex}), a low-cardinality facet (/tag/k),
    a static page, and a query string carrying one session param (fresh
    md5 per URL) plus one real facet (page=0..9)."""
    d = _t(spark, sf, "documents").select("doc_id")
    k = F.col("doc_id")
    ks = k.cast("string")
    host = F.concat(F.lit("h"), (k % 5).cast("string"), F.lit(".example"))
    hx = F.lpad(F.lower(F.hex(k)), 8, "0")
    path = (
        F.when(
            k % 4 == 0,
            F.concat(
                F.lit("/cal/"),
                (k % 30 + 2000).cast("string"),
                F.lit("/"),
                (k % 12).cast("string"),
                F.lit("/"),
                ks,
            ),
        )
        .when(k % 4 == 1, F.concat(F.lit("/p/"), hx))
        .when(k % 4 == 2, F.concat(F.lit("/tag/"), (k % 7).cast("string")))
        .otherwise(F.lit("/about"))
    )
    q = F.concat(
        F.lit("?sess="),
        F.md5(ks.cast("binary")),
        F.lit("&page="),
        (k % 10).cast("string"),
    )
    return d.select(F.concat(F.lit("https://"), host, path, q).alias("url"))


def q_url_templates(spark, sf):  # crawler-trap detection via URL templates
    """Structural template mining over the trap-frontier URLs: the
    calendar trap collapses to /cal/{d}/{d}/{d} with n_paths == n_urls
    (every URL distinct — the trap signature), the facet route to
    /tag/{d} with 7 paths, /about to itself with 1. The oracle replays
    the two regex passes and both aggregates."""
    from .operators.urls import url_path_templates

    return url_path_templates(_trap_urls(spark, sf))


def q_param_mining(spark, sf):  # data-driven session-param discovery
    """Per (host, param) distinct-value ratios over the same URLs: sess
    hits ratio_milli = 1000 (fresh md5 per URL -> strip candidate),
    page stays low (real facet). Learns what url_canon's static
    tracking list hard-codes."""
    from .operators.urls import query_param_stats

    return query_param_stats(_trap_urls(spark, sf))


def q_winnow(spark, sf):  # winnowing fingerprints (Schleimer 2003 / MOSS)
    """Local document fingerprints: token 4-gram hashes, rightmost
    minimum per window of 4, distinct (pos, fp) per doc.  One narrow
    zero-shuffle projection; the oracle re-derives every token hash,
    gram hash, and window minimum with DuckDB list algebra."""
    return dedup_ops.winnow_fingerprints(_t(spark, sf, "documents"))


def q_winnow_pairs(spark, sf):  # MOSS overlap pairs from shared fingerprints
    """Posting-list self-join on winnowing fingerprint VALUES with a
    document-frequency cap (stop-fingerprints dropped before the join,
    bounding per-key fan-out at any corpus size); pairs sharing >= 2
    distinct values survive."""
    return dedup_ops.winnow_pairs(_t(spark, sf, "documents"))


def q_dedup_keep_best(spark, sf):  # near-dup retention policy
    """Clusters from the exact-Jaccard pair list collapse to their best
    member (max n_chars, tie min doc_id); singletons always kept. The
    oracle recomputes the clusters INDEPENDENTLY via a recursive-CTE
    reachability closure — a genuinely different CC algorithm than the
    operator's pointer-jumping label propagation."""
    d = _t(spark, sf, "documents")
    pairs = dedup_ops.ngram_jaccard_pairs(d, threshold=0.5)
    return dedup_ops.dedup_keep_best(d, pairs)


def q_heavy_hitters(spark, sf):  # count-min sketch frequency gate
    """Heavy-hitter words via a deliberately tiny (3x16) count-min sketch
    so counter collisions OCCUR and the oracle must reproduce the exact
    inflated estimates (est >= true always; the unit test asserts the
    one-sided bound). min_count=900 splits the corpus vocabulary."""
    from .operators.sketches import heavy_hitters

    words = (
        _t(spark, sf, "documents")
        .select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("key"))
        .where(F.col("key") != "")
    )
    return heavy_hitters(words, "key", width=16, depth=3, min_count=900)


def q_hll_distinct(spark, sf):  # HyperLogLog distinct-count sketch
    """Vocabulary-by-document cardinality (~12k keys at sf0.01) through 128
    HLL registers; output = register stats + the integer-quantized raw
    estimate next to the exact distinct count. Every register and the
    estimate itself are re-derived bit-exactly by the oracle."""
    from .operators.sketches import hll_estimate, hll_registers

    keys = (
        _t(spark, sf, "documents")
        .select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("w"), "doc_id")
        .where(F.col("w") != "")
        .select(F.concat_ws("#", "w", F.col("doc_id").cast("string")).alias("key"))
    )
    est = hll_estimate(hll_registers(keys, "key", m=128), m=128)
    exact = keys.agg(F.countDistinct("key").cast("long").alias("exact_distinct"))
    return est.crossJoin(exact)


def q_crawl_overlap(spark, sf):  # sketch set-algebra: |A∩B| of two crawls
    """Cross-crawl overlap WITHOUT a join: crawl A (even doc_ids) and
    crawl B (doc_ids divisible by 3) are sketched into 128-register HLLs;
    the union sketch is the register-wise max (the lossless HLL merge)
    and the intersection estimate is inclusion-exclusion over the three
    integer-exact raw estimates — set algebra on <=128-row tables where
    the naive answer is a url-key join of two corpora. Exact counts ride
    along for the accuracy check; the oracle re-derives every register,
    estimate, and the exact counts bit-for-bit."""
    from .operators.sketches import hll_estimate, hll_registers, hll_union

    d = _t(spark, sf, "documents").select("doc_id")
    k = F.col("doc_id")
    url = F.concat(
        F.lit("https://"),
        F.when(k % 10 < 3, F.lit("host0")).otherwise(
            F.concat(F.lit("host"), (1 + k % 37).cast("string"))
        ),
        F.lit(".example/p/"), k.cast("string"),
    )
    a = d.where(k % 2 == 0).select(url.alias("key"))
    b = d.where(k % 3 == 0).select(url.alias("key"))
    ra = hll_registers(a, "key", m=128).persist()
    rb = hll_registers(b, "key", m=128).persist()
    ea = hll_estimate(ra, m=128).select(F.col("estimate").alias("est_a"))
    eb = hll_estimate(rb, m=128).select(F.col("estimate").alias("est_b"))
    eu = hll_estimate(hll_union(ra, rb), m=128).select(
        F.col("estimate").alias("est_union")
    )
    exact = d.agg(
        F.sum((k % 2 == 0).cast("long")).alias("exact_a"),
        F.sum((k % 3 == 0).cast("long")).alias("exact_b"),
        F.sum((k % 6 == 0).cast("long")).alias("exact_intersection"),
    )
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .crossJoin(exact)
        .select(
            "est_a", "est_b", "est_union",
            (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
                "est_intersection"
            ),
            "exact_a", "exact_b", "exact_intersection",
        )
    )


def q_length_quantiles(spark, sf):  # HDR-histogram quantile sketch
    """Document-length P50/P90/P99/P99.9 through the log2/linear HDR
    bucket sketch — distribution shape from ONE bounded aggregation, no
    global sort. Integer bucketing (length(bin(v))-1 exponent, v - v%2^s
    lower bound) makes every bucket and quantile bit-identical in the
    oracle's re-derivation."""
    from .operators.sketches import hdr_buckets, hdr_quantiles

    lens = _t(spark, sf, "documents").select(F.length("text").alias("v"))
    return hdr_quantiles(hdr_buckets(lens, "v", sub_bits=5)).orderBy("q_milli")


def q_incremental_dedup(spark, sf):
    """Incremental crawl ingestion: odd doc_ids play the NEW increment, even
    doc_ids the EXISTING corpus; a new doc whose exact 3-gram-shingle
    Jaccard vs ANY existing doc is >= 0.5 is gated out. R-S prefix join —
    never old x old (dedup.cross_corpus_jaccard_dedup)."""
    d = _t(spark, sf, "documents")
    return dedup_ops.cross_corpus_jaccard_dedup(
        d.where(F.col("doc_id") % 2 == 1),
        d.where(F.col("doc_id") % 2 == 0),
        threshold=0.5,
    )


def q_ann_topk(spark, sf):  # similarity: brute-force cosine top-k
    e = _t(spark, sf, "embeddings")
    return sim_ops.brute_force_topk(e, e.where(F.col("vec_id") < 5), k=5)


def q_cube_agg(spark, sf):  # grouping-sets coverage (SURVEY.md §2.4 note)
    li = _t(spark, sf, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
            "sum_price",
        )
    )


def q_distinct_agg(spark, sf):  # distinct aggregation
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").cast("long").alias("n_parts"),
        F.countDistinct("l_suppkey").cast("long").alias("n_supps"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


def q_events_hourly(spark, sf):  # event-time bucket aggregation
    e = _t(spark, sf, "events")
    bucket = F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).cast("long")
    # avg from the EXACT decimal sum (a raw double avg adds in partition-
    # dependent order; near a 1e-4 rounding boundary the oracle hash flips)
    dec_sum = F.sum(F.col("value").cast("decimal(18,2)"))
    return e.groupBy(bucket.alias("hour_epoch"), F.col("event_type")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(
            dec_sum.cast("double") / F.count(F.lit(1)), 4
        ).alias("avg_value"),
        dec_sum.cast("double").alias("sum_value"),
    )


def q_ctc_roundtrip(spark, sf):  # R5/R6 CTC decode (fixture logits)
    return ctc_roundtrip(_t(spark, sf, "part")).select("p_partkey", "decoded")


def q_attn_decode(spark, sf):  # R8 encoder-decoder attention decode (round 2)
    from .operators.recognize import attn_decode_table

    return attn_decode_table(_t(spark, sf, "part"))


def q_pixel_ocr(spark, sf):  # S1+P1+D-detect+R-recognize on REAL pixels
    from .operators.recognize import pixel_ocr_roundtrip

    return pixel_ocr_roundtrip(_t(spark, sf, "part"))


def q_crnn_read(spark, sf):  # R4 CRNN-form forward (conv bank + CTC) on pixels
    from .operators.recognize import crnn_read_roundtrip

    return crnn_read_roundtrip(_t(spark, sf, "part"))


def q_crnn_trained(spark, sf):  # R4 with TRAINED weights (round-3 closure)
    """Fit the conv bank from noisy labeled corpus renders (one distributed
    aggregation -> bounded model table), then read every page with the
    LEARNED filters; decode is byte-identical to the sanitize projection,
    so the oracle is pure SQL."""
    from .operators.recognize import crnn_trained_roundtrip

    return crnn_trained_roundtrip(_t(spark, sf, "part"))


def q_crnn_multifont(spark, sf):  # R4 trained on TWO typefaces (r5 closure)
    """VERDICT r04 #6: half the corpus renders in a second 7x5 font (the
    smeared-bold glyph set, glyphs.FONT_TEMPLATES) and the SAME
    distributed least-squares fit learns per-(font, char) banks in one
    bounded aggregation; every page then decodes through the single
    combined 72-class conv — proving the R4 training mechanism
    generalizes across typefaces the way the reference's CRNN does
    (architectures/crnn_arch.py:306-531). Decode is byte-identical to
    the sanitize projection for BOTH fonts, so the oracle stays the hard
    SQL identity with the font column re-derived from key parity."""
    from .operators.recognize import crnn_multifont_roundtrip

    return crnn_multifont_roundtrip(_t(spark, sf, "part"))


def q_east_trained(spark, sf):  # D1 with TRAINED score head (round-3 closure)
    """Fit the EAST-style score-head conv by distributed Newton logistic
    regression (bounded int64 gradient/Hessian fan-in per pass), then run
    the full trained-map decode — threshold -> geometry -> D2
    restore_polys -> reading order -> recognize.  Training provably
    separates (zero errors gate inside), so decoded text and the box
    geometry sums are pure arithmetic over the sanitized source text —
    hard SQL oracle."""
    from .operators.detect_train import east_trained_roundtrip

    return east_trained_roundtrip(_t(spark, sf, "part"))


def q_embed_centroids(spark, sf):  # reference utils/embeddings.compute_centroids
    from .operators.similarity import embed_centroids

    return embed_centroids(_t(spark, sf, "embeddings"))


def q_emission_filter(spark, sf):  # P6/X3 near-duplicate emission gate
    # relational form of _filter_text_results (base_ocr.py:679-725): basic
    # gates (non-empty, multi-word, has letters) + reject when normalized
    # edit distance vs the previously-emitted text (lag) is < 0.2
    d = _t(spark, sf, "documents")
    t = F.trim(F.col("text"))
    w = Window.partitionBy("lang").orderBy("doc_id")
    prev = F.lag(t).over(w)
    base_ok = (F.length(t) > 0) & t.contains(" ") & t.rlike("[a-zA-Z]")
    near_dup = F.coalesce(
        F.when(
            prev.isNotNull() & (F.length(prev) > 0),
            (F.levenshtein(t, prev) / F.length(prev)) < 0.2,
        ).otherwise(F.lit(False)),
        F.lit(False),  # NULL text: levenshtein(NULL,..) is NULL; the oracle
    )                  # coalesces to FALSE — match it (empty prev: never near)
    return d.select(
        "doc_id",
        "lang",
        base_ok.alias("base_ok"),
        near_dup.alias("near_dup"),
        (base_ok & ~near_dup).alias("emit"),
    )


def q_pandas_udf_lev(spark, sf):  # F1 weighted edit distance via scalar pandas_udf
    # the vectorized-pUDF surface (SURVEY.md §2.11); unweighted costs make
    # it oracle-checkable against the builtin levenshtein
    from .operators.pudf import lev_norm_udf

    c = _t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        lev_norm_udf(F.col("c_name"), F.lit("Customer#000000042")).alias("lev_norm"),
    )


def q_embed_dup_pairs(spark, sf):  # dedup: embedding-cosine near-dup
    e = _t(spark, sf, "embeddings")
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"), F.col("label"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"), F.col("label"))
    # block on label (the cluster id): near-dups across labels are rare by
    # construction; at scale the block key would be an LSH bucket (lsh_ann)
    return (
        a.join(b, "label")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(sim_ops.cosine(F.col("emb_a"), F.col("emb_b")), 4).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= 0.3)
    )


def q_asof_join(spark, sf):  # temporal as-of join (DuckDB ASOF JOIN parity)
    """For every click event, the newest prior purchase by the same user —
    the temporal-join staple (feature backfill, price-at-time lookups).
    Spark has no ASOF JOIN; operators/crawl_history.asof_join builds it as
    union + running last_value: ONE hash exchange on the key."""
    from .operators.crawl_history import asof_join

    e = _t(spark, sf, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    buys = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        clicks, buys, key="user_id", ts_col="ts", payload_cols=("value",),
        prefix="last_purchase_",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "last_purchase_ts",
        F.round("last_purchase_value", 6).alias("last_purchase_value"),
    )


def q_semdedup(spark, sf):  # semantic dedup over embeddings (SemDeDup)
    from .operators.similarity import semdedup

    return semdedup(_t(spark, sf, "embeddings"))


def q_quality_classifier(spark, sf):  # fasttext-style linear quality filter
    from .operators.corpus_filters import quality_classifier

    return quality_classifier(_t(spark, sf, "documents"))


def q_sequence_pack(spark, sf):  # GPT-style concat-and-chunk packing
    from .operators.corpus_filters import sequence_pack

    return sequence_pack(_t(spark, sf, "documents"))


def q_robots_filter(spark, sf):  # robots.txt compliance gate (RFC 9309)
    """Deterministically constructed robots.txt bodies per host (allow/
    disallow groups, longest-match, $-anchor, agent-specific override) are
    PARSED from text by operators/robots.py; the oracle re-derives every
    verdict ARITHMETICALLY from the corpus-construction residues — two
    independent derivations, like host_stats."""
    from .operators.robots import robots_filter

    d = _t(spark, sf, "documents").select("doc_id")
    h = (F.col("doc_id") % 10).cast("string")
    r = F.col("doc_id") % 5
    did = F.col("doc_id").cast("string")
    urls = d.select(
        "doc_id",
        F.concat(F.lit("host"), h, F.lit(".example.com")).alias("host"),
        F.when(r == 0, F.concat(F.lit("/exactly/page"), did))
        .when(r == 1, F.concat(F.lit("/private/x"), did))
        .when(r == 2, F.concat(F.lit("/private/ok/y"), did))
        .when(r == 3, F.concat(F.lit("/tmp"), h, F.lit("/z")))
        .otherwise(F.lit("/exact"))
        .alias("path"),
    )
    hosts = urls.select("host").distinct().withColumn(
        "hnum", F.regexp_extract("host", "host(\\d+)", 1).cast("int")
    )
    hn = F.col("hnum").cast("string")
    robots = hosts.select(
        "host",
        F.concat(
            F.lit(
                "User-agent: *\n# corpus robots\nDisallow: /private\n"
                "Allow: /private/ok\nDisallow: /exact$\n"
            ),
            F.when(
                F.col("hnum") % 2 == 0,
                F.concat(F.lit("Disallow: /tmp"), hn, F.lit("\n")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("hnum") % 3 == 0,
                F.lit("\nUser-agent: ocrbot\nDisallow: /\n"),
            ).otherwise(F.lit("")),
        ).alias("robots_txt"),
    )
    return robots_filter(urls, robots, agent="ocrbot")


def q_sitemap_urls(spark, sf):  # sitemaps.org parse (urlset + sitemapindex)
    """Deterministic sitemap XML per host (urlset with lastmod/changefreq/
    priority variants + sitemapindex hosts + &amp; entity in loc) is PARSED
    from bytes by operators/crawl_edge.py; the oracle re-derives every row
    arithmetically from the distinct host residues."""
    from .operators.crawl_edge import sitemap_entries

    hosts = (
        _t(spark, sf, "documents")
        .select((F.col("doc_id") % 10).alias("hnum"))
        .distinct()
    )
    hn = F.col("hnum").cast("string")
    base = F.concat(F.lit("https://host"), hn, F.lit(".example.com"))
    urlset = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?>\n<urlset>\n  <url><loc>'),
        base,
        F.lit("/page0&amp;ref="),
        hn,
        F.lit("</loc><lastmod>2026-0"),
        ((F.col("hnum") % 9) + 1).cast("string"),
        F.lit("-01</lastmod><priority>0."),
        hn,
        F.lit("</priority></url>\n  <url><loc>"),
        base,
        F.lit("/page1</loc><changefreq>"),
        F.when(F.col("hnum") % 2 == 0, F.lit("daily")).otherwise(F.lit("weekly")),
        F.lit("</changefreq></url>\n  <url><loc>"),
        base,
        F.lit("/page2</loc></url>\n</urlset>\n"),
    )
    index = F.concat(
        F.lit('<?xml version="1.0"?>\n<sitemapindex>\n  <sitemap><loc>'),
        base,
        F.lit(
            "/sitemap_1.xml.gz</loc><lastmod>2026-07-15</lastmod></sitemap>\n"
            "  <sitemap><loc>"
        ),
        base,
        F.lit("/sitemap_2.xml.gz</loc></sitemap>\n</sitemapindex>\n"),
    )
    sm = hosts.select(
        F.concat(F.lit("host"), hn, F.lit(".example.com")).alias("host"),
        F.when(F.col("hnum") % 3 == 0, index).otherwise(urlset).alias("sitemap_xml"),
    )
    return sitemap_entries(sm)


def q_feed_entries(spark, sf):  # RSS 2.0 + Atom feed parse (crawl discovery)
    """Deterministic feed XML per host — even-residue hosts publish RSS
    2.0 (RFC 822 pubDate, one GMT + one +0200, &amp; in the link, guid
    fallback), odd publish Atom (ISO 8601 updated, one Z + one
    fractional +02:00, rel=self decoy link) — PARSED from bytes by
    operators/feeds.py into integer epoch ms; the oracle re-derives
    every epoch with make_timestamp/epoch_ms from the host residue."""
    from .operators.feeds import feed_entries

    hosts = (
        _t(spark, sf, "documents")
        .select((F.col("doc_id") % 10).alias("hnum"))
        .distinct()
    )
    hn = F.col("hnum").cast("string")
    hh = (F.col("hnum") + 10).cast("string")  # 2-digit hour AND iso day
    base = F.concat(F.lit("https://host"), hn, F.lit(".example.com"))
    rss = F.concat(
        F.lit(
            '<?xml version="1.0"?>\n<rss version="2.0"><channel>\n'
            "<title>channel title</title>\n<item><title>Post &amp; 0"
            "</title><link>"
        ),
        base, F.lit("/post0?a=1&amp;b="), hn,
        F.lit("</link><guid>tag:host"), hn,
        F.lit(":0</guid><pubDate>Mon, "),
        (F.col("hnum") + 1).cast("string"),
        F.lit(" Jun 2026 "), hh,
        F.lit(":15:30 GMT</pubDate></item>\n<item><title>Post 1</title><link>"),
        base,
        F.lit("/post1</link><pubDate>Mon, "),
        (F.col("hnum") + 1).cast("string"),
        F.lit(" Jun 2026 "), hh,
        F.lit(":15:30 +0200</pubDate></item>\n</channel></rss>\n"),
    )
    atom = F.concat(
        F.lit(
            '<?xml version="1.0"?>\n<feed xmlns="http://www.w3.org/2005/Atom">\n'
            "<title>feed title</title>\n"
            '<link rel="self" href="https://decoy.invalid/feed"/>\n'
            "<entry><title>Entry 0</title><id>urn:host"
        ),
        hn,
        F.lit(':0</id><link rel="self" href="https://decoy.invalid/e0"/>'
              '<link rel="alternate" href="'),
        base,
        F.lit('/e0"/><updated>2026-07-'), hh,
        F.lit("T"), hh,
        F.lit(":15:30Z</updated></entry>\n<entry><title>Entry 1</title>"
              "<id>urn:host"),
        hn,
        F.lit(':1</id><link href="'),
        base,
        F.lit('/e1"/><updated>2026-07-'), hh,
        F.lit("T"), hh,
        F.lit(":15:30.250+02:00</updated></entry>\n</feed>\n"),
    )
    feeds = hosts.select(
        F.concat(F.lit("host"), hn, F.lit(".example.com")).alias("host"),
        F.when(F.col("hnum") % 2 == 0, rss).otherwise(atom).alias("feed_xml"),
    )
    return feed_entries(feeds)


def q_politeness(spark, sf):  # per-host fetch-slot schedule w/ robots delay
    """Crawl-delay is PARSED from robots.txt text by robots_directives
    (fractional-second and integer flavors); slots come from the window
    rank. The oracle re-derives the delay arithmetically and the slot via
    its own window — integer schedule, exact match."""
    from .operators.crawl_edge import politeness_schedule
    from .operators.robots import robots_directives

    d = _t(spark, sf, "documents").select("doc_id")
    h = (F.col("doc_id") % 10).cast("string")
    urls = d.select(
        "doc_id",
        F.concat(F.lit("host"), h, F.lit(".example.com")).alias("host"),
        F.concat(F.lit("/p"), F.col("doc_id").cast("string")).alias("url"),
        (F.col("doc_id") % 7).cast("int").alias("priority"),
    )
    hosts = urls.select("host").distinct().withColumn(
        "hnum", F.regexp_extract("host", "host(\\d+)", 1).cast("int")
    )
    robots = hosts.select(
        "host",
        F.concat(
            F.lit("User-agent: *\nCrawl-delay: "),
            F.when(F.col("hnum") % 4 == 3, F.lit("0.5")).otherwise(
                ((F.col("hnum") % 4) + 1).cast("string")
            ),
            F.lit("\nDisallow: /private\nSitemap: https://"),
            F.col("host"),
            F.lit("/sm.xml\n"),
        ).alias("robots_txt"),
    )
    return politeness_schedule(
        urls, robots_directives(robots), priority_col="priority", order_col="url"
    )


def q_frontier_plan(spark, sf):  # crawl-loop composition (discover->gate->pace)
    """Candidates from two discovery channels (k%5==0 urls arrive via
    BOTH with a fresher second sighting — dedup must keep it), a crawled
    set (k%3==0) removed by anti-join, robots with `Disallow: /priv`
    (k%7==0 paths) and per-host Crawl-delay, recency-priority slots.
    Every stage is re-derived arithmetically by the oracle."""
    from .operators.crawl_edge import frontier_plan

    d = _t(spark, sf, "documents").select("doc_id")
    k = F.col("doc_id")
    ks = k.cast("string")
    host = F.concat(F.lit("host"), (k % 10).cast("string"), F.lit(".example.com"))
    path = F.when(k % 7 == 0, F.concat(F.lit("/priv"), ks)).otherwise(
        F.concat(F.lit("/p"), ks)
    )
    url = F.concat(F.lit("https://"), host, path)
    src1 = F.when(k % 2 == 0, F.lit("sitemap")).otherwise(F.lit("feed"))
    src2 = F.when(k % 2 == 0, F.lit("feed")).otherwise(F.lit("sitemap"))
    base_ms = F.lit(1700000000000).cast("long") + k.cast("long") * 1000
    primary = d.select(
        host.alias("host"), path.alias("path"), url.alias("url"),
        src1.alias("src"), base_ms.alias("recency_ms"),
    )
    resight = d.where(k % 5 == 0).select(
        host.alias("host"), path.alias("path"), url.alias("url"),
        src2.alias("src"), (base_ms + 500).alias("recency_ms"),
    )
    discovered = primary.unionByName(resight)
    crawled = d.where(k % 3 == 0).select(url.alias("url"))
    hosts = d.select((k % 10).alias("hnum")).distinct()
    robots = hosts.select(
        F.concat(F.lit("host"), F.col("hnum").cast("string"),
                 F.lit(".example.com")).alias("host"),
        F.concat(
            F.lit("User-agent: *\nCrawl-delay: "),
            F.when(F.col("hnum") % 4 == 3, F.lit("0.5")).otherwise(
                ((F.col("hnum") % 4) + 1).cast("string")
            ),
            F.lit("\nDisallow: /priv\n"),
        ).alias("robots_txt"),
    )
    return frontier_plan(discovered, crawled, robots)


def q_sitemap_gap(spark, sf):  # sitemap entries -> crawl-gap detection
    """What `sitemap_urls` parses, this query ACTS ON: deterministically
    constructed sitemap XML bodies (urlset files on doc_id%10==1 carriers,
    sitemapindex files on doc_id%40==3 carriers) go through the SAME
    parser as sitemap_urls (operators/crawl_edge.sitemap_entries), then
    join against the crawled corpus: ``crawled`` = the loc is a stored
    url, ``stale`` = crawled but <lastmod> post-dates the snapshot's
    warc_ts date — the uncrawled/re-crawl frontier a sitemap exists to
    surface. The oracle never sees the XML — it re-derives every record
    and both flags arithmetically from the residues (two independent
    derivations, like robots_filter)."""
    from .operators.crawl_edge import sitemap_entries

    d = _t(spark, sf, "documents").select("doc_id")
    k = F.col("doc_id")
    self_host = F.expr(
        "CASE WHEN doc_id % 10 < 3 THEN 'host0' "
        "ELSE 'host' || CAST(1 + doc_id % 37 AS STRING) END || '.example'"
    )

    def entry(j):
        t = (k * 13 + 101 * j) % 4096
        loc = F.concat(
            F.lit("https://"),
            F.when(t % 10 < 3, F.lit("host0")).otherwise(
                F.concat(F.lit("host"), (1 + t % 37).cast("string"))
            ),
            F.lit(".example/p/"),
            t.cast("string"),
        )
        lastmod = F.date_add(F.lit("2025-12-02").cast("date"), ((k + 17 * j) % 60).cast("int"))
        cf = F.element_at(
            F.array(F.lit("daily"), F.lit("weekly"), F.lit("monthly")),
            ((k + j) % 3 + 1).cast("int"),
        )
        digit = (k + j) % 10 + 1
        prio = F.when(digit == 10, F.lit("1.0")).otherwise(
            F.concat(F.lit("0."), digit.cast("string"))
        )
        return F.concat(
            F.lit("<url><loc>"), loc, F.lit("</loc><lastmod>"),
            lastmod.cast("string"), F.lit("</lastmod><changefreq>"), cf,
            F.lit("</changefreq><priority>"), prio, F.lit("</priority></url>"),
        )

    urlset = d.where(k % 10 == 1).select(
        self_host.alias("host"),
        F.concat(
            F.lit('<?xml version="1.0" encoding="UTF-8"?><urlset>'),
            F.array_join(
                F.transform(F.sequence(F.lit(0), (k % 4).cast("int")), entry), ""
            ),
            F.lit("</urlset>"),
        ).alias("xml"),
    )
    index = d.where(k % 40 == 3).select(
        self_host.alias("host"),
        F.concat(
            F.lit('<?xml version="1.0" encoding="UTF-8"?><sitemapindex>'),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(1)),
                    lambda j: F.concat(
                        F.lit("<sitemap><loc>https://"), self_host,
                        F.lit("/sitemap-"), j.cast("string"),
                        F.lit(".xml</loc><lastmod>"),
                        F.date_add(F.lit("2026-01-01").cast("date"), (k % 5).cast("int")).cast("string"),
                        F.lit("</lastmod></sitemap>"),
                    ),
                ),
                "",
            ),
            F.lit("</sitemapindex>"),
        ).alias("xml"),
    )
    raw = sitemap_entries(
        urlset.unionByName(index), body_col="xml"
    )
    parsed = raw.select(
        "host", "kind", "loc",
        F.to_date("lastmod").alias("lastmod"),
        "changefreq", "priority_milli",
    )

    crawled = d.select(
        F.concat(
            F.lit("https://"),
            F.when(k % 10 < 3, F.lit("host0")).otherwise(
                F.concat(F.lit("host"), (1 + k % 37).cast("string"))
            ),
            F.lit(".example/p/"),
            k.cast("string"),
        ).alias("loc"),
        F.to_date(
            F.lit("2026-01-01").cast("timestamp") + F.make_interval(secs=k.cast("double"))
        ).alias("crawl_date"),
    )
    # left join on loc: the crawled side is the FULL corpus, so this is a
    # plain shuffle hash join (never broadcast) — the sitemap side is the
    # small one at crawl scale and AQE is free to flip the build side
    out = parsed.join(crawled, "loc", "left")
    return out.select(
        "host", "kind", "loc", "lastmod", "changefreq", "priority_milli",
        F.col("crawl_date").isNotNull().alias("crawled"),
        F.coalesce(F.col("lastmod") > F.col("crawl_date"), F.lit(False)).alias("stale"),
    )


def q_jsonld_entities(spark, sf):  # schema.org JSON-LD entity extraction
    """Deterministically constructed pages carry application/ld+json
    blocks (single Product with an int price and a bool, an @graph
    envelope with two entities, a malformed block followed by a valid
    one, and a no-LD decoy flavor); the REAL parser
    (operators/structured_data.extract_jsonld) lifts them into flat
    (url, block, entity, type, key, value) rows and the oracle
    re-derives every row arithmetically from the residues — the JSON is
    never parsed twice."""
    from .operators.structured_data import extract_jsonld

    d = _t(spark, sf, "documents").select("doc_id")
    k = F.col("doc_id")
    ks = k.cast("string")
    url = F.concat(
        F.lit("https://"),
        F.when(k % 10 < 3, F.lit("host0")).otherwise(
            F.concat(F.lit("host"), (1 + k % 37).cast("string"))
        ),
        F.lit(".example/p/"), ks,
    )
    product = F.concat(
        F.lit('<script type="application/ld+json">{"@context":"https://schema.org",'
              '"@type":"Product","name":"Product '), ks,
        F.lit('","sku":"SKU-'), ks,
        F.lit('","price":'), (k % 997).cast("string"),
        F.lit(',"inStock":'), F.when(k % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
        F.lit(",\"agg\":{\"ratingValue\":5}}</script>"),
    )
    graph = F.concat(
        F.lit('<script type="application/ld+json">{"@context":"https://schema.org",'
              '"@graph":[{"@type":"Article","headline":"Title '), ks,
        F.lit('","wordCount":'), (k % 500).cast("string"),
        F.lit('},{"@type":"Person","name":"Author '), (k % 50).cast("string"),
        F.lit('"}]}</script>'),
    )
    broken_then_event = F.concat(
        F.lit('<script type="application/ld+json">{"@type":"Product","name":</script>'
              '<script type="application/ld+json">{"@type":"Event","name":"Event '),
        ks, F.lit('"}</script>'),
    )
    r = k % 4
    body = (
        F.when(r == 0, product)
        .when(r == 1, graph)
        .when(r == 2, broken_then_event)
        .otherwise(F.lit(""))  # r == 3: no JSON-LD at all
    )
    html = F.concat(
        F.lit("<!DOCTYPE html><html><head><script>var decoy = 1;</script>"),
        body,
        F.lit("</head><body><p>page</p></body></html>"),
    )
    pages = d.select(url.alias("url"), F.encode(html, "utf-8").alias("html"))
    return extract_jsonld(pages)


def q_microdata(spark, sf):  # HTML microdata (itemscope/itemprop) extraction
    """Third schema.org channel next to og_meta and jsonld_entities: pages
    built from doc_id residues carry a Product item (text/meta/href value
    sources), a Person with a NESTED PostalAddress (flattened as an
    'item:N' link row), an Article (time@datetime + img@src), and a decoy
    flavor whose stray itemprop has no itemscope (zero rows). The REAL
    tag-stack parser (operators/structured_data.extract_microdata) lifts
    them; the oracle re-states every row closed-form from the residues."""
    from .operators.structured_data import extract_microdata

    d = _t(spark, sf, "documents").select("doc_id")
    k = F.col("doc_id")
    ks = k.cast("string")
    url = F.concat(
        F.lit("https://"),
        F.when(k % 10 < 3, F.lit("host0")).otherwise(
            F.concat(F.lit("host"), (1 + k % 37).cast("string"))
        ),
        F.lit(".example/p/"), ks,
    )
    product = F.concat(
        F.lit('<div itemscope itemtype="https://schema.org/Product">'
              '<span itemprop="name">Widget '), ks,
        F.lit('</span><meta itemprop="sku" content="SKU-'), (k % 97).cast("string"),
        F.lit('"><a itemprop="url" href="/p/'), ks,
        F.lit('">link</a></div>'),
    )
    person = F.concat(
        F.lit('<div itemscope itemtype="https://schema.org/Person">'
              '<span itemprop="name">P '), (k % 50).cast("string"),
        F.lit('</span><div itemprop="address" itemscope'
              ' itemtype="https://schema.org/PostalAddress">'
              '<span itemprop="postalCode">'), (10000 + k % 900).cast("string"),
        F.lit("</span></div></div>"),
    )
    article = F.concat(
        F.lit('<div itemscope itemtype="https://schema.org/Article">'
              '<time itemprop="datePublished" datetime="2024-01-'),
        (1 + k % 28).cast("string"),
        F.lit('">posted</time><img itemprop="image" src="/img/'), ks,
        F.lit('.png"></div>'),
    )
    r = k % 4
    body = (
        F.when(r == 0, product)
        .when(r == 1, person)
        .when(r == 2, article)
        .otherwise(F.lit('<span itemprop="stray">ignored</span>'))
    )
    html = F.concat(
        F.lit("<!DOCTYPE html><html><body><p>page</p>"),
        body,
        F.lit("</body></html>"),
    )
    pages = d.select(url.alias("url"), F.encode(html, "utf-8").alias("html"))
    return extract_microdata(pages)


def q_dsir(spark, sf):  # DSIR importance weights (target = lang 'en')
    """Two-pass hashed-unigram importance estimator: bounded bucket counts
    -> integer milli-log-ratio literal -> zero-exchange integer scoring.
    The oracle recomputes BOTH the bucket models and the per-doc sums from
    scratch in DuckDB (portable poly-hash + ln floor-quantized at 1e-3)."""
    from .operators.dsir import dsir_weights

    d = _t(spark, sf, "documents").select(
        "doc_id", "lang", F.substring(F.col("text"), 1, 300).alias("text")
    )
    return dsir_weights(d, F.col("lang") == "en", n_buckets=64)


def q_registrable_domain(spark, sf):  # public-suffix eTLD+1 extraction
    """Hosts built from doc_id residues hit every PSL rule class (normal
    1/2-label, private hosting suffix, wildcard *.ck, exception !www.ck,
    bare-suffix host, unlisted TLD); the Spark side runs the spec's
    longest-match algorithm in Column algebra, the oracle states each
    case's answer closed-form — algorithm vs case table."""
    from .operators.urls import registrable_domain

    d = _t(spark, sf, "documents").select("doc_id")
    did = F.col("doc_id").cast("string")
    r = F.col("doc_id") % 8
    hosts = d.select(
        "doc_id",
        F.when(r == 0, F.concat(F.lit("a"), did, F.lit(".b.example.com")))
        .when(r == 1, F.concat(F.lit("shop"), did, F.lit(".co.uk")))
        .when(r == 2, F.concat(F.lit("www.blog"), did, F.lit(".blogspot.com")))
        .when(r == 3, F.concat(F.lit("u"), did, F.lit(".github.io")))
        .when(r == 4, F.lit("co.uk"))
        .when(r == 5, F.concat(F.lit("x"), did, F.lit(".w"), did, F.lit(".ck")))
        .when(r == 6, F.lit("www.ck"))
        .otherwise(
            F.concat(
                F.lit("m"), did, F.lit(".unlisted"), (F.col("doc_id") % 3).cast("string")
            )
        )
        .alias("host"),
    )
    return registrable_domain(hosts)


def q_unimax(spark, sf):  # UniMax source-mixture token allocation
    """Water-filling across the documents table's source column at budget
    = total_tokens // 2, epoch cap 2. Integer allocation; the oracle
    re-derives the closed form with its own window SQL, and pytest
    differential-tests the closed form against a loop reference."""
    from .operators.mixture import unimax_allocation

    return unimax_allocation(
        _t(spark, sf, "documents"), budget_divisor=2, max_epochs=2
    )


def q_alpha_mix(spark, sf):  # XLM alpha=0.5 temperature mixture sampling
    """Temperature sampling over the documents source column at alpha=1/2
    — chosen because IEEE requires sqrt correctly rounded, so the whole
    allocation is exact integer arithmetic both engines replay (weights
    floor(sqrt(tokens)), largest-remainder rounding, name tiebreak)."""
    from .operators.mixture import alpha_half_allocation

    return alpha_half_allocation(_t(spark, sf, "documents"), budget_divisor=2)


def q_soft404_html(spark, sf):  # soft-404 detection from raw HTML
    """Synthetic pages constructed per doc_id residue: k%5 picks the
    error shape (404 title / error-prose body / healthy long body /
    thin-but-honest / Error-in-title), k%11==0 answers a HARD 404 status.
    The operator must parse its way to EXACTLY the closed-form case table
    the oracle states directly (robots_filter-style independent
    derivation).  Complements `soft404`, which runs on already-extracted
    (title, text) columns."""
    from .operators.corpus_filters import soft404_from_html

    d = _t(spark, sf, "documents")
    k = F.col("doc_id")
    ks = k.cast("string")
    url = F.concat(F.lit("https://h"), (k % 10).cast("string"), F.lit(".example/p/"), ks)
    status = F.when(k % 11 == 0, F.lit(404)).otherwise(F.lit(200))
    filler = F.repeat(F.concat(F.lit("word"), ks, F.lit(" ")), 40)
    html = (
        F.when(
            k % 5 == 0,
            F.concat(
                F.lit("<html><head><title>404 Not Found</title></head><body>gone "),
                ks,
                F.lit("</body></html>"),
            ),
        )
        .when(
            k % 5 == 1,
            F.concat(
                F.lit("<html><head><title>Doc "),
                ks,
                F.lit("</title></head><body>The page you requested does not exist.</body></html>"),
            ),
        )
        .when(
            k % 5 == 2,
            F.concat(
                F.lit("<html><head><title>Doc "),
                ks,
                F.lit("</title></head><body>"),
                filler,
                F.lit("</body></html>"),
            ),
        )
        .when(
            k % 5 == 3,
            F.concat(F.lit("<html><body>short note "), ks, F.lit("</body></html>")),
        )
        .otherwise(
            F.concat(
                F.lit("<html><head><title>Server Error</title></head><body>"),
                filler,
                F.lit("</body></html>"),
            )
        )
    )
    pages = d.select(url.alias("url"), status.alias("status"), html.alias("html"))
    return soft404_from_html(pages)


def q_line_langid(spark, sf):  # per-line language segmentation
    """Multilingual pages constructed per doc_id residue: an English
    first line always; a French line at k%2==0, a German line at k%3==0,
    a blank line at k%4==0 (must be dropped but still consume a line
    number), a digits-only 'und' line at k%5==0.  All markers sit
    interior with real spaces so the doc-level vote sees every language;
    ties resolve to 'en' by CASE order, so doc_lang == 'en' everywhere
    and divergence flags exactly the non-English lines.  The oracle
    builds the same line table closed-form with residue-derived line
    numbers."""
    from .operators.text_analysis import line_langid

    d = _t(spark, sf, "documents")
    k = F.col("doc_id")
    ks = k.cast("string")
    lines = F.array_compact(
        F.array(
            F.concat(F.lit("the cat and dog of note "), ks),
            F.when(k % 2 == 0, F.concat(F.lit("x le chien et la maison "), ks)),
            F.when(k % 3 == 0, F.lit("y der hund und die katze")),
            F.when(k % 4 == 0, F.lit("   ")),
            F.when(k % 5 == 0, F.lit("12345 67890")),
        )
    )
    docs = d.select("doc_id", F.array_join(lines, "\n").alias("text"))
    return line_langid(docs)


def q_bitext(spark, sf):  # ParaCrawl-style bitext candidate mining
    """Five language editions per article group (doc_id residues) share a
    path modulo the lang segment; the operator strips the segment via
    regex and self-joins, the oracle constructs the ordered pair table
    closed-form (no regex) — two independent derivations."""
    from .operators.urls import bitext_candidates

    d = _t(spark, sf, "documents").select("doc_id")
    code = (
        F.when(F.col("doc_id") % 5 == 0, "en")
        .when(F.col("doc_id") % 5 == 1, "fr")
        .when(F.col("doc_id") % 5 == 2, "de")
        .when(F.col("doc_id") % 5 == 3, "es")
        .otherwise("zh")
    )
    g = (F.col("doc_id") - F.col("doc_id") % 5).cast("string")
    pages = d.select(
        F.concat(
            F.lit("https://host"),
            ((F.col("doc_id") - F.col("doc_id") % 5) % 7).cast("string"),
            F.lit(".example/"),
            code,
            F.lit("/article"),
            g,
        ).alias("url"),
        code.alias("lang"),
    )
    return bitext_candidates(pages)


def q_ccnet_buckets(spark, sf):  # CCNet head/middle/tail terciles
    """Tie-safe tercile labels from the integer milli-fluency score; the
    oracle re-derives the score, the bounded strictly-above cumulative,
    and the thresholds with its own SQL."""
    from .operators.corpus_filters import ccnet_buckets

    d = _t(spark, sf, "documents")
    return ccnet_buckets(
        d.select("doc_id", F.substring(F.col("text"), 1, 300).alias("text"))
    )


def q_gopher_rules(spark, sf):  # full Gopher quality rule set (Table A1)
    """Word-count / mean-length / symbol / bullet / ellipsis / alpha /
    stop-word signals + the combined passes verdict. The oracle re-derives
    every signal from the raw text with DuckDB list functions. Thresholds
    are loosened to the synthetic corpus range so both verdict branches
    occur."""
    from .operators.corpus_filters import gopher_rules

    return gopher_rules(
        _t(spark, sf, "documents").select("doc_id", "text"),
        min_words=30,
        min_mean_len=2.0,
        max_mean_len=8.0,
    )


def q_bloom_prefilter(spark, sf):  # semi-join-reduction frontier dedup
    """Deterministic Bloom prefilter: the 'already crawled' build side is
    the doc_id%3==0 url subset; every url probes the bit set. The oracle
    re-derives all k salted hash positions, the distinct bit table, AND
    every candidate verdict in DuckDB — bit-exact, including any false
    positives (m=4096 is sized so they can occur and must match)."""
    from .operators.bloom import bloom_bits, bloom_probe

    d = _t(spark, sf, "documents").select("doc_id")
    urls = d.select(
        "doc_id",
        F.concat(
            F.lit("https://host"),
            (F.col("doc_id") % 10).cast("string"),
            F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    crawled = urls.where(F.col("doc_id") % 3 == 0)
    bits = bloom_bits(crawled, m_bits=4096, k=3)
    return bloom_probe(urls, bits, m_bits=4096, k=3)


def q_meta_robots(spark, sf):  # page-level opt-out flags from html bytes
    """Meta-robots tags (quoted/unquoted/uppercase/none-alias/multi-tag/
    decoy-name variants from doc_id residues) are PARSED from real html
    bytes; the oracle states each case's flags closed-form."""
    from .operators.robots import meta_robots_flags

    d = _t(spark, sf, "documents").select("doc_id")
    r = F.col("doc_id") % 6
    meta = (
        F.when(r == 1, F.lit('<meta name="robots" content="noindex, nofollow">'))
        .when(r == 2, F.lit("<meta name=robots content=\"NOAI\">"))
        .when(r == 3, F.lit('<meta name="robots" content="none">'))
        .when(
            r == 4,
            F.lit(
                '<meta name="robots" content="noarchive">'
                '<meta name="robots" content="nosnippet">'
            ),
        )
        .when(r == 5, F.lit('<meta name="viewport" content="noindex">'))
        .otherwise(F.lit(""))
    )
    pages = d.select(
        "doc_id",
        F.encode(
            F.concat(
                F.lit("<html><head>"),
                meta,
                F.lit("</head><body><p>doc "),
                F.col("doc_id").cast("string"),
                F.lit("</p></body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
    )
    return meta_robots_flags(pages).drop("html")


def q_domain_split(spark, sf):  # leakage-safe train/val/test by eTLD+1
    """Split assignment hashes the registrable domain (not the url), so
    same-site pages can never straddle splits; the oracle re-derives the
    domain closed-form AND recomputes the portable hash + thresholds in
    SQL."""
    from .operators.urls import leakage_safe_split

    d = _t(spark, sf, "documents").select("doc_id")
    did = F.col("doc_id").cast("string")
    r = F.col("doc_id") % 8
    hosts = d.select(
        "doc_id",
        F.when(r == 0, F.concat(F.lit("a"), did, F.lit(".b.example.com")))
        .when(r == 1, F.concat(F.lit("shop"), did, F.lit(".co.uk")))
        .when(r == 2, F.concat(F.lit("www.blog"), did, F.lit(".blogspot.com")))
        .when(r == 3, F.concat(F.lit("u"), did, F.lit(".github.io")))
        .when(r == 4, F.lit("co.uk"))
        .when(r == 5, F.concat(F.lit("x"), did, F.lit(".w"), did, F.lit(".ck")))
        .when(r == 6, F.lit("www.ck"))
        .otherwise(
            F.concat(
                F.lit("m"), did, F.lit(".unlisted"), (F.col("doc_id") % 3).cast("string")
            )
        )
        .alias("host"),
    )
    return leakage_safe_split(hosts)


def q_domain_prior(spark, sf):  # site-level quality prior by eTLD+1
    """12 synthetic sites across three PSL suffix classes group the
    corpus; the oracle re-derives domain, integer quality, prior, and
    delta entirely in SQL."""
    from .operators.urls import domain_quality_prior

    d = _t(spark, sf, "documents").select("doc_id", "text")
    m = (F.col("doc_id") % 12).cast("string")
    suffix = (
        F.when(F.col("doc_id") % 12 % 3 == 0, F.lit(".com"))
        .when(F.col("doc_id") % 12 % 3 == 1, F.lit(".co.uk"))
        .otherwise(F.lit(".github.io"))
    )
    sub = F.when(
        F.col("doc_id") % 2 == 0, F.lit("www.")
    ).otherwise(F.concat(F.lit("sub"), F.col("doc_id").cast("string"), F.lit(".")))
    hosts = d.select(
        "doc_id",
        "text",
        F.concat(sub, F.lit("site"), m, suffix).alias("host"),
    )
    return domain_quality_prior(hosts)


def q_video_frames(spark, sf):  # REAL AVI container decode -> frame rows
    """Raw-DIB AVI blobs (3-5 uniform 8x6 frames, per-frame value from
    doc_id residues) are ENCODED to real RIFF/AVI bytes and DECODED back
    through kernels/avicodec.py with every-2nd-frame sampling; the oracle
    computes the sampled frame set and pixel sums closed-form."""
    from .operators.multimodal import video_frames

    d = _t(spark, sf, "documents").select("doc_id")

    def build(batches):
        import numpy as np
        import pandas as pd

        from ocr_spark.kernels.avicodec import avi_encode

        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 3 + did % 3
                frames = [
                    np.full((6, 8, 3), (did * 7 + 31 * i) % 256, dtype=np.uint8)
                    for i in range(n)
                ]
                blobs.append(avi_encode(frames, fps=10))
            yield pd.DataFrame(
                {"blob_id": pdf["doc_id"].astype("int64"), "blob": blobs}
            )

    blobs = d.mapInPandas(build, schema="blob_id long, blob binary")
    return video_frames(blobs, every_k=2)


def q_video_meta(spark, sf):  # MP4/WebM container metadata probe
    """MP4 atoms / WebM EBML built from doc_id residues are probed back
    through the decode-free container walk (kernels/containerprobe.py ->
    operators/multimodal.video_meta): one row per track with duration /
    timescale / codec / dimensions. The oracle re-derives every field
    closed-form from the residues — the metadata half of the reference's
    ffmpeg reader surface (utils/image/video/ffmpeg_reader.py:1-214)
    without paying a codec decode (VERDICT r04 #7)."""
    from .operators.multimodal import video_meta

    d = _t(spark, sf, "documents").select("doc_id")

    def build(batches):
        import pandas as pd

        from ocr_spark.kernels.containerprobe import mp4_build, webm_build

        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 160 * (1 + did % 4), 90 * (1 + did % 4)
                tracks = [
                    {
                        "track_type": "video",
                        "codec": (
                            ("hev1" if did % 3 == 0 else "avc1")
                            if did % 2 == 0
                            else ("V_VP8" if did % 3 == 0 else "V_VP9")
                        ),
                        "width": w,
                        "height": h,
                    }
                ]
                if did % 3 == 0:
                    tracks.append(
                        {
                            "track_type": "audio",
                            "codec": "mp4a" if did % 2 == 0 else "A_OPUS",
                        }
                    )
                if did % 2 == 0:
                    blobs.append(
                        mp4_build(
                            major_brand="mp42" if did % 5 == 0 else "isom",
                            timescale=600 + 100 * (did % 3),
                            duration_ticks=600 + 37 * (did % 50),
                            tracks=tracks,
                        )
                    )
                else:
                    blobs.append(
                        webm_build(
                            timecode_scale=1_000_000,
                            duration_ticks=1000 + 37 * (did % 50),
                            tracks=tracks,
                        )
                    )
            yield pd.DataFrame(
                {"blob_id": pdf["doc_id"].astype("int64"), "blob": blobs}
            )

    blobs = d.mapInPandas(build, schema="blob_id long, blob binary")
    return video_meta(blobs)


def q_vtt_cues(spark, sf):  # WebVTT subtitle parse -> integer-ms cue rows
    """Synthetic .vtt bodies (header, NOTE block, cue ids, multi-line
    payloads — all from doc_id residues) are FORMATTED as real WebVTT text
    and PARSED back by kernels/vtt.py; the oracle computes every cue
    closed-form."""
    from .operators.multimodal import vtt_cues

    d = _t(spark, sf, "documents").select("doc_id")

    def build(batches):
        import pandas as pd

        for pdf in batches:
            bodies = []
            for did in pdf["doc_id"]:
                did = int(did)
                parts = ["WEBVTT", "", "NOTE synthetic corpus", ""]
                for k in range(2 + did % 3):
                    start = 1000 + 153 * (did % 10) + 2000 * k
                    end = start + 400 + 10 * k
                    parts.append(f"c{k}")  # cue id line (skipped by parser)
                    parts.append(
                        f"00:{start // 1000:02d}.{start % 1000:03d} --> "
                        f"00:{end // 1000:02d}.{end % 1000:03d}"
                    )
                    parts.append(f"cue {k} of doc {did}")
                    if k == 0:
                        parts.append("continued")
                    parts.append("")
                bodies.append("\n".join(parts))
            yield pd.DataFrame(
                {"blob_id": pdf["doc_id"].astype("int64"), "vtt": bodies}
            )

    vtt = d.mapInPandas(build, schema="blob_id long, vtt string")
    return vtt_cues(vtt)


def q_audio_features(spark, sf):  # REAL WAV decode -> integer features
    """Square-wave WAV blobs (amplitude / half-period / length / rate /
    channel count from doc_id residues) are ENCODED to real RIFF bytes and
    DECODED back through kernels/wavcodec.py; the oracle computes every
    feature closed-form from the residues — the audio analog of pixel_ocr's
    build-then-actually-decode identity."""
    from .operators.multimodal import audio_features

    d = _t(spark, sf, "documents").select("doc_id")

    def build(batches):
        import numpy as np
        import pandas as pd

        from ocr_spark.kernels.wavcodec import wav_encode

        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                did = int(did)
                a = 500 * (1 + did % 3)
                half = 4 + did % 4
                n = 256 + 16 * (did % 5)
                rate = 8000 + 1000 * (did % 2)
                i = np.arange(n)
                ch0 = np.where((i // half) % 2 == 0, a, -a).astype(np.int32)
                s = (
                    np.stack([ch0, np.zeros_like(ch0)], axis=1)
                    if did % 7 == 0
                    else ch0
                )
                blobs.append(wav_encode(s, rate))
            yield pd.DataFrame(
                {"blob_id": pdf["doc_id"].astype("int64"), "blob": blobs}
            )

    blobs = d.mapInPandas(build, schema="blob_id long, blob binary")
    return audio_features(blobs)


def _residue_wav_blobs(spark, sf):
    """The shared 650-sample WAV corpus of the audio family (audio_dups /
    audio_spectral / audio_gate — ONE builder so the three queries and
    the shared _SFP_SAMPLE_SQL / afp oracle formulas can never drift):
    closed-form pseudo-random PCM from doc_id residues, doc_id % 10 == 5
    clips perturb the first 5 samples of doc_id - 5 by +500."""
    d = _t(spark, sf, "documents").select("doc_id").where(F.col("doc_id") < 2000)

    def build(batches):
        import numpy as np
        import pandas as pd

        from ocr_spark.kernels.wavcodec import wav_encode

        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                did = int(did)
                src = did - 5 if did % 10 == 5 else did
                i = np.arange(650, dtype=np.int64)
                s = ((src + 1) * (i * 17 + 31)) % 2001 - 1000
                if did % 10 == 5:
                    s = s.copy()
                    s[:5] += 500
                blobs.append(wav_encode(s.astype(np.int32), 8000))
            yield pd.DataFrame(
                {"blob_id": pdf["doc_id"].astype("int64"), "blob": blobs}
            )

    return d.mapInPandas(build, schema="blob_id long, blob binary")


def q_audio_dups(spark, sf):  # audio near-dup pairs (energy fingerprint)
    """650-sample 16-bit WAVs with closed-form pseudo-random PCM are
    encoded/decoded through kernels/wavcodec.py (exact int16 round trip),
    fingerprinted (operators/multimodal.afp64), and paired via the same
    Manku banding as text SimHash and image dHash; doc_id % 10 == 5 clips
    perturb the first 5 samples of doc_id - 5 (<= 2 bits).  The oracle
    re-derives every energy, hash, and pair from the residue formula."""
    from .operators.dedup import hamming_near_pairs
    from .operators.multimodal import audio_fingerprint

    sig = audio_fingerprint(_residue_wav_blobs(spark, sf))
    return hamming_near_pairs(
        sig, sig_col="afp", id_col="blob_id", max_hamming=3, n_blocks=4
    )


def q_audio_spectral(spark, sf):  # audio near-dup pairs (spectral fingerprint)
    """The SAME WAV corpus as audio_dups fingerprinted in the FREQUENCY
    domain (kernels/stft.sfp64 — integer STFT band energies over
    fixed-point twiddle tables, exact arbitrary-precision squares) and
    paired through the shared Manku banding. The +500 perturbation of
    doc_id % 10 == 5 clips touches samples 0-4 only — frame 0 of the
    8x64 STFT — so the spectral hamming is <= 8 BY CONSTRUCTION (bits
    0-7); n_blocks=16 keeps the pigeonhole recall guarantee at that
    radius. The oracle re-derives every PCM sample, twiddle product
    (the tables are embedded as SQL literals, the _PHASH_COS pattern),
    band energy, comparison bit, and pair in HUGEINT."""
    from .operators.dedup import hamming_near_pairs
    from .operators.multimodal import audio_spectral_fingerprint

    sig = audio_spectral_fingerprint(_residue_wav_blobs(spark, sf))
    return hamming_near_pairs(
        sig, sig_col="sfp", id_col="blob_id", max_hamming=8, n_blocks=16
    )


def q_audio_mel(spark, sf):  # integer mel-filterbank energies (MelSTFT analog)
    """The shared WAV corpus through the integer mel front-end
    (kernels/stft.mel_energies — the reference MelSTFT surface on the
    power spectrum): 32-bin STFT, 8 quantized HTK mel triangles, all
    int64. The oracle re-derives PCM, the 32-bin twiddle products,
    quantized powers, and every weighted mel sum — both twiddle AND
    mel-weight tables ride as SQL literals (the shared-table /
    independent-derivation pattern of _PHASH_COS)."""
    from .operators.multimodal import audio_mel

    return audio_mel(_residue_wav_blobs(spark, sf))


def q_srt_align(spark, sf):  # SRT subtitle parse + speaker-join alignments
    """Synthetic .srt bodies (1-3 PAIRS of cues per doc from doc_id
    residues; within a pair the 100 ms gap is under the 300 ms join
    threshold, between pairs the 2.2 s gap is over it) are FORMATTED as
    real SRT text and parsed back by kernels/srt.parse_srt — the
    reference's parse_subtitles join/add_time flow
    (utils/audio/mkv_utils.py:123-180) in integer ms. Gap margins are
    sized so every alignment is closed-form: start = pair_base - 500,
    end = pair_base + 2300, text = the two cues joined — the oracle
    re-derives all of them without replaying the sequential loop."""
    from .operators.multimodal import srt_alignments

    d = _t(spark, sf, "documents").select("doc_id")

    def build(batches):
        import pandas as pd

        def ts(ms):
            return (
                f"{ms // 3600000:02d}:{ms // 60000 % 60:02d}:"
                f"{ms // 1000 % 60:02d},{ms % 1000:03d}"
            )

        for pdf in batches:
            bodies = []
            for did in pdf["doc_id"]:
                did = int(did)
                off = 7 * (did % 50)
                lines = []
                idx = 0
                for j in range(1 + did % 3):
                    base = 1000 + 4000 * j + off
                    for k, (s, e) in enumerate(
                        ((base, base + 900), (base + 1000, base + 1800))
                    ):
                        idx += 1
                        lines.append(str(idx))
                        lines.append(f"{ts(s)} --> {ts(e)}")
                        lines.append(f"cue {2 * j + k} of doc {did}")
                        lines.append("")
                bodies.append("\n".join(lines))
            yield pd.DataFrame(
                {"blob_id": pdf["doc_id"].astype("int64"), "srt": bodies}
            )

    srt = d.mapInPandas(build, schema="blob_id long, srt string")
    return srt_alignments(srt, join_threshold_ms=300, add_time_ms=500)


def q_audio_gate(spark, sf):  # spectral-gating noise mask (reduce_noise analog)
    """The same WAV corpus through feature-level spectral gating
    (kernels/stft.spectral_gate — the reference's
    utils/audio/noisereducev1.py:175-290 semantics made integer-exact):
    frames 0-3 calibrate per-band noise statistics, every signal-frame
    bin reports (energy_q, kept) where kept tests mean + 1.5*std with no
    sqrt (den^2*d^2 > num^2*(nQ - S^2) on the sign-guarded side). The
    oracle re-derives PCM, twiddle products, quantized energies, noise
    stats, and every mask bit in HUGEINT."""
    from .operators.multimodal import audio_spectral_gate

    return audio_spectral_gate(_residue_wav_blobs(spark, sf))


def q_video_dups(spark, sf):  # video near-dup pairs (majority-vote frame dHash)
    """7-frame 8x9 grayscale AVIs (raw-DIB frames — exact byte round
    trip through kernels/avicodec.py) built closed-form from doc_id
    residues are decoded, per-frame dHashed, majority-pooled into a
    64-bit video fingerprint (operators/multimodal.vfp64), and paired
    via the SAME Manku banding as text SimHash / image dHash / audio
    afp64 — completing the near-dup family across all four modalities.
    doc_id % 10 == 5 videos perturb pixel (0,0) of EVERY frame of
    doc_id - 5 (a global overlay edit: flips at most the (0,0)
    comparison in each frame, so vfp hamming <= 1 by construction).
    The oracle re-derives every gray level, frame bit, majority vote,
    and pair from the residue formula."""
    from .operators.dedup import hamming_near_pairs
    from .operators.multimodal import video_fingerprint

    d = _t(spark, sf, "documents").select("doc_id").where(F.col("doc_id") < 2000)

    def build(batches):
        import numpy as np
        import pandas as pd

        from ocr_spark.kernels.avicodec import avi_encode

        r = np.arange(8)[:, None]
        c = np.arange(9)[None, :]
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                did = int(did)
                src = did - 5 if did % 10 == 5 else did
                frames = []
                for f in range(7):
                    # quadratic column term: a LINEAR c coefficient makes
                    # gray(c+1) - gray(c) constant per row, so whole rows of
                    # comparisons flip together and unrelated videos collide
                    base = (src + 1) * (r * 131 + c * c * 29 + c * 31 + 7) + (
                        f + 1
                    ) * (r * 59 + c * 17 + 11)
                    if did % 10 == 5:
                        base = base.copy()
                        base[0, 0] += 40
                    g = (base % 256).astype(np.uint8)
                    frames.append(np.stack([g, g, g], axis=-1))
                blobs.append(avi_encode(frames))
            yield pd.DataFrame(
                {"blob_id": pdf["doc_id"].astype("int64"), "blob": blobs}
            )

    vids = d.mapInPandas(build, schema="blob_id long, blob binary")
    sig = video_fingerprint(vids).drop("n_frames")
    return hamming_near_pairs(
        sig, sig_col="vfp", id_col="blob_id", max_hamming=3, n_blocks=4
    )


def q_cdc_chunks(spark, sf):  # content-defined chunking storage dedup
    """LBFS/FastCDC-style payload chunking (kernels/cdc.py): cubic-residue
    payloads (aperiodic mod 126, 192-432 bytes) are cut wherever the
    trailing-8-byte polynomial hash is divisible by 64; doc_id % 10 == 5
    payloads prepend a 16-byte edit to doc_id - 5's bytes, so chunk
    hashes REALIGN after the first shared boundary — the content-defined
    property fixed-size blocks lack.  One Arrow chunking stage + one
    window exchange on the uniformly-distributed chunk hash for reference
    counts.  The oracle re-derives every byte, window hash, cut, md5, and
    ref count from the residue formula with DuckDB list algebra."""
    from .operators import cdc as cdc_ops

    d = _t(spark, sf, "documents").select("doc_id").where(F.col("doc_id") < 1500)

    def build(batches):
        import pandas as pd

        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                did = int(did)
                src = did - 5 if did % 10 == 5 else did
                L = 192 + (src % 5) * 48
                base = bytes(
                    ((src + 1) * (i * i * i + 5 * i + 11)) % 9973 % 126 + 1
                    for i in range(L)
                )
                if did % 10 == 5:
                    base = (
                        bytes((did * 37 + i * 11 + 5) % 126 + 1 for i in range(16))
                        + base
                    )
                blobs.append(base)
            yield pd.DataFrame(
                {"blob_id": pdf["doc_id"].astype("int64"), "blob": blobs}
            )

    blobs = d.mapInPandas(build, schema="blob_id long, blob binary")
    return cdc_ops.chunk_refs(cdc_ops.payload_chunks(blobs))


def q_unigram_segment(spark, sf):  # unigram-LM subword tokenization
    """SentencePiece-unigram segmentation (Kudo 2018) with exact integer
    Viterbi over a literal milli-log-prob vocab: corpus words (lowercased
    a-z tokens, len 1..10) unioned with closed-form synthetic words built
    from doc_id residues (the corpus vocabulary alone is tiny).  The
    oracle enumerates ALL 2^(L-1) cut masks per word in DuckDB list
    algebra and must land on the identical (score, smallest-mask)
    optimum — the strongest possible check of the DP's tie-break."""
    from .operators.tokenize import unigram_segment_table

    return unigram_segment_table(_segment_words(spark, sf))


def _segment_words(spark, sf):
    """Shared word table for the subword-tokenizer queries: corpus words
    (lowercased a-z tokens, len 1..10) unioned with closed-form synthetic
    words built from doc_id residues (the corpus vocabulary alone is
    tiny). The oracles re-derive the identical set in SQL."""
    d = _t(spark, sf, "documents")
    corpus = (
        d.where(F.col("doc_id") < 2000)
        .select(
            F.explode(
                F.split(F.regexp_replace(F.lower("text"), "[^a-z]+", " "), " ")
            ).alias("word")
        )
        .where((F.length("word") >= 1) & (F.length("word") <= 10))
    )
    synth = d.where(F.col("doc_id") < 2000).select(
        F.expr(
            "array_join(transform(sequence(0, 2 + CAST(doc_id % 8 AS INT)), "
            "j -> chr(97 + CAST(((doc_id + 1) * (j * j * 7 + j * 3 + 1) "
            "+ (doc_id div 26) * (j + 1)) % 26 AS INT))"
            "), '') "
        ).alias("word")
    )
    return corpus.union(synth).distinct()


def q_wordpiece(spark, sf):  # WordPiece subword tokenization (BERT)
    """Greedy longest-match-first WordPiece (Wu et al. 2016) over the
    literal WORDPIECE_VOCAB, on the same word table as unigram_segment.
    Greedy longest-match is decision-free (at most one vocab entry of a
    given length can match a position), so the oracle replays the scan
    with unrolled longest-match join steps in DuckDB and must produce
    the identical piece sequence — including the all-or-nothing [UNK]
    rule for words touching the vocab's letter holes."""
    from .operators.tokenize import wordpiece_segment_table

    return wordpiece_segment_table(_segment_words(spark, sf))


def q_readability(spark, sf):  # Flesch / FK-grade readability gate
    """Integer-exact readability (text_analysis.readability_scores):
    sentence segments, a-z word tokens, heuristic vowel-run syllables,
    then Flesch reading ease and FK grade as single-step BIGINT floor
    divisions in micro-units.  Pure Column program, zero exchanges; the
    oracle re-derives every count and both scores with the same list
    algebra in DuckDB."""
    from .operators.text_analysis import readability_scores

    return readability_scores(_t(spark, sf, "documents"))


def q_blocklist(spark, sf):  # Aho-Corasick keyword-blocklist gate
    """Multi-pattern blocklist over lower(text) with planted spam
    suffixes (doc_id % 7 == 3 gets 'click here to bet now winner',
    % 7 == 5 gets 'xxxx casino lottery' — the xxxx yields TWO
    overlapping 'xxx' matches, pinning the all-occurrences semantics).
    One Aho-Corasick Arrow stage, zero exchanges; the oracle rescans
    every pattern at every position with substring equality."""
    from .operators.corpus_filters import blocklist_flags

    d = _t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 3, F.lit(" click here to bet now winner")
            )
            .when(F.col("doc_id") % 7 == 5, F.lit(" xxxx casino lottery"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return blocklist_flags(d)


def q_shuffle_shards(spark, sf):  # deterministic training-shard shuffle
    """Reproducible corpus permutation + hash sharding (the training-
    export tail): overflow-safe multiplicative-hash key, shard = key %
    n, per-shard rank.  ONE exchange; the oracle replays the identical
    integer arithmetic and window."""
    from .operators.corpus_filters import shuffle_shards

    return shuffle_shards(_t(spark, sf, "documents"))


_CT_MARKS = {
    "en": "the and of",
    "fr": "le la et",
    "de": "der und die",
    "es": "el los que",
    "zh": "de shi bu le",
}


def q_ct_langid(spark, sf):  # Cavnar-Trenkle n-gram language ID
    """Trained rank-profile language ID (Cavnar & Trenkle 1994): letter
    bigram counts -> per-language top-20 rank profiles (trained from the
    corpus itself, two bounded aggs) -> out-of-place distance argmin.
    The synthetic corpus text carries no language signal, so each doc
    gets its language's marker phrase planted 3x — the classifier then
    has real signal and the pytest asserts accuracy.  Profiles and the
    language list are broadcast (bounded model tables); per-doc work
    exchanges on doc_id only.  The oracle replays every gram, count,
    rank, distance, and tie-break."""
    from .operators.text_analysis import ct_classify

    mark = F.create_map(
        *[F.lit(x) for kv in _CT_MARKS.items() for x in kv]
    )[F.col("lang")]
    d = _t(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.concat_ws(" ", F.col("text"), mark, mark, mark).alias("text"),
    )
    return ct_classify(d)


def q_sort_boxes_sql(spark, sf):  # W7 SQL-expressible orderings
    b = _synth_boxes(spark, sf)
    corner = Window.partitionBy("url").orderBy(
        (F.col("x0") + F.col("y0")).asc(), F.col("box_id").asc()
    )
    area = Window.partitionBy("url").orderBy(
        ((F.col("x1") - F.col("x0")) * (F.col("y1") - F.col("y0"))).desc(),
        F.col("box_id").asc(),
    )
    center = Window.partitionBy("url").orderBy(
        ((F.col("x0") + F.col("x1")) / 2 + (F.col("y0") + F.col("y1")) / 2).asc(),
        F.col("box_id").asc(),
    )
    return b.select(
        "url",
        "box_id",
        F.row_number().over(corner).alias("corner_rank"),
        F.row_number().over(area).alias("area_rank"),
        F.row_number().over(center).alias("center_rank"),
    )


# --------------------------------------------------------------------------
# rows-only queries (non-SQL-expressible kernels / pipeline)
# --------------------------------------------------------------------------

def q_supplier_geo(spark, sf):  # snowflake dim chain: two broadcast joins
    """supplier ⋈ nation ⋈ region rollup — the star/snowflake dimension
    shape: both dims broadcast, single partial+final agg, no fact shuffle."""
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum(F.col("s_acctbal").cast("decimal(18,2)")).cast("double").alias("sum_acctbal"),
            F.round(F.min("s_acctbal"), 2).alias("min_acctbal"),
            F.round(F.max("s_acctbal"), 2).alias("max_acctbal"),
        )
    )


def q_revenue_topk(spark, sf):  # broadcast dim join + SMJ fact join + agg + top-k
    """TPC-H Q3-flavored: the canonical big-join shape at 100 TB — the
    filtered customer dim is broadcast (no shuffle of the fact side for it),
    orders⋈lineitem shuffles on the join key, aggregation is partial+final,
    top-k is a global sort-limit. Revenue sums go through decimal(18,4) so
    both engines add exactly."""
    c = _t(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_orderpriority", "revenue")
    )


def q_flagship_extract(spark, sf):
    return extract_pages(pages_df(spark, sf)).select(
        "url", "lang", "title", "n_spans", F.length("text").alias("n_chars")
    )


def q_host_stats(spark, sf):  # per-host crawl rollup (politeness/skew audit)
    """The audit table a crawl operator reads before picking salt targets:
    per host, doc counts and payload-kind mix. The Spark side parses urls
    and sniffs REAL page bytes (magic numbers); the oracle re-derives the
    same facts from the corpus construction arithmetic (doc_id residues) —
    two independent derivations that must agree row-for-row."""
    from .plans.pipeline import _HOST_RE

    pages = pages_df(spark, sf)
    is_pdf = F.expr("substring(html, 1, 5) = X'255044462D'")  # %PDF-
    is_img = F.expr(
        "substring(html, 1, 4) = X'89504E47' OR substring(html, 1, 2) = X'FFD8'"
    )
    is_payload = F.expr("substring(html, 1, 12) = X'254F43525041594C4F414425'")
    return (
        pages.select(
            F.regexp_extract("url", _HOST_RE, 1).alias("host"),
            is_pdf.cast("int").alias("pdf"),
            is_img.cast("int").alias("img"),
            is_payload.cast("int").alias("pay"),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("pdf").cast("long").alias("n_pdf"),
            F.sum("img").cast("long").alias("n_image"),
            F.sum("pay").cast("long").alias("n_payload"),
        )
    )


def q_charset_sniff(spark, sf):  # BOM/meta charset detection over pages
    """Per-page charset report (kernels/encoding.py): the corpus carries
    windows-1252+meta and UTF-16-LE+BOM HTML flavors, so every sniff
    source (bom/meta/utf8) appears; deterministic -> fixture oracle."""
    from .operators.extract import sniff_charsets

    return sniff_charsets(pages_df(spark, sf))


def q_pdf_extract(spark, sf):  # D9/S5: real PDF byte-parsing route (round 2)
    """Only the %PDF- pages of the corpus, through the byte-level parser
    (kernels/pdf_parse.py) and the W8/W9 layout kernels; sha256(text) makes
    the fixture oracle byte-exact."""
    pages = pages_df(spark, sf).where(
        F.expr("substring(html, 1, 5) = X'255044462D'")
    )
    return extract_pages(pages).select(
        "url",
        "title",
        "n_spans",
        F.length("text").alias("n_chars"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
    )


def q_minhash_pairs(spark, sf):
    return dedup_ops.minhash_lsh_pairs(_t(spark, sf, "documents"))


def q_simhash_pairs(spark, sf):
    return dedup_ops.simhash_near_pairs(_t(spark, sf, "documents"))


def q_ivf_ann(spark, sf):
    e = _t(spark, sf, "embeddings")
    return sim_ops.ivf_topk(e, e.where(F.col("vec_id") < 5), k=5)


def q_normalize_numbers(spark, sf):  # F5 number verbalization cleaner
    from .operators.pudf import normalize_numbers_udf

    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        normalize_numbers_udf(F.substring("text", 1, 80)).alias("head_verbalized"),
    )


def q_lsh_ann(spark, sf):
    e = _t(spark, sf, "embeddings")
    return sim_ops.lsh_bucket_topk(e, e.where(F.col("vec_id") < 5), k=5)


def _synth_boxes(spark, sf):
    """Deterministic word-box table derived from lineitem (structured grid
    so the combine kernels have real lines/paragraphs to find)."""
    li = _t(spark, sf, "lineitem").where(F.col("l_orderkey") % 50 == 0)
    return li.select(
        F.concat(F.lit("doc"), F.col("l_orderkey")).alias("url"),
        # composite id: strides sized so (linenumber, partkey, suppkey) can
        # never collide (partkey < 1e5, suppkey < 1e3 at the tested scales);
        # stays bigint — an int cast would overflow under ANSI at large sf
        (
            F.col("l_linenumber") * 100000000
            + F.col("l_partkey") * 1000
            + F.col("l_suppkey")
        ).alias("box_id"),
        # integer-valued pixel boxes: every coordinate, sum and product is an
        # exact double, so rank comparisons can never hinge on last-ulp
        # differences between engines (ties are exact -> box_id tie-break)
        ((10 + (F.col("l_linenumber") % 4) * 25).cast("double")).alias("x0"),
        ((20 + (F.col("l_partkey") % 6) * 12).cast("double")).alias("y0"),
        ((10 + (F.col("l_linenumber") % 4) * 25 + 8 + F.col("l_suppkey") % 5).cast("double")).alias("x1"),
        ((20 + (F.col("l_partkey") % 6) * 12 + 3 + F.col("l_partkey") % 7).cast("double")).alias("y1"),
        (F.col("l_quantity") / 50.0).alias("score"),
    )


def q_combine_boxes(spark, sf):
    return combine_boxes_grouped(_synth_boxes(spark, sf))


def q_nms_boxes(spark, sf):
    return nms_grouped(_synth_boxes(spark, sf), method="lanms", nms_threshold=0.3, merge_threshold=0.3)


def q_reading_order(spark, sf):
    return reading_order_grouped(_synth_boxes(spark, sf))


def q_multimodal_meta(spark, sf):
    """Typed metadata over a mixed-container blob corpus: doc_id % 5 picks
    the container (0 PNG, 1 JPEG, 2 GIF — REAL encoder bytes from
    kernels/imagecodec — else the raw text bytes as an opaque blob), with
    per-doc dimensions, so the header probes (png/jpeg/gif_dimensions)
    must report the true width/height for every real container."""

    d = _t(spark, sf, "documents").select("doc_id", "text")

    def build(batches):
        import numpy as np
        import pandas as pd

        from ocr_spark.kernels.imagecodec import gif_encode, jpeg_encode, png_encode

        for pdf in batches:
            blobs = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                kind = did % 5
                if kind in (0, 1, 2):
                    h, w = 8 + did % 7, 9 + did % 5
                    g = ((did + 1) * (np.arange(h)[:, None] * 131
                                      + np.arange(w)[None, :] * 31 + 7)) % 256
                    g = g.astype(np.uint8)
                    blobs.append(
                        png_encode(g) if kind == 0
                        else jpeg_encode(g) if kind == 1
                        else gif_encode(g)
                    )
                else:
                    blobs.append(str(text or "").encode())
            yield pd.DataFrame({"blob_id": pdf["doc_id"].astype("int64"), "blob": blobs})

    return blob_metadata(d.mapInPandas(build, schema="blob_id long, blob binary"))


def q_multimodal_frames(spark, sf):
    from .operators.multimodal import frame_sample

    d = _t(spark, sf, "documents").select(
        F.col("doc_id").alias("blob_id"), F.col("text").cast("binary").alias("blob")
    )
    return frame_sample(d.where(F.col("blob_id") < 50), n_frames=8, every_k=2)


def q_bitext_align(spark, sf):  # Gale-Church sentence alignment of bitext pairs
    """Deterministic parallel corpus: text_b per doc is a word-reversed
    'translation' of text_a's sentences, with every 3rd doc's first two
    target sentences merged (forcing 2-1 beads) and every 7th doc given a
    short trailing extra; fixture oracle (per-pair DP is not SQL)."""
    from .operators.bitext_align import align_bitext

    d = _t(spark, sf, "documents").select(
        F.col("doc_id").alias("pair_id"),
        F.substring(F.col("text"), 1, 400).alias("raw"),
    )

    def build(batches):
        import pandas as pd

        for pdf in batches:
            ta_out, tb_out = [], []
            for pid, raw in zip(pdf["pair_id"], pdf["raw"]):
                pid = int(pid)
                words = str(raw or "").split()
                # the corpus text carries no EOS punctuation, so sentence
                # structure is synthesized: 5-9 words per sentence (length
                # varies by doc residue)
                k = 5 + pid % 5
                sents = [
                    " ".join(words[i : i + k]).rstrip(".") + "."
                    for i in range(0, len(words), k)
                    if words[i : i + k]
                ]
                trans = [
                    " ".join(reversed(s.rstrip(".").split())) + "." for s in sents
                ]
                if pid % 3 == 0 and len(trans) >= 2:
                    # interior EOS would re-split on the align side — strip
                    # it so the merged target is ONE sentence (a 2-1 bead)
                    trans = [trans[0].rstrip(".") + " " + trans[1]] + trans[2:]
                if pid % 7 == 0:
                    trans.append("Fin.")
                ta_out.append(" ".join(sents))
                tb_out.append(" ".join(trans))
            yield pd.DataFrame(
                {
                    "pair_id": pdf["pair_id"].astype("int64"),
                    "text_a": ta_out,
                    "text_b": tb_out,
                }
            )

    pairs = d.mapInPandas(build, schema="pair_id long, text_a string, text_b string")
    return align_bitext(pairs)


def q_markdown_export(spark, sf):  # structured markdown rendering of extraction
    """Flagship spans -> GFM-ish markdown as a pure Column aggregate on
    top of the single-python-stage extraction (operators/markdown.py);
    fixture oracle (extraction itself is not SQL-expressible)."""
    from .operators.markdown import markdown_export

    return markdown_export(extract_pages(pages_df(spark, sf)))


def q_kmeans(spark, sf):  # distributed Lloyd's k-means over embeddings
    """Integer-quantized full-corpus k-means (operators/similarity.
    kmeans_assign): 3 Lloyd iterations, first-k seeds, exact long
    arithmetic; the oracle unrolls every assignment/update round."""
    from .operators.similarity import kmeans_assign

    return kmeans_assign(_t(spark, sf, "embeddings"), k=8, n_iters=3)


def q_pq_ann(spark, sf):  # product-quantization ANN (Jegou et al. 2011)
    """PQ codes + ADC short-list + exact re-rank (operators/similarity.
    pq_topk): 8 subspaces x 64 codes trained with the integer Lloyd
    recipe, corpus scanned as 8-byte codes via driver-built ADC tables;
    the oracle replays training, encoding, tables, short-lists, and
    re-ranked ranks bit-for-bit."""
    from .operators.similarity import pq_topk

    e = _t(spark, sf, "embeddings")
    return pq_topk(e, e.where(F.col("vec_id") < 5), k=5)


def _cached_vec_index(spark, sf, suffix: str, **build_kwargs):
    """Build-once-per-(corpus, params) persisted index (sources/vecindex.py).

    The artifact path is keyed by the sanitized sf dir, the build-params
    suffix, AND a filesystem fingerprint (size + mtime) of the source
    embeddings parquet — the soak.py cache-key lesson extended: a
    regenerated corpus under the SAME path must invalidate the artifact,
    or stale codes would hash-mismatch the oracle's fresh replay. The
    fingerprint is a driver-side stat call, no Spark job. A valid
    existing artifact is REOPENED, not rebuilt — the artifact's
    contract."""
    import tempfile

    from .sources.vecindex import build_vector_index, open_vector_index

    key = sf.strip("/").replace("/", "_").replace(".", "_")
    src = _os.path.join(sf, "embeddings.parquet")
    # ADVICE r4: a failed local stat must not become a stable "nofp" key —
    # a stale /tmp artifact from an older corpus at the same sf path would
    # be reopened without invalidation. Non-local paths (hdfs://, s3a://)
    # fall back to a Hadoop-FS stat through the session's JVM so any
    # Spark-readable source still fingerprints (and caches); only when
    # BOTH stats fail does the helper rebuild unconditionally, trading
    # repeated builds for never serving stale codes.
    stat_failed = False
    try:
        st = _os.stat(src)
        fp = f"{st.st_size}_{st.st_mtime_ns // 1_000_000}"
    except OSError:
        try:
            jvm = spark._jvm
            hpath = jvm.org.apache.hadoop.fs.Path(src)
            fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
            status = fs.getFileStatus(hpath)
            fp = f"{status.getLen()}_{status.getModificationTime()}"
        except Exception:
            fp = "nofp"
            stat_failed = True
    root = _os.path.join(
        tempfile.gettempdir(), f"ocr_spark_vecindex_{key}_{suffix}_{fp}"
    )
    if not stat_failed:
        try:
            return open_vector_index(root)
        except (OSError, ValueError, KeyError):
            pass
    return build_vector_index(
        _t(spark, sf, "embeddings"), root, **build_kwargs
    )


def _vec_index(spark, sf):
    return _cached_vec_index(
        spark, sf, "m8c64i2_v1", m=8, n_codes=64, n_iters=2
    )


def q_ann_index_build(spark, sf):  # persisted PQ index: build artifact
    """Build (or reopen) the persisted vector index and surface its stored
    codes as (vec_id, s, code) rows — the on-disk artifact IS the query
    result, so the oracle replaying integer Lloyd training + encoding
    pins the parquet bytes a later session reopens. Reference parity:
    VectorDatabase save/load (utils/databases/vector_database.py:1-122)."""
    idx = _vec_index(spark, sf)
    return (
        idx.codes(spark)
        .select("vec_id", F.posexplode("codes").alias("s", "code"))
        .select("vec_id", F.col("s").cast("int").alias("s"), "code")
    )


def q_ann_index_query(spark, sf):  # persisted PQ index: query without retraining
    """Open the PERSISTED index and run the ADC + exact-re-rank query path
    over the stored codes/refine columns — zero training jobs on this
    path (tests/test_vecindex.py pins it by poisoning pq_train). Output
    and oracle are identical to pq_ann: the artifact round-trip must be
    invisible to the query result."""
    idx = _vec_index(spark, sf)
    e = _t(spark, sf, "embeddings")
    return idx.topk(spark, e.where(F.col("vec_id") < 5), k=5)


def _vec_index_ivf(spark, sf):
    """IVFPQ variant of the persisted index: 8 coarse lists (integer
    Lloyd, 2 iters), codes hive-partitioned by list_id. Same build-once
    cache policy as _vec_index, separate artifact dir."""
    return _cached_vec_index(
        spark,
        sf,
        "m8c64i2_L8_v1",
        m=8,
        n_codes=64,
        n_iters=2,
        n_lists=8,
        coarse_iters=2,
    )


def q_ann_index_ivf_query(spark, sf):  # IVFPQ persisted index: probed query
    """Query the IVF-partitioned persisted index with n_probe=3 of 8
    lists: probe selection is exact int L2 to the stored coarse
    centroids (ties -> lowest list), the ADC scan and re-rank read ONLY
    the probed lists' hive partitions (partition pruning — the
    10^12-vector read path), and every stage is integer-exact, so the
    oracle replays coarse training, list assignment, probing, ADC
    short-lists and re-ranked ranks bit-for-bit."""
    idx = _vec_index_ivf(spark, sf)
    e = _t(spark, sf, "embeddings")
    return idx.topk(spark, e.where(F.col("vec_id") < 5), k=5, n_probe=3)


def q_ann_index_batch_query(spark, sf):  # IVFPQ: distributed batch probe
    """The SAME probed query as ann_index_ivf_query routed through the
    ZERO-COLLECT batch path (VectorIndex.topk_batch → similarity.
    pq_query_batch): probe selection, ADC scoring, and re-rank all run as
    DataFrame stages, so the probe side can be corpus-sized (VERDICT r04
    #4). Bit-identical to the driver path by construction — the oracle is
    the ivf query's replay, unchanged."""
    idx = _vec_index_ivf(spark, sf)
    e = _t(spark, sf, "embeddings")
    return idx.topk_batch(spark, e.where(F.col("vec_id") < 5), k=5, n_probe=3)


def q_semdedup_pq(spark, sf):  # SemDeDup through the persisted PQ index
    """Semantic dedup driven by the persisted index's RECONSTRUCTED
    vectors (operators/similarity.semdedup_pq): the corpus is scanned as
    8-byte codes, decoded to codebook centroids in one Arrow pass, and
    deduped with integer-exact sign-LSH buckets + a decimal(38,0) cosine
    test — the memory path for 100-TB semantic dedup. The oracle replays
    training, encoding, reconstruction, bucketing, and the squared-cosine
    comparison bit-for-bit in HUGEINT."""
    from .operators.similarity import semdedup_pq

    idx = _vec_index(spark, sf)
    return semdedup_pq(idx.reconstruct(spark))


def q_dsir_resample(spark, sf):  # DSIR systematic importance resampling
    """The resampling half of DSIR: integer e^(milli-log) weights via the
    shared fixed-point exp tables, a range-partitioned two-pass prefix
    sum, and systematic (Madow) PPS selection in doc-id order. The oracle
    re-derives weights from scratch (hash models -> milli-log -> table
    exp) and replays the cumulative selection with a window cumsum."""
    from .operators.dsir import dsir_resample

    d = _t(spark, sf, "documents").select(
        "doc_id", "lang", F.substring(F.col("text"), 1, 300).alias("text")
    )
    return dsir_resample(d, F.col("lang") == "en", n_samples=100, n_buckets=64)


def q_seed_distance(spark, sf):  # multi-source BFS hops from trusted seeds
    """Hop-count-from-seed-whitelist over the host graph (the discrete
    sibling of trustrank: link distance instead of decayed trust mass).
    Same seed policy as q_trustrank (numeric host suffix % 5 == 0); the
    oracle unrolls every min-plus relaxation round over the independently
    re-derived edge set. Unreached hosts stay NULL."""
    from .operators.link_graph import (
        extract_page_links,
        host_graph,
        seed_distance_hosts,
    )

    edges = host_graph(extract_page_links(pages_df(spark, sf)))
    seed = F.coalesce(
        F.regexp_extract(F.col("host"), r"host(\d+)\.example", 1).cast("int") % 5 == 0,
        F.lit(False),
    )
    return seed_distance_hosts(edges, seed)


def q_mojibake(spark, sf):  # UTF-8-as-cp1252 mojibake detect + repair
    """Deterministic dirty corpus: doc_id % 3 == 0 docs get a non-ASCII
    marker appended and are then corrupted through the FORWARD
    UTF-8-read-as-windows-1252 table (twice for doc_id % 9 == 0 —
    double mojibake); everything else is pure ASCII and passes through
    corruption unchanged. The repair operator must peel exactly the
    applied layers back; the oracle re-derives the expected clean text,
    flag, and round count arithmetically from the corpus construction —
    it never sees either byte table."""
    from pyspark.sql.functions import pandas_udf

    from .operators.corpus_filters import mojibake_repair

    d = _t(spark, sf, "documents")

    @pandas_udf("string")
    def corrupt_n(text, times):
        import pandas as pd

        from .kernels.mojibake import corrupt_utf8_as_w1252

        out = []
        for t, n in zip(text, times):
            t = str(t)
            for _ in range(int(n)):
                t = corrupt_utf8_as_w1252(t)
            out.append(t)
        return pd.Series(out)

    dirty = d.select(
        "doc_id",
        corrupt_n(
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.col("text"), F.lit(" déjà vu — café™")),
            ).otherwise(F.col("text")),
            F.when(F.col("doc_id") % 9 == 0, F.lit(2))
            .when(F.col("doc_id") % 3 == 0, F.lit(1))
            .otherwise(F.lit(0)),
        ).alias("text"),
    )
    return mojibake_repair(dirty)


def q_image_dups(spark, sf):  # perceptual near-dup image pairs (dHash)
    """8x9 grayscale PNGs built closed-form from doc_id residues are
    encoded to REAL PNG bytes (lossless), decoded back through
    kernels/imagecodec.png_decode, dHashed, and paired via the SAME
    Manku banding as SimHash text dedup.  doc_id % 10 == 5 images are
    one-pixel perturbations of doc_id - 5 (hamming <= 2 by construction);
    the oracle re-derives every hash and pair from the formula."""
    from .operators.dedup import hamming_near_pairs
    from .operators.multimodal import image_dhash

    d = _t(spark, sf, "documents").select("doc_id").where(F.col("doc_id") < 2000)

    def build(batches):
        import numpy as np
        import pandas as pd

        from ocr_spark.kernels.imagecodec import png_encode

        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                did = int(did)
                src = did - 5 if did % 10 == 5 else did
                r = np.arange(8)[:, None]
                c = np.arange(9)[None, :]
                # multiplicative mixing: src scales a per-cell odd-ish term
                # mod 256, so comparisons (NOT just levels) vary per doc —
                # an additive per-doc constant would cancel in every
                # comparison and collapse all hashes to one value
                g = ((src + 1) * (r * 131 + c * 31 + 7)) % 256
                if did % 10 == 5:
                    g = g.copy()
                    g[0, 0] = (g[0, 0] + 40) % 256
                blobs.append(png_encode(g.astype(np.uint8)))
            yield pd.DataFrame({"blob_id": pdf["doc_id"].astype("int64"), "blob": blobs})

    imgs = d.mapInPandas(build, schema="blob_id long, blob binary")
    sig = image_dhash(imgs)
    return hamming_near_pairs(
        sig, sig_col="dhash", id_col="blob_id", max_hamming=3, n_blocks=4
    )


def q_phash_dups(spark, sf):  # DCT perceptual hash near-dup pairs (round 3)
    """16x16 grayscale PNGs built closed-form from doc_id residues are
    encoded to REAL PNG bytes, decoded back through the codec, pHashed
    (integer-quantized 16-point DCT-II, median threshold over the 8x8
    low-frequency block) and paired via the SAME Manku banding as dHash /
    SimHash.  doc_id % 10 == 5 images are a one-pixel +24 perturbation of
    doc_id - 5 — pHash's point vs dHash: the perturbation lands in ONE
    dHash cell (all 2 of its comparisons can flip) but spreads across all
    64 DCT coefficients, flipping only those near the median.  The oracle
    embeds the same integer cos table and re-derives every hash and pair
    arithmetically."""
    from .operators.dedup import hamming_near_pairs
    from .operators.multimodal import image_phash

    d = _t(spark, sf, "documents").select("doc_id").where(F.col("doc_id") < 1200)

    def build(batches):
        import numpy as np
        import pandas as pd

        from ocr_spark.kernels.imagecodec import png_encode

        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                did = int(did)
                src = did - 5 if did % 10 == 5 else did
                r = np.arange(16)[:, None]
                c = np.arange(16)[None, :]
                g = ((src + 1) * (r * 131 + c * 37 + 11)) % 256
                if did % 10 == 5:
                    g = g.copy()
                    g[0, 0] = (g[0, 0] + 24) % 256
                blobs.append(png_encode(g.astype(np.uint8)))
            yield pd.DataFrame({"blob_id": pdf["doc_id"].astype("int64"), "blob": blobs})

    imgs = d.mapInPandas(build, schema="blob_id long, blob binary")
    sig = image_phash(imgs)
    return hamming_near_pairs(
        sig, sig_col="phash", id_col="blob_id", max_hamming=3, n_blocks=4
    )


def q_lr_trained(spark, sf):  # TRAINED fasttext-shape LR quality filter (round 3)
    """Distributed-Newton logistic regression over the exact integer
    hashing-trick features of quality_classifier, labeled by a planted
    integer teacher (integer dots -> margin >= 1 -> separable by
    construction).  Zero-error training makes the learned model reproduce
    the teacher exactly, so every output row is pure arithmetic over the
    corpus text — hard SQL oracle (the east_trained closure pattern)."""
    from .operators.lr_train import lr_trained_roundtrip

    return lr_trained_roundtrip(_t(spark, sf, "documents"))


def q_text_tiles(spark, sf):  # TextTiling topical segmentation (round 3)
    """Hearst-style lexical-cohesion boundaries over the documents table
    (block=10 so the 10-99-token synthetic docs carry up to 9 candidate
    boundaries).  Integer-exact squared-cosine + windowed depth; the
    oracle re-derives every block slice, equal-pair dot product, DIV
    quotient, window depth, and local-min test in SQL."""
    from .operators.text_analysis import text_tiles

    return text_tiles(_t(spark, sf, "documents"), block=10, depth_milli=150)


def q_chunk_extracted(spark, sf):  # F8 chunks_from_paragraphs driver
    from .operators.chunking import chunk_extracted

    return chunk_extracted(extract_pages(pages_df(spark, sf)), max_length=400)


def q_training_pipeline(spark, sf):
    """The composed training-data shape, one lazy plan: extract pages ->
    section-aware chunking -> quality gate -> exact near-dup collapse.
    Scan -> two narrow python stages -> one groupBy; no other shuffle."""
    from .operators.chunking import chunk_extracted

    chunks = chunk_extracted(extract_pages(pages_df(spark, sf)), max_length=400)
    gated = chunks.where(
        (F.col("n_chars") >= 40) & (F.col("text").rlike("[a-zA-Z]"))
    )
    from .functions.text_functions import clean_text_expr

    fp = F.md5(clean_text_expr("text").cast("binary"))
    return (
        gated.withColumn("fp", fp)
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.min(F.concat_ws("#", "url", F.col("chunk_id").cast("string"))).alias(
                "canonical_chunk"
            ),
            F.min("n_chars").cast("int").alias("n_chars"),
        )
    )


def q_training_pipeline_v2(spark, sf):
    """The FULL LLM-training-data story in one lazy plan: extract pages ->
    Gopher-style repetition gate (doc level) -> section-aware chunking ->
    chunk quality gate -> exact near-dup collapse -> BPE token budget.

    Composes six operator families; scan -> python stages -> three
    aggregation shuffles (repetition, BPE count is pre-trained, final fp
    groupBy). Deterministic end to end -> fixture oracle."""
    from .functions.text_functions import clean_text_expr
    from .operators.chunking import chunk_extracted
    from .operators.tokenize import bpe_encode_table, train_bpe_merges

    # the extraction feeds BOTH the repetition-gate branch and the chunking
    # branch; a LAZY localCheckpoint materializes the python stage once and
    # reuses it (at real scale the extraction is its own committed job —
    # run_extract_job — and this pipeline reads its table). Unlike persist()
    # a checkpoint does NOT register with the CacheManager, so it cannot
    # rewrite other queries' plans in the same session.
    extracted = extract_pages(pages_df(spark, sf)).localCheckpoint(eager=False)
    docs = extracted.withColumn("doc_id", F.xxhash64("url"))
    rep = ta.repetition_signals(docs.select("doc_id", "text"))
    ok_ids = rep.where(
        (F.col("distinct_word_ratio") >= 0.1)
        & (F.col("top_word_frac") <= 0.5)
    ).select("doc_id")
    gated_docs = docs.join(ok_ids, "doc_id").select("url", "spans")

    chunks = chunk_extracted(gated_docs, max_length=400).where(
        (F.col("n_chars") >= 40) & (F.col("text").rlike("[a-zA-Z]"))
    )
    ranks = train_bpe_merges(_t(spark, sf, "documents"), n_merges=80, top_k_words=4000)
    # with_id self-joins (chunk rows x their BPE counts): same lazy
    # checkpoint so the chunking python stage also runs once
    with_id = chunks.withColumn(
        "chunk_key", F.xxhash64("url", F.col("chunk_id").cast("string"))
    ).localCheckpoint(eager=False)
    enc = bpe_encode_table(
        with_id.select(F.col("chunk_key").alias("doc_id"), "text"), ranks
    ).select(F.col("doc_id").alias("chunk_key"), "n_bpe_tokens")
    fp = F.md5(clean_text_expr("text").cast("binary"))
    return (
        with_id.join(enc, "chunk_key")
        .withColumn("fp", fp)
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.min(F.concat_ws("#", "url", F.col("chunk_id").cast("string"))).alias(
                "canonical_chunk"
            ),
            F.min("n_chars").cast("int").alias("n_chars"),
            F.min("n_bpe_tokens").cast("int").alias("n_bpe_tokens"),
        )
    )


def q_dedup_clusters(spark, sf):
    """Near-dup clusters from the shingle-Jaccard pairs: iterative min-label
    propagation (distributed connected components, non-SQL-expressible
    iterative algorithm -> rows-only check)."""
    pairs = dedup_ops.ngram_jaccard_pairs(_t(spark, sf, "documents"), threshold=0.5)
    return dedup_ops.dedup_clusters(pairs)


def q_detect_maps(spark, sf):  # D2-D6: EAST map decode + LANMS
    from .operators.detect_maps import detect_from_maps, synth_maps_df

    return detect_from_maps(synth_maps_df(spark, sf))


def q_detect_yolo(spark, sf):  # D7: YOLOv2 grid decode + per-class NMS
    from .operators.detect_maps import detect_yolo_from_maps, synth_yolo_maps_df

    return detect_yolo_from_maps(synth_yolo_maps_df(spark, sf))


def q_split_text(spark, sf):  # F7 recursive chunking via mapInPandas
    from .kernels.textproc import split_text

    d = _t(spark, sf, "documents").select("doc_id", "text")

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for i, chunk in enumerate(split_text(text, 80, tokenizer=str.split)):
                    rows.append({"doc_id": int(doc_id), "chunk_id": i, "chunk": chunk})
            yield pd.DataFrame(rows, columns=["doc_id", "chunk_id", "chunk"])

    return d.mapInPandas(gen, schema="doc_id long, chunk_id int, chunk string")


# --------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # ------------------------------------------------------------------
    # DRIVER-WINDOW ROTATION: the driver's correctness gate hashes the
    # FIRST 50 entries of this dict at sf0.01. Round-5 window = the 28
    # queries never driver-checked in rounds 1-4 (24 carryover + the 4
    # round-4 additions) + the 7 NEW round-5 queries + the 15 oldest
    # driver rows (r1/r2) as backfill — 28 + 7 + 15 = 50. This completes
    # the cumulative sweep of the 181 pre-round-5 queries except the 7
    # r2-checked rows parked right after the window (first in line for
    # round-6 backfill).
    # ------------------------------------------------------------------
    # -- round-5 driver window: never driver-checked before (28) --
    "domain_split": q_domain_split,
    "domain_prior": q_domain_prior,
    "unimax": q_unimax,
    "bloom_prefilter": q_bloom_prefilter,
    "bitext": q_bitext,
    "ccnet_buckets": q_ccnet_buckets,
    "gopher_rules": q_gopher_rules,
    "mojibake": q_mojibake,
    "seed_distance": q_seed_distance,
    "dsir_resample": q_dsir_resample,
    "microdata": q_microdata,
    "markdown_export": q_markdown_export,
    "bitext_align": q_bitext_align,
    "audio_dups": q_audio_dups,
    "video_dups": q_video_dups,
    "cdc_chunks": q_cdc_chunks,
    "unigram_segment": q_unigram_segment,
    "wordpiece": q_wordpiece,
    "readability": q_readability,
    "blocklist": q_blocklist,
    "shuffle_shards": q_shuffle_shards,
    "training_pipeline_v2": q_training_pipeline_v2,
    "url_canon": q_url_canon,
    "url_features": q_url_features,
    "ann_index_build": q_ann_index_build,
    "ann_index_query": q_ann_index_query,
    "ann_index_ivf_query": q_ann_index_ivf_query,
    "semdedup_pq": q_semdedup_pq,
    # -- new round-5 queries insert here (inside the 50-slot window) --
    "ann_index_batch_query": q_ann_index_batch_query,
    "video_meta": q_video_meta,
    "audio_spectral": q_audio_spectral,
    "crnn_multifont": q_crnn_multifont,
    "audio_gate": q_audio_gate,
    "srt_align": q_srt_align,
    "audio_mel": q_audio_mel,
    # -- backfill: oldest driver-checked rows (r1/r2) (15) --
    # 28 never-checked + 7 new round-5 queries above = 35, so exactly 15
    # backfill rows fit the 50-slot window; entries below this comment
    # through "group_concat" are IN the window, everything after the tail
    # marker is not
    "multimodal_meta": q_multimodal_meta,
    "training_pipeline": q_training_pipeline,
    "multimodal_frames": q_multimodal_frames,
    "chunk_extracted": q_chunk_extracted,
    "size_filter": q_size_filter,
    "region_filter": q_region_filter,
    "union_agg": q_union_agg,
    "median_threshold": q_median_threshold,
    "window_topk": q_window_topk,
    "anti_join": q_anti_join,
    "order_weight": q_order_weight,
    "sessionize": q_sessionize,
    "clean_text": q_clean_text,
    "levenshtein": q_levenshtein,
    "group_concat": q_group_concat,
    # -- tail: outside the 50-slot window. First the 7 r2-checked rows
    # that no longer fit (they queue first for the round-6 backfill),
    # then the r3/r4-verified remainder --
    "dedup_exact": q_dedup_exact,
    "line_dedup": q_line_dedup,
    "fingerprint": q_fingerprint,
    "token_count": q_token_count,
    "quality": q_quality,
    "langid": q_langid,
    "repetition": q_repetition,
    "frontier_plan": q_frontier_plan,
    "sitemap_gap": q_sitemap_gap,
    "crawl_overlap": q_crawl_overlap,
    "heavy_hitters": q_heavy_hitters,
    "hll_distinct": q_hll_distinct,
    "length_quantiles": q_length_quantiles,
    "image_dups": q_image_dups,
    "ct_langid": q_ct_langid,
    "dup_spans": q_dup_spans,
    "decontaminate": q_decontaminate,
    "stratified_sample": q_stratified_sample,
    "compression_ratio": q_compression_ratio,
    "url_latest": q_url_latest,
    "revisit": q_revisit,
    "redirects": q_redirects,
    "snapshot_drift": q_snapshot_drift,
    "snapshot_diff": q_snapshot_diff,
    "page_meta": q_page_meta,
    "og_meta": q_og_meta,
    "http_headers": q_http_headers,
    "pagination_chains": q_pagination_chains,
    "provenance": q_provenance,
    "mirror_hosts": q_mirror_hosts,
    "mirror_clusters": q_mirror_clusters,
    "surt": q_surt,
    "url_changes": q_url_changes,
    "refresh_schedule": q_refresh_schedule,
    "token_budget": q_token_budget,
    "page_links": q_page_links,
    "html_tables": q_html_tables,
    "css_select": q_css_select,
    "anchor_summary": q_anchor_summary,
    "link_hosts": q_link_hosts,
    "zorder": q_zorder,
    "homograph": q_homograph,
    "ip_asn": q_ip_asn,
    "profile": q_profile,
    "annotate_meta": q_annotate_meta,
    "rendezvous": q_rendezvous,
    "fetch_plan": q_fetch_plan,
    "asof_join": q_asof_join,
    "quality_classifier": q_quality_classifier,
    "sequence_pack": q_sequence_pack,
    "jsonld_entities": q_jsonld_entities,
    "dsir": q_dsir,
    "audio_features": q_audio_features,
    "video_frames": q_video_frames,
    "vtt_cues": q_vtt_cues,
    "registrable_domain": q_registrable_domain,
    "meta_robots": q_meta_robots,
    "embed_centroids": q_embed_centroids,
    "flagship_extract": q_flagship_extract,
    "pdf_extract": q_pdf_extract,
    "detect_yolo": q_detect_yolo,
    "attn_decode": q_attn_decode,
    "crnn_trained": q_crnn_trained,
    "east_trained": q_east_trained,
    "phash_dups": q_phash_dups,
    "lr_trained": q_lr_trained,
    "text_tiles": q_text_tiles,
    "kn_lm": q_kn_lm,
    "alpha_mix": q_alpha_mix,
    "soft404_html": q_soft404_html,
    "soft404": q_soft404,
    "line_langid": q_line_langid,
    "detect_maps": q_detect_maps,
    "combine_boxes": q_combine_boxes,
    "nms_boxes": q_nms_boxes,
    "reading_order": q_reading_order,
    "normalize_numbers": q_normalize_numbers,
    "split_text": q_split_text,
    "bpe_tokens": q_bpe_tokens,
    "charset_sniff": q_charset_sniff,
    "minhash_pairs": q_minhash_pairs,
    "simhash_pairs": q_simhash_pairs,
    "lsh_ann": q_lsh_ann,
    "ivf_ann": q_ivf_ann,
    "pq_ann": q_pq_ann,
    "kmeans": q_kmeans,
    "semdedup": q_semdedup,
    "dedup_clusters": q_dedup_clusters,
    "dedup_keep_best": q_dedup_keep_best,
    "suffix_rank": q_suffix_rank,
    "sa_dups": q_sa_dups,
    "pagerank": q_pagerank,
    "trustrank": q_trustrank,
    "hits": q_hits,
    "hyperball": q_hyperball,
    "kcore": q_kcore,
    "triangles": q_triangles,
    "host_communities": q_host_communities,
    "walks": q_walks,
    "textrank": q_textrank,
    "reciprocity": q_reciprocity,
    "bm25_topk": q_bm25_topk,
    "phrase_topk": q_phrase_topk,
    "robots_filter": q_robots_filter,
    "sitemap_urls": q_sitemap_urls,
    "feed_entries": q_feed_entries,
    "politeness": q_politeness,
    "jaccard_pairs": q_jaccard_pairs,
    "containment": q_containment,
    "url_templates": q_url_templates,
    "param_mining": q_param_mining,
    "winnow": q_winnow,
    "winnow_pairs": q_winnow_pairs,
    "incremental_dedup": q_incremental_dedup,
    "ann_topk": q_ann_topk,
    "cube_agg": q_cube_agg,
    "distinct_agg": q_distinct_agg,
    "events_hourly": q_events_hourly,
    "ctc_roundtrip": q_ctc_roundtrip,
    "pixel_ocr": q_pixel_ocr,
    "crnn_read": q_crnn_read,
    "host_templates": q_host_templates,
    "emission_filter": q_emission_filter,
    "sort_boxes_sql": q_sort_boxes_sql,
    "pandas_udf_lev": q_pandas_udf_lev,
    "embed_dup_pairs": q_embed_dup_pairs,
    "revenue_topk": q_revenue_topk,
    "supplier_geo": q_supplier_geo,
    "host_stats": q_host_stats,
    "c4_clean": q_c4_clean,
    "pii_redact": q_pii_redact,
    "ngram_spans": q_ngram_spans,
    "hash_embed": q_hash_embed,
    "bigram_lm": q_bigram_lm,
    "ngram_lm": q_ngram_lm,
    "nb_classifier": q_nb_classifier,
    "script_mix": q_script_mix,
    "jaccard_cjk": q_jaccard_cjk,
}


_LANG_HITS = {
    lang: " + ".join(
        f"(CASE WHEN ' ' || text || ' ' LIKE '% {w} %' THEN 1 ELSE 0 END)"
        for w in words
    )
    for lang, words in ta.LANG_MARKERS.items()
}

_NORM_TEXT = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

ORACLE_SQL: dict[str, str] = {
    "size_filter": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_quantity >= 10 AND l_quantity <= 20 AND l_discount >= 0.02
    """,
    "region_filter": """
        SELECT p_partkey, p_name, p_size, p_retailprice
        FROM part
        WHERE p_size >= 15 AND p_size <= 35
          AND p_retailprice >= 920 AND p_retailprice <= 980
    """,
    "union_agg": """
        SELECT o_custkey, min(o_totalprice) AS min_price,
               max(o_totalprice) AS max_price,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_custkey
    """,
    "median_threshold": """
        SELECT l_returnflag, round(median(l_quantity), 4) AS median_qty,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    "window_topk": """
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               CAST(rn AS INTEGER) AS rn FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    "anti_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)
    """,
    "order_weight": """
        SELECT user_id, event_id, weight, CAST(pos AS INTEGER) AS pos FROM (
            SELECT user_id, event_id,
                   CASE WHEN event_type = 'error' THEN 0
                        WHEN event_type = 'click' THEN 1 ELSE 2 END AS weight,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY CASE WHEN event_type = 'error' THEN 0
                                     WHEN event_type = 'click' THEN 1 ELSE 2 END,
                                event_id) AS pos
            FROM events
        ) WHERE pos <= 5
    """,
    "sessionize": """
        WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR date_diff('second', lag(ts) OVER w, ts) > 1800
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, ts, value,
                   sum(new_sess) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS session_id
            FROM flagged
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               CAST(count(*) AS BIGINT) AS n_events,
               min(ts) AS session_start,
               max(ts) AS session_end,
               round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
        FROM sess GROUP BY user_id, session_id
    """,
    "clean_text": f"""
        SELECT doc_id, {_NORM_TEXT} AS cleaned,
               CAST(length({_NORM_TEXT}) AS INT) AS n_chars_clean
        FROM documents
    """,
    "levenshtein": """
        SELECT c_custkey,
               CAST(levenshtein(c_name, 'Customer#000000042') AS INT) AS lev,
               round(levenshtein(c_name, 'Customer#000000042') / 18.0, 6) AS lev_norm
        FROM customer
    """,
    "group_concat": """
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
        FROM documents GROUP BY lang
    """,
    "dedup_exact": f"""
        SELECT md5({_NORM_TEXT}) AS fp,
               CAST(count(*) AS BIGINT) AS n_docs,
               min(doc_id) AS canonical_doc_id
        FROM documents GROUP BY 1
    """,
    "host_stats": """
        SELECT CASE WHEN doc_id % 10 < 3 THEN 'host0.example'
                    ELSE 'host' || CAST(1 + doc_id % 37 AS VARCHAR) || '.example'
               END AS host,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(*) FILTER (WHERE doc_id % 20 = 5) AS BIGINT) AS n_pdf,
               CAST(count(*) FILTER (WHERE doc_id % 20 = 8) AS BIGINT) AS n_image,
               CAST(count(*) FILTER (WHERE doc_id % 20 = 0) AS BIGINT) AS n_payload
        FROM documents GROUP BY 1
    """,
    "line_dedup": """
        WITH enriched AS (
            SELECT doc_id,
                   'Home | About | Contact' || chr(10) || text || chr(10) ||
                   CASE WHEN doc_id % 2 = 0
                        THEN 'Share this page on social media'
                        ELSE 'Copyright Example Site. All rights reserved.'
                   END AS text
            FROM documents
        ),
        lines AS (
            SELECT doc_id,
                   unnest(string_split(text, chr(10))) AS line,
                   generate_subscripts(string_split(text, chr(10)), 1) AS pos
            FROM enriched
        ),
        normed AS (
            SELECT doc_id, pos, line, trim(lower(line)) AS norm FROM lines
        ),
        boiler AS (
            SELECT norm FROM normed WHERE len(norm) > 0
            GROUP BY norm HAVING count(DISTINCT doc_id) >= 3
        )
        SELECT n.doc_id,
               coalesce(string_agg(CASE WHEN b.norm IS NULL THEN n.line END,
                                   chr(10) ORDER BY n.pos), '') AS clean_text,
               CAST(count(*) FILTER (WHERE b.norm IS NULL) AS BIGINT) AS n_kept,
               CAST(count(*) FILTER (WHERE b.norm IS NOT NULL) AS BIGINT) AS n_removed
        FROM normed n LEFT JOIN boiler b USING (norm)
        GROUP BY n.doc_id
    """,
    "fingerprint": f"""
        SELECT doc_id, md5({_NORM_TEXT}) AS fp,
               CAST(length({_NORM_TEXT}) AS INT) AS n_chars_norm
        FROM documents
    """,
    "token_count": """
        SELECT doc_id,
               CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS INT) AS n_tokens,
               CAST(length(text) AS INT) AS n_chars
        FROM documents
    """,
    "quality": """
        WITH f AS (
            SELECT doc_id,
                   length(text) AS n_chars,
                   len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS n_tokens,
                   length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
                   length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')) AS n_punct,
                   length(text) - length(regexp_replace(text, ' ', '', 'g')) AS n_spaces
            FROM documents
        )
        SELECT doc_id,
               CAST(n_chars AS INT) AS n_chars,
               CAST(n_tokens AS INT) AS n_tokens,
               CASE WHEN n_tokens > 0
                    THEN round((n_chars - n_spaces) * 1.0 / n_tokens, 4) END AS avg_token_len,
               CASE WHEN n_chars > 0
                    THEN round(n_digits * 1.0 / n_chars, 4) END AS digit_ratio,
               CASE WHEN n_chars > 0
                    THEN round(n_punct * 1.0 / n_chars, 4) END AS punct_ratio,
               round(CASE WHEN n_tokens >= 5
                           AND (n_chars - n_spaces) * 1.0 / n_tokens >= 2
                           AND (n_chars - n_spaces) * 1.0 / n_tokens <= 12
                          THEN 1.0 - n_digits * 1.0 / n_chars ELSE 0.0 END, 4) AS quality_score
        FROM f
    """,
    "langid": f"""
        SELECT doc_id,
               CASE WHEN ({_LANG_HITS['en']}) = greatest({_LANG_HITS['en']}, {_LANG_HITS['fr']}, {_LANG_HITS['de']}, {_LANG_HITS['es']})
                         AND greatest({_LANG_HITS['en']}, {_LANG_HITS['fr']}, {_LANG_HITS['de']}, {_LANG_HITS['es']}) > 0 THEN 'en'
                    WHEN ({_LANG_HITS['fr']}) = greatest({_LANG_HITS['en']}, {_LANG_HITS['fr']}, {_LANG_HITS['de']}, {_LANG_HITS['es']})
                         AND greatest({_LANG_HITS['en']}, {_LANG_HITS['fr']}, {_LANG_HITS['de']}, {_LANG_HITS['es']}) > 0 THEN 'fr'
                    WHEN ({_LANG_HITS['de']}) = greatest({_LANG_HITS['en']}, {_LANG_HITS['fr']}, {_LANG_HITS['de']}, {_LANG_HITS['es']})
                         AND greatest({_LANG_HITS['en']}, {_LANG_HITS['fr']}, {_LANG_HITS['de']}, {_LANG_HITS['es']}) > 0 THEN 'de'
                    WHEN ({_LANG_HITS['es']}) = greatest({_LANG_HITS['en']}, {_LANG_HITS['fr']}, {_LANG_HITS['de']}, {_LANG_HITS['es']})
                         AND greatest({_LANG_HITS['en']}, {_LANG_HITS['fr']}, {_LANG_HITS['de']}, {_LANG_HITS['es']}) > 0 THEN 'es'
                    ELSE 'und' END AS pred_lang,
               CAST({_LANG_HITS['en']} AS INT) AS hits_en,
               CAST({_LANG_HITS['fr']} AS INT) AS hits_fr,
               CAST({_LANG_HITS['de']} AS INT) AS hits_de,
               CAST({_LANG_HITS['es']} AS INT) AS hits_es
        FROM documents
    """,
    "repetition": """
        WITH toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
        ), words AS (
            SELECT doc_id, w FROM toks, unnest(t) AS u(w) WHERE w <> ''
        ), per_word AS (
            SELECT doc_id, w, count(*) AS c FROM words GROUP BY 1, 2
        ), word_stats AS (
            SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
                   CAST(count(*) AS BIGINT) AS n_distinct_words,
                   CAST(max(c) AS BIGINT) AS top_word_count
            FROM per_word GROUP BY doc_id
        ), grams AS (
            SELECT doc_id, t[i] || ' ' || t[i+1] AS g
            FROM toks, unnest(range(1, len(t))) AS u(i)
            WHERE len(t) >= 2
        ), per_gram AS (
            SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2
        ), gram_stats AS (
            SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_2grams,
                   CAST(max(c) AS BIGINT) AS top_2gram_count
            FROM per_gram GROUP BY doc_id
        )
        SELECT w.doc_id, w.n_words,
               round(w.n_distinct_words * 1.0 / w.n_words, 6) AS distinct_word_ratio,
               round(w.top_word_count * 1.0 / w.n_words, 6) AS top_word_frac,
               CASE WHEN g.n_2grams > 0
                    THEN round(g.top_2gram_count * 1.0 / g.n_2grams, 6) END AS top_2gram_frac
        FROM word_stats w LEFT JOIN gram_stats g ON w.doc_id = g.doc_id
    """,
    "incremental_dedup": """
        WITH toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
        ), sh0 AS (
            SELECT doc_id, list_aggregate(t[i:i+2], 'string_agg', ' ') AS sh
            FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
        ), sh AS (
            SELECT DISTINCT doc_id, sh FROM sh0 WHERE sh IS NOT NULL
        ), sizes AS (
            SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        ), shared AS (
            SELECT a.doc_id AS new_id, b.doc_id AS old_id,
                   CAST(count(*) AS BIGINT) AS shared
            FROM sh a JOIN sh b ON a.sh = b.sh
            WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
            GROUP BY 1, 2
        ), matched AS (
            SELECT DISTINCT new_id
            FROM shared
            JOIN sizes sa ON sa.doc_id = new_id
            JOIN sizes sb ON sb.doc_id = old_id
            WHERE round(shared * 1.0 / (sa.n + sb.n - shared), 6) >= 0.5
        )
        SELECT d.* FROM documents d
        WHERE d.doc_id % 2 = 1
          AND d.doc_id NOT IN (SELECT new_id FROM matched)
    """,
    "jaccard_pairs": """
        WITH toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
        ), sh0 AS (
            SELECT doc_id, list_aggregate(t[i:i+2], 'string_agg', ' ') AS sh
            FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
        ), sh AS (
            SELECT DISTINCT doc_id, sh FROM sh0 WHERE sh IS NOT NULL
        ), sizes AS (
            SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        ), shared AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(count(*) AS BIGINT) AS shared
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(shared * 1.0 / (sa.n + sb.n - shared), 6) AS jaccard
        FROM shared
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE round(shared * 1.0 / (sa.n + sb.n - shared), 6) >= 0.5
    """,
    "ann_topk": """
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS q_emb
            FROM embeddings WHERE vec_id < 5
        ), scored AS (
            SELECT q.query_id, e.vec_id,
                   round(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]), CAST(q.q_emb AS DOUBLE[])), 4) AS sim
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> q.query_id
        )
        SELECT query_id, vec_id, sim, CAST(rank AS INTEGER) AS rank FROM (
            SELECT query_id, vec_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, vec_id) AS rank
            FROM scored
        ) WHERE rank <= 5
    """,
    "supplier_geo": """
        SELECT r_name AS region, n_name AS nation,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
               round(min(s_acctbal), 2) AS min_acctbal,
               round(max(s_acctbal), 2) AS max_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "revenue_topk": """
        SELECT o_orderkey, o_orderpriority,
               CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "cube_agg": """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               CAST(count(*) AS BIGINT) AS n_rows,
               round(sum(l_quantity), 2) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "distinct_agg": """
        SELECT l_returnflag,
               CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    "events_hourly": """
        SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_value,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "ctc_roundtrip": """
        SELECT p_partkey, lower(p_name) AS decoded FROM part
    """,
    "pixel_ocr": """
        SELECT p_partkey,
               trim(regexp_replace(regexp_replace(lower(p_name),
                    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS decoded,
               CAST(CASE WHEN trim(regexp_replace(regexp_replace(lower(p_name),
                    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) = '' THEN 0
                    ELSE len(string_split(trim(regexp_replace(regexp_replace(lower(p_name),
                    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) END AS INT) AS n_words
        FROM part
    """,
    "crnn_read": """
        SELECT p_partkey,
               trim(regexp_replace(regexp_replace(lower(p_name),
                    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS decoded,
               CAST(CASE WHEN trim(regexp_replace(regexp_replace(lower(p_name),
                    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) = '' THEN 0
                    ELSE len(string_split(trim(regexp_replace(regexp_replace(lower(p_name),
                    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) END AS INT) AS n_words
        FROM part
    """,
    # read with TRAINED weights over "name key" text (digits covered by the
    # appended p_partkey): same sanitize projection, different source text
    "crnn_multifont": """
        WITH t AS (
            SELECT p_partkey,
                   CASE WHEN p_partkey % 2 = 1 THEN 'bold' ELSE 'base' END AS font,
                   trim(regexp_replace(regexp_replace(
                        lower(p_name) || ' ' || CAST(p_partkey AS VARCHAR),
                        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS decoded
            FROM part
        )
        SELECT p_partkey, font, decoded,
               CAST(CASE WHEN decoded = '' THEN 0
                    ELSE len(string_split(decoded, ' ')) END AS INT) AS n_words
        FROM t
    """,
    "crnn_trained": """
        WITH t AS (
            SELECT p_partkey,
                   trim(regexp_replace(regexp_replace(
                        lower(p_name) || ' ' || CAST(p_partkey AS VARCHAR),
                        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS decoded
            FROM part
        )
        SELECT p_partkey, decoded,
               CAST(CASE WHEN decoded = '' THEN 0
                    ELSE len(string_split(decoded, ' ')) END AS INT) AS n_words
        FROM t
    """,
    # trained detect: decoded text + box geometry are arithmetic over the
    # sanitized "name key" text (detect_train proves zero training errors,
    # so boxes are exactly the dilated-ink components).  Tight ink width
    # per word = 6*len - 1 minus one edge column per narrow glyph ('i'/'1'
    # occupy cols 1..3 of the 5-col cell); height = 7 font rows.
    "east_trained": """
        WITH t AS (
            SELECT p_partkey,
                   trim(regexp_replace(regexp_replace(
                        lower(p_name) || ' ' || CAST(p_partkey AS VARCHAR),
                        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS decoded
            FROM part
        ),
        words AS (
            SELECT p_partkey, decoded,
                   unnest(string_split(decoded, ' ')) AS wd
            FROM t WHERE decoded <> ''
        )
        SELECT p_partkey,
               any_value(decoded) AS decoded,
               CAST(count(*) AS INT) AS n_boxes,
               CAST(SUM(6 * len(wd) - 1
                    - CASE WHEN substr(wd, 1, 1) IN ('i', '1') THEN 1 ELSE 0 END
                    - CASE WHEN substr(wd, len(wd), 1) IN ('i', '1') THEN 1 ELSE 0 END)
                    AS BIGINT) AS sum_w,
               CAST(7 * count(*) AS BIGINT) AS sum_h
        FROM words GROUP BY p_partkey
    """,
    "host_templates": """
        WITH enriched AS (
            SELECT doc_id,
                   'site' || CAST(doc_id % 7 AS VARCHAR) || '.example' AS host,
                   'site ' || CAST(doc_id % 7 AS VARCHAR) || ' home products about contact'
                       || chr(10) || text ||
                   CASE WHEN doc_id % 3 <> 0
                        THEN chr(10) || 'copyright site ' || CAST(doc_id % 7 AS VARCHAR)
                        ELSE '' END AS text
            FROM documents
        ),
        lines AS (
            SELECT doc_id, host,
                   unnest(string_split(text, chr(10))) AS line,
                   generate_subscripts(string_split(text, chr(10)), 1) AS pos
            FROM enriched
        ),
        normed AS (
            SELECT doc_id, host, pos, line, trim(lower(line)) AS norm FROM lines
        ),
        post AS (
            SELECT DISTINCT host, norm, doc_id FROM normed WHERE len(norm) > 0
        ),
        dfreq AS (SELECT host, norm, count(*) AS df FROM post GROUP BY host, norm),
        npages AS (
            SELECT host, count(DISTINCT doc_id) AS n_pages FROM post GROUP BY host
        ),
        tpl AS (
            SELECT d.host, d.norm FROM dfreq d JOIN npages p USING (host)
            WHERE d.df >= 3 AND d.df * 100 >= 60 * p.n_pages
        )
        SELECT n.doc_id, n.host,
               coalesce(string_agg(CASE WHEN t.norm IS NULL THEN n.line END,
                                   chr(10) ORDER BY n.pos), '') AS clean_text,
               CAST(count(*) FILTER (WHERE t.norm IS NULL) AS BIGINT) AS n_kept,
               CAST(count(*) FILTER (WHERE t.norm IS NOT NULL) AS BIGINT) AS n_removed
        FROM normed n LEFT JOIN tpl t ON t.host = n.host AND t.norm = n.norm
        GROUP BY n.doc_id, n.host
    """,
    "embed_centroids": """
        WITH dims AS (
            SELECT label,
                   CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
                   CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1e6) AS BIGINT) AS micro
            FROM embeddings
        )
        SELECT label, dim,
               CAST(SUM(micro) AS BIGINT) AS sum_micro,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(FLOOR(SUM(micro) * 1.0 / COUNT(*)) AS BIGINT) AS centroid_micro
        FROM dims GROUP BY label, dim
    """,
    "pandas_udf_lev": """
        SELECT c_custkey,
               round(levenshtein(c_name, 'Customer#000000042') * 1.0 / 18, 6) AS lev_norm
        FROM customer
    """,
    "embed_dup_pairs": """
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) >= 0.3
    """,
    "emission_filter": """
        WITH d AS (
            SELECT doc_id, lang, trim(text) AS t,
                   lag(trim(text)) OVER (PARTITION BY lang ORDER BY doc_id) AS prev
            FROM documents
        )
        SELECT doc_id, lang,
               (length(t) > 0 AND t LIKE '% %' AND regexp_matches(t, '[a-zA-Z]')) AS base_ok,
               coalesce(
                   CASE WHEN prev IS NOT NULL AND length(prev) > 0
                        THEN (levenshtein(t, prev) * 1.0 / length(prev)) < 0.2
                        ELSE FALSE END, FALSE) AS near_dup,
               ((length(t) > 0 AND t LIKE '% %' AND regexp_matches(t, '[a-zA-Z]'))
                AND NOT coalesce(
                    CASE WHEN prev IS NOT NULL AND length(prev) > 0
                         THEN (levenshtein(t, prev) * 1.0 / length(prev)) < 0.2
                         ELSE FALSE END, FALSE)) AS emit
        FROM d
    """,
    "sort_boxes_sql": """
        WITH b AS (
            SELECT 'doc' || CAST(l_orderkey AS VARCHAR) AS url,
                   CAST(l_linenumber * 100000000 + l_partkey * 1000 + l_suppkey AS BIGINT) AS box_id,
                   CAST(10 + (l_linenumber % 4) * 25 AS DOUBLE) AS x0,
                   CAST(20 + (l_partkey % 6) * 12 AS DOUBLE) AS y0,
                   CAST(10 + (l_linenumber % 4) * 25 + 8 + l_suppkey % 5 AS DOUBLE) AS x1,
                   CAST(20 + (l_partkey % 6) * 12 + 3 + l_partkey % 7 AS DOUBLE) AS y1
            FROM lineitem WHERE l_orderkey % 50 = 0
        )
        SELECT url, box_id,
               CAST(row_number() OVER (PARTITION BY url ORDER BY x0 + y0 ASC, box_id) AS INTEGER) AS corner_rank,
               CAST(row_number() OVER (PARTITION BY url ORDER BY (x1 - x0) * (y1 - y0) DESC, box_id) AS INTEGER) AS area_rank,
               CAST(row_number() OVER (PARTITION BY url ORDER BY (x0 + x1) / 2 + (y0 + y1) / 2 ASC, box_id) AS INTEGER) AS center_rank
        FROM b
    """,
    # corpus filters: same deterministic messy-input synthesis as the Spark
    # queries, independent list-lambda/RE2 derivations of the operators
    "c4_clean": r"""
        WITH messy AS (SELECT doc_id,
               substr(text, 1, 60) || '.' AS l1,
               substr(text, 61, 40) AS l2,
               'please enable javascript to view ' || substr(text, 1, 12) || '.' AS l3,
               CASE WHEN doc_id % 5 = 0 THEN 'too short.'
                    ELSE substr(text, 101, 50) || '!' END AS l4,
               CASE WHEN doc_id % 7 = 0 THEN 'uses { braces } badly.'
                    ELSE substr(text, 151, 45) || '?' END AS l5,
               CASE WHEN doc_id % 11 = 0 THEN 'standard lorem ipsum filler text.'
                    ELSE substr(text, 201, 30) || '.' END AS l6
             FROM documents),
        pages AS (SELECT doc_id,
               l1 || chr(10) || l2 || chr(10) || l3 || chr(10) || l4
                  || chr(10) || l5 || chr(10) || l6 AS text FROM messy),
        lined AS (SELECT doc_id, text,
               list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                           x -> x <> '') AS lines FROM pages),
        kept AS (SELECT doc_id, text, lines,
               list_filter(lines, ln -> regexp_matches(ln, '[.!?"]$')
                   AND len(list_filter(string_split_regex(ln, '\s+'), w -> w <> '')) >= 3
                   AND NOT contains(lower(ln), 'javascript')) AS k FROM lined)
        SELECT doc_id, CAST(len(lines) AS INT) AS n_lines,
               CAST(len(k) AS INT) AS n_kept,
               list_aggregate(k, 'string_agg', chr(10)) AS clean_text
        FROM kept
        WHERE NOT contains(lower(text), 'lorem ipsum')
          AND NOT contains(text, '{') AND len(k) >= 3
    """,
    "pii_redact": r"""
        WITH messy AS (SELECT doc_id, substr(text, 1, 80) ||
               CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id % 50 AS VARCHAR)
                        || '@mail' || CAST(doc_id % 5 AS VARCHAR) || '.org now'
                    WHEN doc_id % 3 = 1 THEN ' call 415-555-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        || ' or visit 192.168.' || CAST(doc_id % 256 AS VARCHAR)
                        || '.' || CAST(doc_id % 100 AS VARCHAR)
                    ELSE ' no pii in this one' END AS text FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
          CAST(len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS INT) AS n_phones,
          CAST(len(regexp_extract_all(
               regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                              '[EMAIL]', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ips,
          regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS redacted_text
        FROM messy
    """,
    "ngram_spans": r"""
        WITH messy AS (SELECT doc_id, substr(text, 1, 200) ||
               CASE WHEN doc_id % 3 = 0
                    THEN ' subscribe to our newsletter for daily updates today'
                    ELSE '' END AS text FROM documents),
        toks AS (SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '') AS t
             FROM messy),
        grams AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 5
               THEN list_transform(range(1, len(t) - 3),
                    i -> list_aggregate(t[CAST(i AS INT):CAST(i AS INT) + 4],
                                        'string_agg', ' '))
               ELSE CAST([] AS VARCHAR[]) END) AS ngram FROM toks),
        per_doc AS (SELECT doc_id, ngram, CAST(count(*) AS BIGINT) AS n_occ
             FROM grams GROUP BY 1, 2),
        flagged AS (SELECT doc_id, n_occ,
               count(*) OVER (PARTITION BY ngram) AS doc_freq FROM per_doc)
        SELECT doc_id, CAST(sum(n_occ) AS BIGINT) AS n_ngrams,
               CAST(sum(CASE WHEN doc_freq > 1 THEN n_occ ELSE 0 END) AS BIGINT) AS n_dup,
               round(sum(CASE WHEN doc_freq > 1 THEN n_occ ELSE 0 END) / sum(n_occ), 4)
                   AS dup_ratio
        FROM flagged GROUP BY doc_id
    """,
    "hash_embed": r"""
        WITH toks AS (SELECT doc_id,
               list_filter(string_split_regex(trim(substr(text, 1, 300)), '\s+'),
                           w -> w <> '') AS t FROM documents),
        h AS (SELECT doc_id, len(t) AS n_tokens,
               list_transform(t, w -> list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(split(w, ''), c -> CAST(ascii(c) AS BIGINT))),
                   (a, b) -> (a * 31 + b) % 1000000007)) AS hs FROM toks)
        SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
               list_aggregate(list_transform(range(0, 16),
                   b -> CAST(coalesce(list_sum(list_transform(hs,
                        x -> CASE WHEN x % 16 = b
                                  THEN (CASE WHEN x % 32 < 16 THEN 1 ELSE -1 END)
                                  ELSE 0 END)), 0) AS VARCHAR)),
                   'string_agg', ',') AS emb_csv
        FROM h
    """,
    "bigram_lm": r"""
        WITH toks AS (SELECT doc_id,
               list_filter(string_split_regex(trim(lower(substr(text, 1, 300))), '\s+'),
                           w -> w <> '') AS t FROM documents),
        per AS (SELECT doc_id,
               CAST(coalesce(list_sum(list_transform(t,
                    w -> CASE WHEN len(w) >= 2 THEN len(w) - 1 ELSE 0 END)), 0)
                    AS BIGINT) AS n_bigrams,
               CAST(coalesce(list_sum(list_transform(t,
                    w -> len(list_filter(
                        list_transform(range(1, len(w)), i -> substr(w, CAST(i AS INT), 2)),
                        b -> list_contains(['th','he','in','er','an','re','on','at','en',
                                            'nd','ti','es','or','te','of','ed','is','it',
                                            'al','ar','st','to','nt','ng','se','ha','as',
                                            'ou','io','le'], b))))), 0)
                    AS BIGINT) AS n_known
             FROM toks)
        SELECT doc_id, n_bigrams, n_known,
               CASE WHEN n_bigrams > 0 THEN round(n_known / n_bigrams, 4) END
                   AS bigram_score
        FROM per
    """,
    "dup_spans": r"""
        WITH messy AS (SELECT doc_id, substr(text, 1, 200) ||
               CASE WHEN doc_id % 3 = 0
                    THEN ' subscribe to our newsletter for daily updates today'
                    ELSE '' END AS text FROM documents),
        toks AS (SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '') AS t
             FROM messy),
        grams AS (SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
               list_aggregate(t[CAST(u.i AS INT):CAST(u.i AS INT) + 4],
                              'string_agg', ' ') AS ngram
             FROM toks, unnest(CASE WHEN len(t) >= 5 THEN range(1, len(t) - 3)
                               ELSE CAST([] AS BIGINT[]) END) AS u(i)),
        per AS (SELECT doc_id, ngram, list(pos) AS starts FROM grams GROUP BY 1, 2),
        flagged AS (SELECT doc_id, starts,
               count(*) OVER (PARTITION BY ngram) AS doc_freq FROM per),
        dup AS (SELECT doc_id, flatten(list(starts)) AS dup_starts
             FROM flagged WHERE doc_freq > 1 GROUP BY doc_id),
        joined AS (SELECT toks.doc_id, t,
               coalesce(dup_starts, CAST([] AS BIGINT[])) AS ds
             FROM toks LEFT JOIN dup ON toks.doc_id = dup.doc_id),
        rebuilt AS (SELECT doc_id, t,
               list_filter(range(1, len(t) + 1),
                   i -> len(list_filter(ds, s -> s <= i AND i < s + 5)) = 0) AS kept
             FROM joined)
        SELECT doc_id, CAST(len(t) AS INT) AS n_tokens,
               CAST(len(t) - len(kept) AS INT) AS n_removed,
               coalesce(list_aggregate(list_transform(kept, i -> t[CAST(i AS INT)]),
                        'string_agg', ' '), '') AS clean_text
        FROM rebuilt
    """,
    "decontaminate": r"""
        WITH bench AS (SELECT substr(text, 21, 120) AS passage
             FROM documents WHERE doc_id % 97 = 0),
        btoks AS (SELECT list_filter(string_split_regex(trim(passage), '\s+'),
                         w -> w <> '') AS t FROM bench),
        bgrams AS (SELECT DISTINCT
               list_aggregate(t[CAST(u.i AS INT):CAST(u.i AS INT) + 7],
                              'string_agg', ' ') AS ngram
             FROM btoks, unnest(CASE WHEN len(t) >= 8 THEN range(1, len(t) - 6)
                                ELSE CAST([] AS BIGINT[]) END) AS u(i)),
        dtoks AS (SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '') AS t
             FROM documents),
        dgrams AS (SELECT DISTINCT doc_id,
               list_aggregate(t[CAST(u.i AS INT):CAST(u.i AS INT) + 7],
                              'string_agg', ' ') AS ngram
             FROM dtoks, unnest(CASE WHEN len(t) >= 8 THEN range(1, len(t) - 6)
                                ELSE CAST([] AS BIGINT[]) END) AS u(i)),
        hits AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
             FROM dgrams JOIN bgrams USING (ngram) GROUP BY doc_id)
        SELECT d.doc_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
               coalesce(h.n_hits, 0) > 0 AS is_contaminated
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
    "stratified_sample": r"""
        WITH r AS (SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                   ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296 ASC,
                            doc_id ASC) AS sample_rank,
               count(*) OVER (PARTITION BY lang) AS n_stratum
             FROM documents)
        SELECT doc_id, lang, CAST(sample_rank AS BIGINT) AS sample_rank,
               CAST(n_stratum AS BIGINT) AS n_stratum
        FROM r WHERE sample_rank <= ceil(n_stratum * 0.25)
    """,
    "url_latest": """
        WITH snaps AS (SELECT
               'https://host' || CAST(doc_id % 50 AS VARCHAR) || '.example/p/'
                   || CAST(doc_id AS VARCHAR) AS url,
               CAST(1700000000 + u.v * 86400 + doc_id % 1000 AS BIGINT) AS warc_epoch,
               md5(substr(text, 1, 50) ||
                   CASE WHEN (doc_id + u.v) % 2 = 0 THEN ' rev' ELSE '' END)
                   AS fingerprint
             FROM documents, unnest(range(0, doc_id % 3 + 1)) AS u(v)),
        r AS (SELECT url, warc_epoch, fingerprint,
               row_number() OVER (PARTITION BY url
                   ORDER BY warc_epoch DESC, fingerprint ASC) AS rn
             FROM snaps)
        SELECT url, warc_epoch, fingerprint FROM r WHERE rn = 1
    """,
    "revisit": """
        WITH snaps AS (SELECT
               'https://host' || CAST(doc_id % 50 AS VARCHAR) || '.example/p/'
                   || CAST(doc_id AS VARCHAR) AS url,
               CAST(1700000000 + u.v * 86400 + doc_id % 1000 AS BIGINT)
                   AS warc_epoch,
               md5(substr(text, 1, 50) ||
                   CASE WHEN (doc_id + u.v) % 2 = 0 THEN ' rev' ELSE '' END)
                   AS fingerprint
             FROM documents, unnest(range(0, doc_id % 3 + 1)) AS u(v)),
        w AS (SELECT *, min(warc_epoch) OVER
                  (PARTITION BY url, fingerprint) AS orig
              FROM snaps)
        SELECT url, warc_epoch, fingerprint,
               CASE WHEN warc_epoch > orig THEN 'revisit'
                    ELSE 'response' END AS record_type,
               CASE WHEN warc_epoch > orig THEN orig END AS refers_to_epoch
        FROM w
    """,
    "redirects": """
        WITH RECURSIVE e AS MATERIALIZED (SELECT
               'https://host' || CAST(doc_id % 50 AS VARCHAR) || '.example/p/'
                   || CAST(doc_id AS VARCHAR) AS url,
               'https://host' || CAST((doc_id - 1) % 50 AS VARCHAR)
                   || '.example/p/' || CAST(doc_id - 1 AS VARCHAR)
                   AS redirect_to
             FROM documents WHERE doc_id % 13 <> 0),
        nodes AS (SELECT DISTINCT url FROM (
               SELECT url FROM e UNION ALL SELECT redirect_to FROM e)),
        walk AS (
            SELECT url AS start, url AS cur, 0 AS hops FROM nodes
            UNION ALL
            SELECT w.start, e.redirect_to, w.hops + 1
            FROM walk w JOIN e ON e.url = w.cur WHERE w.hops < 8),
        fin AS (SELECT start, max(hops) AS h FROM walk GROUP BY 1)
        SELECT w.start AS url, w.cur AS final_url,
               CAST(w.hops AS BIGINT) AS n_hops,
               NOT EXISTS (SELECT 1 FROM e WHERE e.url = w.cur) AS resolved
        FROM walk w JOIN fin f ON w.start = f.start AND w.hops = f.h
    """,
    "mirror_hosts": """
        WITH s AS MATERIALIZED (SELECT
               'm' || CAST((doc_id + u.v * 17) % 40 AS VARCHAR) AS host,
               CASE WHEN doc_id % 11 = 0 THEN 'BOILER'
                    ELSE md5(substr(text, 1, 40)) END AS fingerprint
             FROM documents, unnest(range(0, doc_id % 3 + 1)) AS u(v)),
        hf AS (SELECT DISTINCT host, fingerprint FROM s),
        ph AS (SELECT host, count(*) AS n_fp FROM hf GROUP BY 1),
        fps AS (SELECT fingerprint FROM hf GROUP BY 1
                HAVING count(*) BETWEEN 2 AND 8),
        pairs AS (SELECT a.host AS host_a, b.host AS host_b,
                         count(*) AS shared
             FROM hf a
             JOIN hf b ON a.fingerprint = b.fingerprint AND a.host < b.host
             JOIN fps f ON f.fingerprint = a.fingerprint
             GROUP BY 1, 2 HAVING count(*) >= 2)
        SELECT p.host_a, p.host_b, CAST(p.shared AS BIGINT) AS shared,
               CAST((p.shared * 1000) // least(pa.n_fp, pb.n_fp) AS BIGINT)
                   AS containment_milli
        FROM pairs p JOIN ph pa ON pa.host = p.host_a
                     JOIN ph pb ON pb.host = p.host_b
    """,
    "page_meta": """
        WITH u AS (SELECT doc_id,
               'https://host' || CAST(doc_id % 50 AS VARCHAR) || '.example'
                   AS host,
               'https://host' || CAST(doc_id % 50 AS VARCHAR) || '.example/p/'
                   || CAST(doc_id AS VARCHAR) AS url
             FROM documents)
        SELECT url,
               CASE WHEN doc_id % 4 <> 0
                    THEN 'Doc ' || CAST(doc_id AS VARCHAR) || ' — news'
               END AS title,
               CASE WHEN doc_id % 3 <> 0 THEN
                    CASE WHEN doc_id % 5 = 0
                         THEN host || '/canon/' || CAST(doc_id AS VARCHAR)
                         ELSE 'https://canon.example/c/'
                              || CAST(doc_id AS VARCHAR) END
               END AS canonical_url,
               CASE WHEN doc_id % 2 = 0
                    THEN 'Summary ' || CAST(doc_id AS VARCHAR)
               END AS description,
               CASE WHEN doc_id % 7 <> 0 THEN 'en-gb' END AS html_lang,
               CAST(CASE WHEN doc_id % 6 = 0 THEN 2 ELSE 0 END AS INT)
                   AS n_hreflang
        FROM u
    """,
    "http_headers": """
        SELECT 'https://host' || CAST(doc_id % 50 AS VARCHAR)
                   || '.example/p/' || CAST(doc_id AS VARCHAR) AS url,
               CAST(CASE WHEN doc_id % 10 = 7 THEN 301
                         WHEN doc_id % 10 = 9 THEN 404
                         ELSE 200 END AS INT) AS status,
               CASE WHEN doc_id % 2 = 0 THEN 'text/html'
                    ELSE 'application/pdf' END AS content_type,
               CASE WHEN doc_id % 2 = 0 THEN 'utf-8' END AS charset,
               CASE WHEN doc_id % 3 <> 0 AND doc_id % 9 = 1
                    THEN 'W/"v' || CAST(doc_id AS VARCHAR) || '"'
                    WHEN doc_id % 3 <> 0
                    THEN '"v' || CAST(doc_id AS VARCHAR) || '"'
               END AS etag,
               CASE WHEN doc_id % 4 <> 1
                    THEN epoch_ms(make_timestamp(2026, 6, doc_id % 27 + 1,
                                                 doc_id % 14 + 10, 15, 30.0))
               END AS last_modified_ms,
               CAST(CASE WHEN doc_id % 5 = 0 THEN 3600 END AS BIGINT)
                   AS max_age_s,
               doc_id % 5 = 1 AS no_store,
               CASE WHEN doc_id % 10 = 7
                    THEN 'https://moved.example/p/' || CAST(doc_id AS VARCHAR)
               END AS location,
               CASE WHEN doc_id % 5 = 1 THEN 'refetch'
                    WHEN doc_id % 3 <> 0 THEN 'etag'
                    WHEN doc_id % 4 <> 1 THEN 'last-modified'
                    ELSE 'none' END AS strategy
        FROM documents
    """,
    "url_features": """
        WITH u AS (SELECT doc_id,
               'https://'
               || CASE WHEN doc_id % 3 = 0
                       THEN 'sub' || CAST(doc_id AS VARCHAR) || '.img-'
                            || CAST(doc_id AS VARCHAR) || '.example.com'
                       ELSE 'example.com' END
               || CASE WHEN doc_id % 2 = 0
                       THEN '/a/b/c/' || CAST(doc_id AS VARCHAR)
                       ELSE '/p' || CAST(doc_id AS VARCHAR) END
               || CASE WHEN doc_id % 4 = 0 THEN '?x=1&y=2&z=3'
                       WHEN doc_id % 4 = 1 THEN '?q=' ELSE '' END
               || CASE WHEN doc_id % 5 = 0 THEN '#frag-9' ELSE '' END AS url
             FROM documents),
        parts AS (SELECT doc_id, url,
               regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)
                   AS host,
               regexp_extract(url,
                   '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
               regexp_extract(url, '\\?([^#]*)', 1) AS q
             FROM u)
        SELECT doc_id, url,
               CAST(length(url) AS INT) AS url_len,
               CAST(length(host) AS INT) AS host_len,
               CAST(length(host)
                    - length(regexp_replace(host, '\\.', '', 'g')) AS INT)
                   AS subdomain_depth,
               CAST(length(host)
                    - length(regexp_replace(host, '-', '', 'g')) AS INT)
                   AS host_hyphens,
               CAST(length(path)
                    - length(regexp_replace(path, '/', '', 'g')) AS INT)
                   AS path_depth,
               CAST(CASE WHEN q = '' THEN 0
                         ELSE length(q)
                              - length(regexp_replace(q, '&', '', 'g')) + 1
                    END AS INT) AS n_params,
               CAST((1000 * (length(url)
                    - length(regexp_replace(url, '[0-9]', '', 'g'))))
                    // length(url) AS INT) AS digit_milli
        FROM parts
    """,
    "soft404": """
        SELECT doc_id,
               'https://h.example/p/' || CAST(doc_id AS VARCHAR) AS url,
               CAST(CASE WHEN doc_id % 5 = 0 THEN 404 ELSE 200 END AS INT)
                   AS status,
               CASE WHEN doc_id % 3 = 0 THEN '404 Not Found — example'
                    WHEN doc_id % 3 = 1 THEN 'Article about cats'
               END AS title,
               CASE WHEN doc_id % 4 = 0
                         THEN 'The page you requested was not found.'
                    WHEN doc_id % 4 = 1
                         THEN 'Long article mentioning a 404 error once. '
                              || repeat('lorem ipsum dolor sit amet ', 10)
                    WHEN doc_id % 4 = 2 THEN 'Normal short note.'
               END AS text,
               doc_id % 3 = 0 AS title_404,
               doc_id % 4 IN (0, 1) AS body_404,
               doc_id % 4 <> 1 AS short_body,
               doc_id % 5 <> 0 AND (doc_id % 3 = 0 OR doc_id % 4 = 0)
                   AS is_soft404
        FROM documents
    """,
    "provenance": """
        SELECT 'https://host' || CAST(doc_id % 50 AS VARCHAR)
                   || '.example/p/' || CAST(doc_id AS VARCHAR) AS url,
               CASE WHEN doc_id % 3 = 0
                    THEN 'https://creativecommons.org/licenses/by-sa/4.0/'
                    WHEN doc_id % 3 = 1
                    THEN 'https://host' || CAST(doc_id % 50 AS VARCHAR)
                         || '.example/license'
               END AS license_url,
               CASE WHEN doc_id % 3 = 0 THEN 'by-sa'
                    WHEN doc_id % 6 = 5 THEN 'zero'
               END AS cc_variant,
               CASE WHEN doc_id % 3 = 0 THEN '4.0'
                    WHEN doc_id % 6 = 5 THEN '1.0'
               END AS cc_version,
               CASE WHEN doc_id % 4 = 0
                    THEN epoch_ms(make_timestamp(2026, 3, doc_id % 9 + 10,
                                                 doc_id % 12 + 10, 15, 30.0))
                    WHEN doc_id % 4 = 1
                    THEN epoch_ms(make_timestamp(2026, 4, doc_id % 9 + 10,
                                                 doc_id % 12 + 10, 15, 30.0))
                         - 7200000
               END AS published_ms
        FROM documents
    """,
    "pagination_chains": """
        WITH RECURSIVE e AS MATERIALIZED (SELECT
               'https://host' || CAST(doc_id % 50 AS VARCHAR) || '.example/p/'
                   || CAST(doc_id AS VARCHAR) AS url,
               'https://host' || CAST((doc_id + 1) % 50 AS VARCHAR)
                   || '.example/p/' || CAST(doc_id + 1 AS VARCHAR) AS nxt
             FROM documents WHERE doc_id % 4 <> 3),
        nodes AS (SELECT DISTINCT url FROM (
               SELECT url FROM e UNION ALL SELECT nxt FROM e)),
        walk AS (
            SELECT url AS start, url AS cur, 0 AS hops FROM nodes
            UNION ALL
            SELECT w.start, e.nxt, w.hops + 1
            FROM walk w JOIN e ON e.url = w.cur WHERE w.hops < 4),
        fin AS (SELECT start, max(hops) AS h FROM walk GROUP BY 1)
        SELECT w.start AS url, w.cur AS series_key,
               CAST(w.hops AS BIGINT) AS pos_from_end,
               NOT EXISTS (SELECT 1 FROM e WHERE e.url = w.cur) AS complete
        FROM walk w JOIN fin f ON w.start = f.start AND w.hops = f.h
    """,
    "og_meta": """
        WITH u AS (SELECT doc_id,
               'https://host' || CAST(doc_id % 50 AS VARCHAR) || '.example'
                   AS host,
               'https://host' || CAST(doc_id % 50 AS VARCHAR) || '.example/p/'
                   || CAST(doc_id AS VARCHAR) AS url
             FROM documents)
        SELECT url,
               CASE WHEN doc_id % 3 <> 0
                    THEN 'OG Doc ' || CAST(doc_id AS VARCHAR)
                    WHEN doc_id % 6 = 0 THEN 'WRONG duplicate'
               END AS og_title,
               CASE WHEN doc_id % 2 = 0 THEN 'article' END AS og_type,
               CASE WHEN doc_id % 4 <> 0
                    THEN host || '/og/' || CAST(doc_id AS VARCHAR)
               END AS og_url,
               CASE WHEN doc_id % 5 = 0
                    THEN 'https://img.example/' || CAST(doc_id AS VARCHAR)
                         || '.jpg'
               END AS og_image,
               CASE WHEN doc_id % 2 = 0 THEN 'NewsArticle'
                    WHEN doc_id % 4 = 1 THEN 'WebSite'
               END AS ld_type,
               CAST(CASE WHEN doc_id % 2 = 0 OR doc_id % 4 = 1 THEN 1
                         ELSE 0 END AS INT) AS n_ld
        FROM u
    """,
    # snapshot_diff: the construction applies exactly one base-line edit
    # per snapshot (+ a conditional append), all lines unique, so the
    # minimal edit script is UNIQUE as a set and derivable arithmetically
    "snapshot_diff": """
        WITH ed AS (
            SELECT doc_id, u.v AS v,
                   CAST(3 + doc_id % 4 AS INT) AS n,
                   CAST((doc_id * 13 + u.v * 7) % (3 + doc_id % 4) AS INT) AS p,
                   len(list_filter(range(1, u.v + 1),
                       s -> (doc_id * 13 + s * 7) % (3 + doc_id % 4)
                            = (doc_id * 13 + u.v * 7) % (3 + doc_id % 4)))
                       AS cnt,
                   len(list_filter(range(1, u.v + 1),
                       s -> (doc_id + s) % 3 = 0)) AS na,
                   'https://host' || CAST(doc_id % 50 AS VARCHAR)
                       || '.example/p/' || CAST(doc_id AS VARCHAR) AS url,
                   CAST(1700000000 + (u.v - 1) * 86400 AS BIGINT) AS ts_from,
                   CAST(1700000000 + u.v * 86400 AS BIGINT) AS ts_to
            FROM documents, unnest(range(1, doc_id % 3 + 2)) AS u(v)
        )
        SELECT url, ts_from, ts_to, '-' AS op,
               p AS a_idx, CAST(NULL AS INT) AS b_idx,
               'para ' || CAST(p AS VARCHAR) || ' rev '
                   || CAST(cnt - 1 AS VARCHAR) AS line
        FROM ed
        UNION ALL
        SELECT url, ts_from, ts_to, '+',
               CAST(NULL AS INT), p,
               'para ' || CAST(p AS VARCHAR) || ' rev ' || CAST(cnt AS VARCHAR)
        FROM ed
        UNION ALL
        SELECT url, ts_from, ts_to, '+',
               CAST(NULL AS INT), CAST(n + na - 1 AS INT),
               'appended ' || CAST(v AS VARCHAR)
        FROM ed WHERE (doc_id + v) % 3 = 0
    """,
    "snapshot_drift": r"""
        WITH snaps AS MATERIALIZED (SELECT
               'https://host' || CAST(doc_id % 50 AS VARCHAR) || '.example/p/'
                   || CAST(doc_id AS VARCHAR) AS url,
               CAST(1700000000 + u.v * 86400 + doc_id % 1000 AS BIGINT)
                   AS warc_epoch,
               substr(text, 1, 200) ||
                   CASE WHEN (doc_id + u.v) % 2 = 0
                        THEN ' revision marker alpha' ELSE '' END AS snap_text
             FROM documents, unnest(range(0, doc_id % 3 + 1)) AS u(v)),
        sh AS (SELECT url, warc_epoch,
               list_distinct([list_aggregate(w[i:i+2], 'string_agg', ' ')
                              for i in range(1, greatest(len(w) - 1, 1))])
                   AS sh
             FROM (SELECT url, warc_epoch,
                     list_filter(string_split_regex(lower(snap_text),
                                                    '[^a-z0-9]+'),
                                 x -> x <> '') AS w
                   FROM snaps)),
        lagged AS (SELECT url, warc_epoch, sh,
               lag(sh) OVER (PARTITION BY url ORDER BY warc_epoch) AS prev
             FROM sh)
        SELECT url, warc_epoch,
               CAST(CASE WHEN len(list_distinct(list_concat(sh, prev))) = 0
                         THEN 0
                         ELSE 1000 - (len(list_intersect(sh, prev)) * 1000)
                              // len(list_distinct(list_concat(sh, prev)))
                    END AS BIGINT) AS drift_milli
        FROM lagged WHERE prev IS NOT NULL
    """,
    "mirror_clusters": """
        WITH RECURSIVE s AS MATERIALIZED (SELECT
               'm' || CAST((doc_id + u.v * 17) % 40 AS VARCHAR) AS host,
               CASE WHEN doc_id % 11 = 0 THEN 'BOILER'
                    ELSE md5(substr(text, 1, 40)) END AS fingerprint
             FROM documents, unnest(range(0, doc_id % 3 + 1)) AS u(v)),
        hf AS MATERIALIZED (SELECT DISTINCT host, fingerprint FROM s),
        fps AS MATERIALIZED (SELECT fingerprint FROM hf GROUP BY 1
                HAVING count(*) BETWEEN 2 AND 8),
        prs AS MATERIALIZED (SELECT a.host AS host_a, b.host AS host_b
             FROM hf a
             JOIN hf b ON a.fingerprint = b.fingerprint AND a.host < b.host
             JOIN fps f ON f.fingerprint = a.fingerprint
             GROUP BY 1, 2 HAVING count(*) >= 2),
        und AS MATERIALIZED (SELECT host_a AS a, host_b AS b FROM prs
             UNION ALL SELECT host_b, host_a FROM prs),
        reach AS (
            SELECT a AS host, a AS r FROM und
            UNION
            SELECT re.host, u.b FROM reach re JOIN und u ON u.a = re.r)
        SELECT host, min(r) AS canonical_host FROM reach GROUP BY 1
    """,
    "surt": r"""
        WITH u AS (SELECT
               'https://' || CASE WHEN doc_id % 4 = 0 THEN 'www.' ELSE '' END
               || 'Host' || CAST(doc_id % 50 AS VARCHAR) || '.Example.org'
               || CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END
               || '/P/' || CAST(doc_id AS VARCHAR)
               || CASE WHEN doc_id % 2 = 0
                       THEN '?b=2&a=' || CAST(doc_id % 7 AS VARCHAR)
                       ELSE '' END
               || CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS url
             FROM documents),
        parts AS (SELECT url,
               regexp_replace(regexp_replace(regexp_replace(
                   lower(regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)),
                   '^[^@]*@', ''), ':(80|443)$', ''), '^www\.', '') AS host,
               regexp_extract(url,
                   '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path,
               regexp_extract(url, '\?([^#]*)', 1) AS query
             FROM u)
        SELECT url,
               list_aggregate(list_reverse(string_split(host, '.')),
                              'string_agg', ',')
               || ')'
               || CASE WHEN path = '' THEN '/' ELSE path END
               || CASE WHEN query <> ''
                       THEN '?' || list_aggregate(
                           list_sort(string_split(query, '&')),
                           'string_agg', '&')
                       ELSE '' END AS surt
        FROM parts
    """,
    "url_changes": """
        WITH snaps AS (SELECT
               'https://host' || CAST(doc_id % 50 AS VARCHAR) || '.example/p/'
                   || CAST(doc_id AS VARCHAR) AS url,
               CAST(1700000000 + u.v * 86400 + doc_id % 1000 AS BIGINT) AS warc_epoch,
               md5(substr(text, 1, 50) ||
                   CASE WHEN (doc_id + u.v) % 2 = 0 THEN ' rev' ELSE '' END)
                   AS fingerprint
             FROM documents, unnest(range(0, doc_id % 3 + 1)) AS u(v)),
        lagged AS (SELECT url, warc_epoch, fingerprint,
               lag(fingerprint) OVER (PARTITION BY url
                   ORDER BY warc_epoch ASC, fingerprint ASC) AS prev
             FROM snaps)
        SELECT url, CAST(count(*) AS BIGINT) AS n_snapshots,
               CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> fingerprint
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
               CAST(min(warc_epoch) AS BIGINT) AS first_epoch,
               CAST(max(warc_epoch) AS BIGINT) AS last_epoch
        FROM lagged GROUP BY url
    """,
    "refresh_schedule": """
        WITH snaps AS (SELECT
               'https://host' || CAST(doc_id % 50 AS VARCHAR) || '.example/p/'
                   || CAST(doc_id AS VARCHAR) AS url,
               CAST(1700000000 + u.v * 86400 + doc_id % 1000 AS BIGINT) AS warc_epoch,
               md5(substr(text, 1, 50) ||
                   CASE WHEN (doc_id + u.v) % 2 = 0 THEN ' rev' ELSE '' END)
                   AS fingerprint
             FROM documents, unnest(range(0, doc_id % 3 + 1)) AS u(v)),
        lagged AS (SELECT url, warc_epoch, fingerprint,
               lag(fingerprint) OVER (PARTITION BY url
                   ORDER BY warc_epoch ASC, fingerprint ASC) AS prev
             FROM snaps),
        agg AS (SELECT url, CAST(count(*) AS BIGINT) AS n_snapshots,
               CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> fingerprint
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
               CAST(min(warc_epoch) AS BIGINT) AS first_epoch,
               CAST(max(warc_epoch) AS BIGINT) AS last_epoch
             FROM lagged GROUP BY url),
        est AS (SELECT *,
               CASE WHEN n_changes = 0 THEN CAST(2592000 AS BIGINT)
                    ELSE greatest(least(
                        (last_epoch - first_epoch) // greatest(n_changes, 1),
                        2592000), 3600) END AS fetch_interval_s
             FROM agg)
        SELECT url, n_snapshots, n_changes, first_epoch, last_epoch,
               CAST(fetch_interval_s AS BIGINT) AS fetch_interval_s,
               CAST(last_epoch + fetch_interval_s AS BIGINT) AS next_fetch_epoch
        FROM est
    """,
    "token_budget": r"""
        WITH scored AS (SELECT doc_id, lang,
               CAST((doc_id * 37) % 100 AS BIGINT) AS quality,
               CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                        w -> w <> '')) AS BIGINT) AS n_tokens
             FROM documents),
        cum AS (SELECT doc_id, lang, quality, n_tokens,
               CAST(sum(n_tokens) OVER (PARTITION BY lang
                    ORDER BY quality DESC, doc_id ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_tokens
             FROM scored)
        SELECT doc_id, lang, quality, n_tokens, cum_tokens
        FROM cum WHERE cum_tokens <= 3000
    """,
}


# -- link-graph oracles: arithmetic re-derivation of the builder's anchors
# (sources/pages.py: 4 nav links + n_outlinks related-footer links on every
# HTML-flavor page; residues NON_HTML_RESIDUES carry no anchors)

#: host of doc/target id k per sources/pages.host_of (bare label; the
#: fully-qualified hostname appends '.example')
_HOST_SQL = (
    "CASE WHEN ({k}) % 10 < 3 THEN 'host0' "
    "ELSE 'host' || CAST(1 + ({k}) % 37 AS VARCHAR) END"
)
_FQHOST_SQL = "(" + _HOST_SQL + " || '.example')"
#: related-footer target id per sources/pages.link_target
_TARGET_SQL = "((doc_id * 31 + 97 * u.j) % 4096)"

_LINK_SRC_SQL = f"""
        SELECT doc_id,
               'https://' || {_HOST_SQL.format(k='doc_id')} || '.example' AS origin,
               'https://' || {_HOST_SQL.format(k='doc_id')} || '.example/p/'
                   || CAST(doc_id AS VARCHAR) AS url
        FROM documents
        WHERE doc_id % 20 NOT IN (0, 5, 8, 10, 12, 15)
"""

_LINK_REL_SQL = f"""
        SELECT s.url,
               'https://' || {_HOST_SQL.format(k=_TARGET_SQL)} || '.example/p/'
                   || CAST({_TARGET_SQL} AS VARCHAR) AS dst_url,
               'related ' || CAST(u.j AS VARCHAR) AS anchor,
               CAST(4 + u.j AS INTEGER) AS pos
        FROM ({_LINK_SRC_SQL}) s, unnest(range(0, s.doc_id % 3 + 1)) AS u(j)
"""

#: inter-host edge derivation (nav links are always intra-host, so only
#: the related-footer links can survive the src<>dst filter)
_LINK_EDGE_SQL = f"""
        SELECT {_FQHOST_SQL.format(k='doc_id')} AS src_host,
               {_FQHOST_SQL.format(k=_TARGET_SQL)} AS dst_host
        FROM documents, unnest(range(0, doc_id % 3 + 1)) AS u(j)
        WHERE doc_id % 20 NOT IN (0, 5, 8, 10, 12, 15)
"""


def _pagerank_oracle_sql(n_iters: int = 5) -> str:
    """Unrolled fixed-point PageRank recurrence (integral // at each step),
    replaying operators/link_graph.pagerank_hosts exactly."""
    parts = [
        f"WITH rel AS ({_LINK_EDGE_SQL})",
        "edges AS (SELECT DISTINCT src_host, dst_host FROM rel"
        " WHERE src_host <> dst_host)",
        "nodes AS (SELECT src_host AS host FROM edges"
        " UNION SELECT dst_host FROM edges)",
        "outdeg AS (SELECT src_host, count(*) AS outdeg FROM edges"
        " GROUP BY src_host)",
        "r0 AS (SELECT host, CAST(1000000 AS BIGINT) AS pr FROM nodes)",
    ]
    for i in range(1, n_iters + 1):
        parts.append(
            f"r{i} AS (SELECT n.host, "
            "CAST(150000 + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS pr "
            "FROM nodes n LEFT JOIN ("
            "SELECT e.dst_host AS host, SUM(r.pr // o.outdeg) AS s "
            "FROM edges e JOIN outdeg o ON e.src_host = o.src_host "
            f"JOIN r{i-1} r ON r.host = e.src_host "
            "GROUP BY e.dst_host) s ON s.host = n.host)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT host, CAST(pr AS BIGINT) AS rank_scaled FROM r{n_iters}"
    )


def _hyperball_oracle_sql(rounds: int = 4, m: int = 64) -> str:
    """Replays operators/link_graph.hyperball_harmonic register by
    register: r0 = own-key register/rho per host (the hll_distinct oracle
    pipeline), each round ships src registers to dst and takes the
    register-wise max, and the harmonic sum telescopes the integer raw
    estimates. MATERIALIZED everywhere — each level is referenced twice
    (next level + its estimate)."""
    from .operators.sketches import _ALPHA_MILLI

    est = (
        f"CAST((CAST({_ALPHA_MILLI[m]} AS BIGINT) * {m} * {m}"
        " * CAST(power(2, 31) AS BIGINT))"
        " // (1000 * (sum(CAST(power(2, 31 - max_rho) AS BIGINT))"
        f" + ({m} - count(*)) * CAST(power(2, 31) AS BIGINT))) AS BIGINT)"
    )
    parts = [
        f"WITH rel AS ({_LINK_EDGE_SQL})",
        "edges AS MATERIALIZED (SELECT DISTINCT src_host, dst_host FROM rel"
        " WHERE src_host <> dst_host)",
        "nodes AS MATERIALIZED (SELECT src_host AS host FROM edges"
        " UNION SELECT dst_host FROM edges)",
        "r0 AS MATERIALIZED (SELECT host,"
        " CAST(list_reduce(list_prepend(CAST(312994679 AS BIGINT),"
        "   list_transform(split(host, ''), c -> CAST(ascii(c) AS BIGINT))),"
        f"  (a, b) -> (a * 37 + b) % 1000000007) % {m} AS INT) AS register,"
        " CAST(len(list_filter("
        "   list_transform(range(1, 31), p -> CAST(power(2, p) AS BIGINT)),"
        "   d -> xor((h2lin * h2lin) % 1000000007,"
        "            ((h2lin * h2lin) % 1000000007) >> 13) % d = 0))"
        " + 1 AS INT) AS max_rho"
        " FROM (SELECT host,"
        "   list_reduce(list_prepend(CAST(100998283 AS BIGINT),"
        "     list_transform(split(host, ''), c -> CAST(ascii(c) AS BIGINT))),"
        "     (a, b) -> (a * 41 + b) % 1000000007) AS h2lin"
        " FROM nodes))",
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"r{t} AS MATERIALIZED (SELECT host, register,"
            " MAX(max_rho) AS max_rho FROM ("
            f"SELECT host, register, max_rho FROM r{t-1}"
            " UNION ALL SELECT e.dst_host AS host, r.register, r.max_rho"
            f" FROM edges e JOIN r{t-1} r ON r.host = e.src_host"
            ") GROUP BY 1, 2)"
        )
    for t in range(rounds + 1):
        parts.append(f"e{t} AS (SELECT host, {est} AS est FROM r{t} GROUP BY host)")
    terms = " + ".join(
        f"((e{t}.est - e{t-1}.est) * 1000) // {t}" for t in range(1, rounds + 1)
    )
    joins = " ".join(f"JOIN e{t} ON e{t}.host = n.host" for t in range(rounds + 1))
    return (
        ",\n".join(parts)
        + f"\nSELECT n.host, CAST({terms} AS BIGINT) AS harmonic_milli,"
        f" e{rounds}.est AS ball_est FROM nodes n {joins}"
    )


ORACLE_SQL["hyperball"] = _hyperball_oracle_sql()

# rendezvous: both argmaxes re-derived with the same portable poly hash
# (shard-prefixed, then squared mod p — see rendezvous_shard's docstring
# for why both are load-bearing)
def _rendezvous_argmax_sql(shards, key: str = "url") -> str:
    lst = "[" + ", ".join(f"'{s}'" for s in shards) + "]"
    poly = (
        "list_reduce(list_prepend(CAST(312994679 AS BIGINT), "
        f"list_transform(split(s || '#' || {key}, ''), "
        "c -> CAST(ascii(c) AS BIGINT))), "
        "(x, y) -> (x * 37 + y) % 1000000007)"
    )
    return (
        f"list_reduce(list_transform({lst}, s -> "
        "{'h': " + poly + " * " + poly + " % 1000000007, 's': s}), "
        "(a, b) -> CASE WHEN b.h > a.h OR (b.h = a.h AND b.s > a.s) "
        "THEN b ELSE a END).s"
    )


ORACLE_SQL["fetch_plan"] = f"""
        WITH u AS (
            SELECT 'host' || CAST(doc_id % 97 AS VARCHAR) || '.example.com'
                   AS host
            FROM documents
        ), a AS (
            SELECT host,
                   {_rendezvous_argmax_sql(FETCHER_ROSTER, key="host")} AS fetcher
            FROM u
        ), per AS (
            SELECT fetcher, host, CAST(count(*) AS BIGINT) AS n_urls
            FROM a GROUP BY 1, 2
        )
        SELECT fetcher, host, n_urls,
               CAST(SUM(n_urls) OVER (PARTITION BY fetcher) AS BIGINT)
                   AS fetcher_total
        FROM per
"""

ORACLE_SQL["rendezvous"] = f"""
        WITH u AS (
            SELECT 'https://host' || CAST(doc_id % 50 AS VARCHAR)
                   || '.example/p/' || CAST(doc_id AS VARCHAR) AS url
            FROM documents
        ), x AS (
            SELECT url,
                   {_rendezvous_argmax_sql(RENDEZVOUS_SHARDS)} AS shard_a,
                   {_rendezvous_argmax_sql(RENDEZVOUS_SHARDS[:-1])} AS shard_b
            FROM u
        )
        SELECT url, shard_a, shard_b, shard_a <> shard_b AS moved FROM x
"""

# suffix_rank / sa_dups: the oracle materializes every suffix STRING and
# sorts it (fine at 400 docs); Spark must reproduce the identical order
# via prefix doubling without ever building a suffix string. dense_rank,
# not rank: suffixes that lie entirely inside the terminator tail
# ('0#', '#', '23#'...) collide across docs, and prefix doubling yields
# dense semantics for ties. Every tie is < 5 chars (any >=5-char suffix
# reaches its doc's unique '#doc_id#' tail), so the 25-gram dup filter
# never sees one.
_SA_ORACLE_BASE = """
        WITH d AS (
            SELECT doc_id,
                   regexp_replace(lower(substr(text, 1, 240)), '[^a-z ]', '', 'g')
                   || CASE WHEN doc_id % 3 = 0
                           THEN ' free shipping on orders over fifty dollars today'
                           ELSE '' END
                   || '#' || CAST(doc_id AS VARCHAR) || '#' AS s
            FROM documents WHERE doc_id < 400
        ), p AS (
            SELECT doc_id, unnest(generate_series(1, length(s))) AS pos, s FROM d
        ), sa AS (
            SELECT doc_id, pos, s,
                   dense_rank() OVER (ORDER BY substr(s, CAST(pos AS INT))) AS rnk
            FROM p
        )
"""

# jaccard_cjk: naive all-pairs over the same character 6-grams.
ORACLE_SQL["jaccard_cjk"] = """
        WITH d AS (
            SELECT doc_id,
                   list_aggregate(list_transform(range(1, 41),
                       i -> substr('日月火水木金土山川田',
                                   CAST((doc_id // 10 * 31 + i * 17) % 97 % 10 AS INT) + 1, 1)),
                       'string_agg', '')
                   || repeat(substr('日月火水木金土山川田',
                                    CAST(doc_id % 10 AS INT) + 1, 1),
                             CAST(doc_id % 4 AS INT)) AS text
            FROM documents WHERE doc_id < 100
        ), sh AS (
            SELECT DISTINCT doc_id, substr(text, CAST(u.i AS INT), 6) AS sh
            FROM d, unnest(range(1, length(text) - 4)) AS u(i)
            WHERE length(text) >= 6
        ), sizes AS (
            SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        ), shared AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(count(*) AS BIGINT) AS shared
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(shared * 1.0 / (sa.n + sb.n - shared), 6) AS jaccard
        FROM shared
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE round(shared * 1.0 / (sa.n + sb.n - shared), 6) >= 0.5
"""

# script_mix: per-range counts via the length-delta form (RE2), dominant
# via the same struct-greatest argmax.
ORACLE_SQL["script_mix"] = """
        WITH s AS (
            SELECT doc_id,
                   substr(text, 1, 120) ||
                   CASE
                     WHEN doc_id % 4 = 1 THEN repeat(' привет мир', CAST(doc_id % 40 AS INT) + 1)
                     WHEN doc_id % 4 = 2 THEN repeat(' 你好世界', CAST(doc_id % 20 AS INT) + 1)
                     WHEN doc_id % 4 = 3 THEN repeat(' γειά σου', CAST(doc_id % 7 AS INT) + 1)
                     WHEN doc_id % 8 = 0 THEN repeat(' مرحبا', CAST(doc_id % 9 AS INT) + 1)
                     ELSE '' END AS text
            FROM documents
        ), c AS (
            SELECT doc_id,
                   CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT) AS latin,
                   CAST(length(text) - length(regexp_replace(text, '[Ѐ-ӿ]', '', 'g')) AS BIGINT) AS cyrillic,
                   CAST(length(text) - length(regexp_replace(text, '[Ͱ-Ͽ]', '', 'g')) AS BIGINT) AS greek,
                   CAST(length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g')) AS BIGINT) AS han,
                   CAST(length(text) - length(regexp_replace(text, '[؀-ۿ]', '', 'g')) AS BIGINT) AS arabic
            FROM s
        )
        , d AS (
            SELECT *, list_reduce(
                       [{'c': latin, 's': 'latin'},
                        {'c': cyrillic, 's': 'cyrillic'},
                        {'c': greek, 's': 'greek'},
                        {'c': han, 's': 'han'},
                        {'c': arabic, 's': 'arabic'}],
                       (a, b) -> CASE WHEN b.c > a.c OR (b.c = a.c AND b.s > a.s)
                                      THEN b ELSE a END) AS dom
            FROM c
        )
        SELECT doc_id, latin, cyrillic, greek, han, arabic,
               CASE WHEN dom.c > 0 THEN dom.s ELSE 'none' END AS dominant
        FROM d
"""

# nb_classifier: full re-derivation — class-conditional counts, pruned
# vocab, the floor(1000*ln(...)) quantized weights, OOV/prior constants,
# and every doc's score must all match bit-for-bit.
ORACLE_SQL["nb_classifier"] = r"""
        WITH d AS (SELECT doc_id, substr(text, 1, 300) AS text FROM documents),
        tk AS (SELECT doc_id, doc_id % 7 = 0 AS y,
                   list_filter(string_split_regex(trim(text), '\s+'),
                               w -> w <> '') AS t
               FROM d),
        words AS (SELECT u.w AS w, y FROM tk, unnest(t) AS u(w)),
        cnt_all AS (
            SELECT w,
                   CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS cpos,
                   CAST(SUM(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS cneg
            FROM words GROUP BY 1
        ),
        scal AS (SELECT COALESCE(SUM(cpos), 0) AS npos,
                        COALESCE(SUM(cneg), 0) AS nneg FROM cnt_all),
        dcnt AS (SELECT greatest(SUM(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END), 1) AS dpos,
                        greatest(SUM(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 1 END), 1) AS dneg
                 FROM d),
        model AS (SELECT * FROM cnt_all WHERE cpos + cneg >= 2),
        vv AS (SELECT COUNT(*) AS v FROM model),
        consts AS (
            SELECT CAST(npos + v AS DOUBLE) AS dp,
                   CAST(nneg + v AS DOUBLE) AS dn,
                   CAST(floor(ln(1.0 / CAST(npos + v AS DOUBLE)) * 1000) AS BIGINT)
                 - CAST(floor(ln(1.0 / CAST(nneg + v AS DOUBLE)) * 1000) AS BIGINT)
                       AS oov,
                   CAST(floor(ln(CAST(dpos AS DOUBLE) / CAST(dneg AS DOUBLE)) * 1000)
                        AS BIGINT) AS prior
            FROM scal, vv, dcnt
        ),
        mw AS (
            SELECT w,
                   CAST(floor(ln(CAST(cpos + 1 AS DOUBLE) / dp) * 1000) AS BIGINT)
                 - CAST(floor(ln(CAST(cneg + 1 AS DOUBLE) / dn) * 1000) AS BIGINT)
                       AS delta
            FROM model, consts
        ),
        probe AS (SELECT doc_id, u.w AS w FROM tk, unnest(t) AS u(w)),
        terms AS (
            SELECT p.doc_id, COALESCE(m.delta, c.oov) AS term
            FROM probe p LEFT JOIN mw m ON p.w = m.w CROSS JOIN consts c
        ),
        agg AS (SELECT doc_id, COUNT(*) AS n_tokens, SUM(term) AS s
                FROM terms GROUP BY 1)
        SELECT d.doc_id,
               CAST(COALESCE(a.n_tokens, 0) AS INT) AS n_tokens,
               CAST(COALESCE(a.s, 0) + c.prior AS BIGINT) AS nb_milli,
               (COALESCE(a.s, 0) + c.prior) > 0 AS label
        FROM d LEFT JOIN agg a ON d.doc_id = a.doc_id CROSS JOIN consts c
"""

# url_templates / param_mining: the oracle reconstructs the same trap
# frontier closed-form and replays the regex template passes / the
# query-string explode with DuckDB's independent regex engine.
_TRAP_URLS_SQL = """
        WITH u AS (
            SELECT 'https://h' || CAST(doc_id % 5 AS VARCHAR) || '.example'
                || CASE WHEN doc_id % 4 = 0 THEN
                        '/cal/' || CAST(doc_id % 30 + 2000 AS VARCHAR)
                        || '/' || CAST(doc_id % 12 AS VARCHAR)
                        || '/' || CAST(doc_id AS VARCHAR)
                   WHEN doc_id % 4 = 1 THEN
                        '/p/' || lpad(lower(to_hex(doc_id)), 8, '0')
                   WHEN doc_id % 4 = 2 THEN
                        '/tag/' || CAST(doc_id % 7 AS VARCHAR)
                   ELSE '/about' END
                || '?sess=' || md5(CAST(doc_id AS VARCHAR))
                || '&page=' || CAST(doc_id % 10 AS VARCHAR) AS url
            FROM documents
        )
"""

ORACLE_SQL["url_templates"] = (
    _TRAP_URLS_SQL
    + """
        , parts AS (
            SELECT lower(regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)) AS host,
                   regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path
            FROM u
        )
        SELECT host,
               regexp_replace(regexp_replace(path, '[0-9a-f]{8,}', '{h}', 'g'),
                              '[0-9]+', '{d}', 'g') AS template,
               CAST(count(*) AS BIGINT) AS n_urls,
               CAST(count(DISTINCT path) AS BIGINT) AS n_paths
        FROM parts GROUP BY 1, 2
"""
)

ORACLE_SQL["param_mining"] = (
    _TRAP_URLS_SQL
    + """
        , kv AS (
            SELECT lower(regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)) AS host,
                   unnest(string_split(
                       regexp_extract(url, '\\?([^#]*)', 1), '&')) AS kvp
            FROM u
        ), vals AS (
            SELECT host, split_part(kvp, '=', 1) AS param,
                   CASE WHEN instr(kvp, '=') > 0
                        THEN substr(kvp, instr(kvp, '=') + 1)
                        ELSE '' END AS v
            FROM kv WHERE kvp <> ''
        )
        SELECT host, param,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT v) AS BIGINT) AS n_values,
               CAST(floor(1000.0 * count(DISTINCT v) / count(*)) AS BIGINT)
                   AS ratio_milli
        FROM vals GROUP BY 1, 2
"""
)

# containment: naive all-pairs over the unioned (base + excerpt) corpus;
# the Spark side's probe-prefix filtering must lose nothing.
ORACLE_SQL["containment"] = """
        WITH alldocs AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 100000 AS doc_id, substr(text, 20, 160) AS text
            FROM documents WHERE doc_id % 13 = 2
        ), toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS t FROM alldocs
        ), sh0 AS (
            SELECT doc_id, list_aggregate(t[i:i+2], 'string_agg', ' ') AS sh
            FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
        ), sh AS (
            SELECT DISTINCT doc_id, sh FROM sh0 WHERE sh IS NOT NULL
        ), sizes AS (
            SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        ), shared AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(count(*) AS BIGINT) AS shared
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(shared * 1.0 / sa.n, 6) AS containment
        FROM shared
        JOIN sizes sa ON sa.doc_id = doc_a
        WHERE round(shared * 1.0 / sa.n, 6) >= 0.7
"""

ORACLE_SQL["suffix_rank"] = (
    _SA_ORACLE_BASE
    + """
        SELECT doc_id, CAST(pos AS BIGINT) AS pos, CAST(rnk AS BIGINT) AS rnk
        FROM sa
"""
)

ORACLE_SQL["sa_dups"] = (
    _SA_ORACLE_BASE
    + """
        , pr AS (
            SELECT a.doc_id AS doc_a, CAST(a.pos AS BIGINT) AS pos_a,
                   b.doc_id AS doc_b, CAST(b.pos AS BIGINT) AS pos_b,
                   substr(a.s, CAST(a.pos AS INT), 25) AS gram,
                   substr(b.s, CAST(b.pos AS INT), 25) AS gram_b
            FROM sa a JOIN sa b ON b.rnk = a.rnk + 1
        )
        SELECT doc_a, pos_a, doc_b, pos_b, gram,
               doc_a <> doc_b AS cross_doc
        FROM pr
        WHERE length(gram) = 25 AND gram = gram_b
"""
)

# annotate_meta: render-geometry replay (pixel_ocr.render_text_image:
# 5x7 glyphs, pitch 6, letter gap 1, line gap 3, margin 2; width =
# (maxlen*6 + 3) * scale, height = 31 * scale; 3 lines x 4 words -> 12
# boxes, inter-word gaps 7*scale >= the 5*scale split threshold)
ORACLE_SQL["annotate_meta"] = f"""
        WITH img AS (
            SELECT doc_id,
                   'https://' || {_HOST_SQL.format(k='doc_id')}
                       || '.example/p/' || CAST(doc_id AS VARCHAR) AS url,
                   list_filter(string_split(text, ' '), x -> x <> '') AS ws,
                   CAST(CASE WHEN (doc_id // 20) % 4 = 1 THEN 2
                        ELSE 2 + doc_id % 2 END AS BIGINT) AS s
            FROM documents WHERE doc_id % 20 = 8
        ), lens AS (
            SELECT url, s,
                   list_max(list_transform(range(0, 3), k ->
                       CAST(list_sum(list_transform(range(0, 4), j ->
                           length(ws[CAST((4 * k + j) % len(ws) AS INT) + 1])
                       )) + 3 AS BIGINT))) AS maxlen
            FROM img
        )
        SELECT url, CAST(12 AS INT) AS n_boxes,
               CAST((maxlen * 6 + 3) * s AS INT) AS width,
               CAST(31 * s AS INT) AS height
        FROM lens
"""

# profile: per-column aggregates re-derived independently
_PROFILE_COL_SQL = """
        SELECT '{c}' AS "column",
               (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_rows,
               CAST((SELECT count(*) FROM documents) - count({c}) AS BIGINT)
                   AS n_nulls,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_str,
               CAST(max({c}) AS VARCHAR) AS max_str
        FROM documents
"""

ORACLE_SQL["profile"] = " UNION ALL ".join(
    _PROFILE_COL_SQL.format(c=c)
    for c in ("doc_id", "text", "lang", "source", "n_chars")
)

# ip_asn: the NAIVE interval join — same rows as the bucketed equi-join
ORACLE_SQL["ip_asn"] = """
        WITH points AS (
            SELECT doc_id, (doc_id * 2654435761) % 4294967296 AS ip
            FROM documents
        ), ranges AS (
            SELECT r * 8388608 AS lo,
                   r * 8388608 + (r * 2654435761) % 8388608 AS hi,
                   CAST(64500 + r % 97 AS INT) AS asn
            FROM (SELECT unnest(range(0, 512)) AS r)
        )
        SELECT p.doc_id, p.ip, r.asn
        FROM points p LEFT JOIN ranges r ON p.ip BETWEEN r.lo AND r.hi
"""

# homograph: skeleton re-derived with DuckDB's ICU nfc_normalize (an
# independent Unicode implementation vs python unicodedata) + the shared
# literal confusable map
from .operators.urls import CONFUSABLES as _CONF

_SKEL_SQL = "lower(nfc_normalize(host))"
for _bad, _good in _CONF:
    _SKEL_SQL = f"replace({_SKEL_SQL}, '{_bad}', '{_good}')"

ORACLE_SQL["homograph"] = f"""
        WITH base AS (
            SELECT doc_id,
                   'host' || CAST(doc_id % 50 AS VARCHAR) || '.example' AS host
            FROM documents
        ), hosts AS (
            SELECT host FROM base
            UNION ALL SELECT replace(host, 'o', 'о') FROM base WHERE doc_id % 4 = 1
            UNION ALL SELECT replace(host, 's', 'ѕ') FROM base WHERE doc_id % 4 = 2
            UNION ALL SELECT replace(host, 'e', 'е') FROM base WHERE doc_id % 4 = 3
            UNION ALL SELECT 'caf' || chr(233) || '-'
                || CAST(doc_id % 50 AS VARCHAR) || '.example'
                FROM documents WHERE doc_id % 10 = 5
            UNION ALL SELECT 'cafe' || chr(769) || '-'
                || CAST(doc_id % 50 AS VARCHAR) || '.example'
                FROM documents WHERE doc_id % 10 = 5
        ), sk AS (
            SELECT DISTINCT host, {_SKEL_SQL} AS skeleton FROM hosts
        )
        SELECT a.host AS host_a, b.host AS host_b, a.skeleton
        FROM sk a JOIN sk b ON a.skeleton = b.skeleton AND a.host < b.host
"""

def _kcore_oracle_sql(k: int = 2, rounds: int = 4) -> str:
    """Replays operators/link_graph.kcore_hosts round by round: restrict
    edges to survivors, recount degrees, peel < k."""
    parts = [
        f"WITH rel AS ({_LINK_EDGE_SQL})",
        "und AS MATERIALIZED (SELECT DISTINCT least(src_host, dst_host) AS a,"
        " greatest(src_host, dst_host) AS b FROM rel"
        " WHERE src_host <> dst_host)",
        "a0 AS MATERIALIZED (SELECT a AS host FROM und"
        " UNION SELECT b AS host FROM und)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT host,"
            " CAST(count(*) AS BIGINT) AS core_degree FROM ("
            f"SELECT e.a AS host FROM und e JOIN a{r-1} x ON x.host = e.a"
            f" JOIN a{r-1} y ON y.host = e.b"
            f" UNION ALL SELECT e.b AS host FROM und e"
            f" JOIN a{r-1} x ON x.host = e.a JOIN a{r-1} y ON y.host = e.b"
            ") GROUP BY 1)"
        )
        parts.append(
            f"a{r} AS MATERIALIZED (SELECT host FROM d{r}"
            f" WHERE core_degree >= {k})"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT host, core_degree FROM d{rounds} WHERE core_degree >= {k}"
    )


ORACLE_SQL["kcore"] = _kcore_oracle_sql()


def _walks_oracle_sql(walk_len: int = 4, walks_per_node: int = 2) -> str:
    """Replays operators/link_graph.random_walks step by step: same
    lexicographic adjacency index, same poly-hash step choice."""
    parts = [
        f"WITH rel AS ({_LINK_EDGE_SQL})",
        "edges AS MATERIALIZED (SELECT DISTINCT src_host, dst_host FROM rel"
        " WHERE src_host <> dst_host)",
        "adj AS MATERIALIZED (SELECT src_host, dst_host, row_number() OVER"
        " (PARTITION BY src_host ORDER BY dst_host) - 1 AS idx FROM edges)",
        "deg AS MATERIALIZED (SELECT src_host, count(*) AS outdeg"
        " FROM edges GROUP BY 1)",
        "nodes AS (SELECT src_host AS host FROM edges"
        " UNION SELECT dst_host FROM edges)",
        "s0 AS (SELECT host, u.w AS walk_no, host AS cur, host AS walk"
        f" FROM nodes, unnest(range(0, {walks_per_node})) AS u(w))",
    ]
    for t in range(1, walk_len):
        parts.append(
            f"s{t} AS MATERIALIZED (SELECT s.host, s.walk_no,"
            " a.dst_host AS cur,"
            " CASE WHEN a.dst_host IS NOT NULL"
            " THEN s.walk || '>' || a.dst_host ELSE s.walk END AS walk"
            f" FROM s{t-1} s"
            " LEFT JOIN deg d ON d.src_host = s.cur"
            " LEFT JOIN adj a ON a.src_host = s.cur AND a.idx ="
            " (list_reduce(list_prepend(CAST(312994679 AS BIGINT),"
            " list_transform(split(s.cur || '#' || s.host || '#'"
            f" || CAST(s.walk_no AS VARCHAR) || '#{t}', ''),"
            " c -> CAST(ascii(c) AS BIGINT))),"
            " (x, y) -> (x * 37 + y) % 1000000007)) % d.outdeg)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT host, CAST(walk_no AS INT) AS walk_no, walk FROM s{walk_len - 1}"
    )


ORACLE_SQL["walks"] = _walks_oracle_sql()

#: word co-occurrence edge set for the textrank oracle (both directions,
#: matching q_textrank's Column program; DuckDB list lambdas are 1-based)
_WORD_EDGE_SQL = """
        SELECT p.a AS src_host, p.b AS dst_host FROM (
            SELECT unnest(list_filter(list_transform(ws, (w, i) ->
                       CASE WHEN i < len(ws)
                            THEN {'a': w, 'b': ws[i + 1]} END),
                   p -> p IS NOT NULL)) AS p
            FROM (SELECT list_filter(string_split_regex(lower(text),
                             '[^a-z]+'), x -> x <> '') AS ws
                  FROM documents WHERE doc_id < 2000)
        ) WHERE p.a <> p.b
"""


def _textrank_oracle_sql(n_iters: int = 4) -> str:
    """The pagerank recurrence replay (same arithmetic as the pagerank
    oracle) over the word co-occurrence graph, undirected via both-ways
    edges."""
    parts = [
        f"WITH dir AS ({_WORD_EDGE_SQL})",
        "rel AS (SELECT src_host, dst_host FROM dir UNION ALL"
        " SELECT dst_host, src_host FROM dir)",
        "edges AS MATERIALIZED (SELECT DISTINCT src_host, dst_host FROM rel"
        " WHERE src_host <> dst_host)",
        "nodes AS MATERIALIZED (SELECT src_host AS host FROM edges"
        " UNION SELECT dst_host FROM edges)",
        "outdeg AS MATERIALIZED (SELECT src_host, count(*) AS outdeg"
        " FROM edges GROUP BY src_host)",
        "r0 AS (SELECT host, CAST(1000000 AS BIGINT) AS pr FROM nodes)",
    ]
    for i in range(1, n_iters + 1):
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT n.host, "
            "CAST(150000 + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS pr "
            "FROM nodes n LEFT JOIN ("
            "SELECT e.dst_host AS host, SUM(r.pr // o.outdeg) AS s "
            "FROM edges e JOIN outdeg o ON e.src_host = o.src_host "
            f"JOIN r{i-1} r ON r.host = e.src_host "
            "GROUP BY e.dst_host) s ON s.host = n.host)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT host AS word, CAST(pr AS BIGINT) AS rank_scaled FROM r{n_iters}"
    )


ORACLE_SQL["textrank"] = _textrank_oracle_sql()

# zorder: every z-value re-derived with list arithmetic (the same
# poly-hash pipeline as the hll oracles for the host bucket)
ORACLE_SQL["zorder"] = """
        WITH d AS (
            SELECT doc_id,
                   'https://host' || CAST(doc_id % 50 AS VARCHAR)
                       || '.example/p/' || CAST(doc_id AS VARCHAR) AS url,
                   'host' || CAST(doc_id % 50 AS VARCHAR) || '.example'
                       AS hoststr,
                   (1700000000 + (doc_id % 365) * 86400) // 86400 % 65536
                       AS yk
            FROM documents
        ), h AS (
            SELECT url, yk,
                   list_reduce(list_prepend(CAST(312994679 AS BIGINT),
                       list_transform(split(hoststr, ''),
                                      c -> CAST(ascii(c) AS BIGINT))),
                       (a, b) -> (a * 37 + b) % 1000000007) % 65536 AS xk
            FROM d
        ), z AS (
            SELECT url, xk, yk,
                   CAST(list_sum(list_transform(range(0, 16), b ->
                       ((xk >> CAST(b AS INT)) & 1)
                           * CAST(power(2, 2 * b) AS BIGINT)
                       + ((yk >> CAST(b AS INT)) & 1)
                           * CAST(power(2, 2 * b + 1) AS BIGINT)))
                       AS BIGINT) AS zval
            FROM h
        )
        SELECT url, CAST(xk AS INT) AS xk, CAST(yk AS INT) AS yk, zval,
               CAST(zval >> 28 AS INT) AS shard
        FROM z
"""

# triangles: exact count via LEXICOGRAPHIC orientation (x<y<z appears as
# edges (x,y),(y,z),(x,z) exactly once) — independent of the Spark side's
# degree orientation
ORACLE_SQL["triangles"] = f"""
        WITH rel AS ({_LINK_EDGE_SQL}),
        und AS (SELECT DISTINCT least(src_host, dst_host) AS a,
                       greatest(src_host, dst_host) AS b
                FROM rel WHERE src_host <> dst_host),
        deg AS (SELECT host, CAST(count(*) AS BIGINT) AS degree FROM (
                    SELECT a AS host FROM und
                    UNION ALL SELECT b AS host FROM und) GROUP BY 1),
        tri AS (SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
                FROM und e1
                JOIN und e2 ON e2.a = e1.b
                JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        per AS (SELECT host, CAST(count(*) AS BIGINT) AS n_triangles FROM (
                    SELECT unnest([v1, v2, v3]) AS host FROM tri) GROUP BY 1)
        SELECT d.host, d.degree,
               COALESCE(p.n_triangles, 0) AS n_triangles,
               CASE WHEN d.degree > 1
                    THEN (1000 * 2 * COALESCE(p.n_triangles, 0))
                         // (d.degree * (d.degree - 1))
                    ELSE 0 END AS clustering_milli
        FROM deg d LEFT JOIN per p ON p.host = d.host
"""

ORACLE_SQL["page_links"] = f"""
        WITH src AS ({_LINK_SRC_SQL}),
        nav AS (
            SELECT url, origin || '/nav/' || CAST(u.j AS VARCHAR) AS dst_url,
                   'Nav ' || CAST(u.j AS VARCHAR) AS anchor,
                   CAST(u.j AS INTEGER) AS pos
            FROM src, unnest(range(0, 4)) AS u(j)
        ),
        rel AS ({_LINK_REL_SQL})
        SELECT url, dst_url, anchor, pos FROM nav
        UNION ALL
        SELECT url, dst_url, anchor, pos FROM rel
"""

ORACLE_SQL["html_tables"] = f"""
        WITH src AS ({_LINK_SRC_SQL}),
        hdr AS (
            SELECT url, 0 AS row_idx, u.c AS col_idx,
                   CASE u.c WHEN 0 THEN 'key' ELSE 'val' END AS cell
            FROM src, unnest(range(0, 2)) AS u(c)
        ),
        data AS (
            SELECT url, CAST(u.r + 1 AS INTEGER) AS row_idx, v.c AS col_idx,
                   CASE v.c WHEN 0 THEN 'row' || CAST(u.r AS VARCHAR)
                            ELSE CAST((doc_id + u.r) % 100 AS VARCHAR)
                   END AS cell
            FROM src, unnest(range(0, 2)) AS u(r), unnest(range(0, 2)) AS v(c)
        )
        SELECT url, CAST(0 AS INTEGER) AS table_idx,
               CAST(row_idx AS INTEGER) AS row_idx,
               CAST(col_idx AS INTEGER) AS col_idx, cell
        FROM (SELECT * FROM hdr UNION ALL SELECT * FROM data)
"""

# css_select: every matched element re-derived from the page-grammar
# residues (sources/pages._html_doc). Content paragraphs are the
# WORDS_PER_PARA=12 chunks of documents.text (capped at PARAS_PER_DOC=4),
# plus the charset-extra paragraph on the cp1252 (%20==2) / utf-16
# (%20==14) flavors; all other selectors hit pure-residue boilerplate.
from .sources.pages import _CP1252_EXTRA as _CPX
from .sources.pages import _UTF16_EXTRA as _U16X

ORACLE_SQL["css_select"] = f"""
        WITH src AS ({{src}}),
        w AS (
            SELECT s.url, s.doc_id,
                   list_filter(string_split_regex(d.text, '\\s+'),
                               x -> x <> '') AS words
            FROM src s JOIN documents d USING (doc_id)
        ),
        paras AS (
            SELECT url, doc_id, words,
                   least(4, CAST((len(words) + 11) // 12 AS INT)) AS npara
            FROM w
        ),
        nav AS (
            SELECT url, CAST(u.j AS INT) AS match_idx, 'a' AS tag,
                   'Nav ' || CAST(u.j AS VARCHAR) AS text
            FROM src, unnest(range(0, 4)) AS u(j)
        ),
        h2 AS (
            SELECT url, 0 AS match_idx, 'h2' AS tag,
                   'Section ' || CAST(doc_id % 7 AS VARCHAR) AS text
            FROM paras WHERE npara >= 2
        ),
        rel AS (
            SELECT url, CAST(u.j AS INT) AS match_idx, 'a' AS tag,
                   'related ' || CAST(u.j AS VARCHAR) AS text
            FROM src, unnest(range(0, doc_id % 3 + 1)) AS u(j)
        ),
        h1 AS (
            SELECT url, 0 AS match_idx, 'h1' AS tag,
                   'Site ' || {{host}} AS text FROM src
            UNION ALL
            SELECT url, 1 AS match_idx, 'h1' AS tag,
                   'Document ' || CAST(doc_id AS VARCHAR) || ' heading' AS text
            FROM src
        ),
        td AS (
            SELECT url, CAST(u.c AS INT) AS match_idx, 'td' AS tag,
                   CASE u.c WHEN 0 THEN 'key' WHEN 1 THEN 'val'
                            WHEN 2 THEN 'row0'
                            WHEN 3 THEN CAST(doc_id % 100 AS VARCHAR)
                            WHEN 4 THEN 'row1'
                            ELSE CAST((doc_id + 1) % 100 AS VARCHAR)
                   END AS text
            FROM src, unnest(range(0, 6)) AS u(c)
        ),
        body_p AS (
            SELECT url, CAST(u.k AS INT) AS match_idx, 'p' AS tag,
                   array_to_string(list_slice(words,
                       CAST(u.k * 12 + 1 AS INT),
                       CAST(least(u.k * 12 + 12, len(words)) AS INT)),
                       ' ') AS text
            FROM paras, unnest(range(0, npara)) AS u(k)
            UNION ALL
            SELECT url, npara AS match_idx, 'p' AS tag,
                   CASE WHEN doc_id % 20 = 2 THEN '{_CPX}'
                        ELSE '{_U16X}' END AS text
            FROM paras WHERE doc_id % 20 IN (2, 14)
        )
        SELECT url, selector, CAST(match_idx AS INTEGER) AS match_idx, tag, text
        FROM (
        SELECT url, 'nav li > a' AS selector, match_idx, tag, text FROM nav
        UNION ALL
        SELECT url, '#content > h2', match_idx, tag, text FROM h2
        UNION ALL
        SELECT url, 'footer p a', match_idx, tag, text FROM rel
        UNION ALL
        SELECT url, 'h1', match_idx, tag, text FROM h1
        UNION ALL
        SELECT url, 'table td', match_idx, tag, text FROM td
        UNION ALL
        SELECT url, 'a[href^="/nav/"]', match_idx, tag, text FROM nav
        UNION ALL
        SELECT url, '#content > p', match_idx, tag, text FROM body_p
        )
""".format(src=_LINK_SRC_SQL, host=_HOST_SQL.format(k="doc_id"))

ORACLE_SQL["anchor_summary"] = f"""
        WITH src AS ({_LINK_SRC_SQL}),
        nav AS (
            SELECT url, origin || '/nav/' || CAST(u.j AS VARCHAR) AS dst_url,
                   'Nav ' || CAST(u.j AS VARCHAR) AS anchor
            FROM src, unnest(range(0, 4)) AS u(j)
        ),
        rel AS ({_LINK_REL_SQL}),
        links AS (
            SELECT url, dst_url, anchor FROM nav
            UNION ALL SELECT url, dst_url, anchor FROM rel
        ),
        per AS (
            SELECT dst_url, trim(anchor) AS anchor,
                   CAST(count(*) AS BIGINT) AS n_refs,
                   CAST(count(DISTINCT regexp_extract(url,
                        '^https?://([^/:]+)', 1)) AS BIGINT) AS n_hosts
            FROM links WHERE trim(anchor) <> ''
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY dst_url ORDER BY n_refs DESC, anchor) AS r
            FROM per
        )
        SELECT dst_url, anchor, n_refs, n_hosts, CAST(r AS INTEGER) AS rk
        FROM ranked WHERE r <= 3
"""

ORACLE_SQL["link_hosts"] = f"""
        WITH rel AS ({_LINK_EDGE_SQL})
        SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n_links
        FROM rel WHERE src_host <> dst_host
        GROUP BY src_host, dst_host
"""

ORACLE_SQL["pagerank"] = _pagerank_oracle_sql()


def _trustrank_oracle_sql(n_iters: int = 5) -> str:
    """Unrolled integral TrustRank recurrence (teleport mass only on the
    seed whitelist), replaying operators/link_graph.trustrank_hosts."""
    seed = (
        "COALESCE(TRY_CAST(regexp_extract(host, 'host(\\d+)\\.example', 1)"
        " AS INT) % 5 = 0, false)"
    )
    parts = [
        f"WITH rel AS ({_LINK_EDGE_SQL})",
        "edges AS (SELECT DISTINCT src_host, dst_host FROM rel"
        " WHERE src_host <> dst_host)",
        "nodes AS (SELECT host, " + seed + " AS is_seed FROM ("
        "SELECT src_host AS host FROM edges"
        " UNION SELECT dst_host FROM edges))",
        "outdeg AS (SELECT src_host, count(*) AS outdeg FROM edges"
        " GROUP BY src_host)",
        "r0 AS (SELECT host, is_seed,"
        " CAST(1000000 * CAST(is_seed AS BIGINT) AS BIGINT) AS tr FROM nodes)",
    ]
    for i in range(1, n_iters + 1):
        parts.append(
            f"r{i} AS (SELECT n.host, n.is_seed, "
            "CAST(150000 * CAST(n.is_seed AS BIGINT)"
            " + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS tr "
            "FROM nodes n LEFT JOIN ("
            "SELECT e.dst_host AS host, SUM(r.tr // o.outdeg) AS s "
            "FROM edges e JOIN outdeg o ON e.src_host = o.src_host "
            f"JOIN r{i-1} r ON r.host = e.src_host "
            "GROUP BY e.dst_host) s ON s.host = n.host)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT host, is_seed, CAST(tr AS BIGINT) AS trust_scaled FROM r{n_iters}"
    )


ORACLE_SQL["trustrank"] = _trustrank_oracle_sql()


def _seed_distance_oracle_sql(max_hops: int = 4) -> str:
    """Unrolled min-plus BFS replay of operators/link_graph.
    seed_distance_hosts over the independently re-derived host edges;
    NULL-aware min-combine per round (sentinel-free CASE so NULL means
    'unreached', exactly as the Spark side's null-skipping least)."""
    seed = (
        "COALESCE(TRY_CAST(regexp_extract(host, 'host(\\d+)\\.example', 1)"
        " AS INT) % 5 = 0, false)"
    )
    parts = [
        f"WITH rel AS ({_LINK_EDGE_SQL})",
        "edges AS (SELECT DISTINCT src_host, dst_host FROM rel"
        " WHERE src_host <> dst_host)",
        "nodes AS (SELECT host, " + seed + " AS is_seed FROM ("
        "SELECT src_host AS host FROM edges"
        " UNION SELECT dst_host FROM edges))",
        "d0 AS (SELECT host, is_seed,"
        " CAST(CASE WHEN is_seed THEN 0 END AS INT) AS dist FROM nodes)",
    ]
    for i in range(1, max_hops + 1):
        parts.append(
            f"d{i} AS (SELECT n.host, n.is_seed, CAST("
            "CASE WHEN p.dist IS NULL THEN r.c"
            " WHEN r.c IS NULL THEN p.dist"
            " ELSE LEAST(p.dist, r.c) END AS INT) AS dist "
            f"FROM nodes n JOIN d{i-1} p ON p.host = n.host "
            "LEFT JOIN (SELECT e.dst_host AS host, MIN(p2.dist + 1) AS c "
            f"FROM edges e JOIN d{i-1} p2 ON p2.host = e.src_host "
            "WHERE p2.dist IS NOT NULL GROUP BY e.dst_host) r"
            " ON r.host = n.host)"
        )
    return ",\n".join(parts) + f"\nSELECT host, is_seed, dist FROM d{max_hops}"


ORACLE_SQL["seed_distance"] = _seed_distance_oracle_sql()


def _lpa_oracle_sql(n_iters: int = 12) -> str:
    """Unrolled synchronous label propagation over the planted-block
    residue graph, replaying operators/link_graph.label_propagation
    (vote counts, max-count then min-label tie-break) round by round."""
    name = "('n' || lpad(CAST({x} AS VARCHAR), 3, '0'))"
    parts = [
        "WITH m AS (SELECT DISTINCT doc_id % 360 AS m FROM documents)",
        "e_raw AS ("
        f"SELECT {name.format(x='m')} AS s, "
        f"{name.format(x='(m - m % 120) + (m % 120 * 7 + 13) % 120')} AS d FROM m "
        f"UNION ALL SELECT {name.format(x='m')}, "
        f"{name.format(x='(m - m % 120) + (m % 120 * 11 + 1) % 120')} FROM m "
        f"UNION ALL SELECT {name.format(x='m')}, "
        f"{name.format(x='(m + 120) % 360')} FROM m WHERE m % 120 = 0)",
        "und AS (SELECT s, d FROM (SELECT s, d FROM e_raw"
        " UNION SELECT d, s FROM e_raw) WHERE s <> d)",
        "nodes AS (SELECT DISTINCT s AS host FROM und)",
        "l0 AS (SELECT host, host AS label FROM nodes)",
    ]
    for i in range(1, n_iters + 1):
        parts.append(
            f"v{i} AS (SELECT u.s AS host, l.label, count(*) AS n "
            f"FROM und u JOIN l{i-1} l ON l.host = u.d GROUP BY 1, 2)"
        )
        parts.append(
            f"l{i} AS (SELECT host, label FROM (SELECT host, label, "
            "row_number() OVER (PARTITION BY host ORDER BY n DESC, label ASC)"
            f" AS rn FROM v{i}) WHERE rn = 1)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT host, label AS community FROM l{n_iters}"
    )


ORACLE_SQL["host_communities"] = _lpa_oracle_sql()

def _kmeans_ctes(k: int, n_iters: int, dim: int, p: str = "") -> list:
    """Unrolled Lloyd replay of operators/similarity.kmeans_train +
    assignment: integer-quantized vectors, first-k seeds,
    (dist, cl)-ordered argmin, floor(sum/count) centroid update with
    empty-cluster carryover. MATERIALIZED CTEs — each round references
    the previous one several times (the HITS-oracle inlining trap).
    ``p`` prefixes every CTE name so the replay can compose with the PQ
    CTEs in one oracle (ann_index_ivf_query). Final CTEs: ``{p}af``
    (vec_id, cl, d) and ``{p}c{n_iters}`` (the trained centroids)."""
    sq = (
        "list_sum(list_transform(range(1, {d} + 1), i ->"
        " ({v}.q[CAST(i AS INT)] - c.cv[CAST(i AS INT)])"
        " * ({v}.q[CAST(i AS INT)] - c.cv[CAST(i AS INT)])))"
    ).format(d=dim, v=f"{p}v")
    parts = [
        f"WITH {p}v AS MATERIALIZED (SELECT vec_id, list_transform(embedding,"
        " x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q"
        " FROM embeddings)",
        f"{p}c0 AS MATERIALIZED (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl,"
        f" q AS cv FROM (SELECT vec_id, q FROM {p}v ORDER BY vec_id LIMIT {k}))",
    ]
    for i in range(1, n_iters + 1):
        parts.append(
            f"{p}d{i} AS MATERIALIZED (SELECT {p}v.vec_id, c.cl, {sq} AS d"
            f" FROM {p}v CROSS JOIN {p}c{i-1} c)"
        )
        parts.append(
            f"{p}a{i} AS MATERIALIZED (SELECT vec_id, cl, d FROM ("
            f"SELECT vec_id, cl, d, row_number() OVER"
            f" (PARTITION BY vec_id ORDER BY d, cl) AS rk FROM {p}d{i}) WHERE rk = 1)"
        )
        parts.append(
            f"{p}n{i} AS MATERIALIZED (SELECT cl, list(val ORDER BY dim) AS cv FROM ("
            f"SELECT a.cl, u.i AS dim,"
            f" CAST(floor(SUM({p}v.q[CAST(u.i AS INT)]) / CAST(COUNT(*) AS DOUBLE))"
            f" AS BIGINT) AS val"
            f" FROM {p}a{i} a JOIN {p}v USING (vec_id),"
            f" unnest(range(1, {dim} + 1)) AS u(i)"
            f" GROUP BY a.cl, u.i) GROUP BY cl)"
        )
        parts.append(
            f"{p}c{i} AS MATERIALIZED (SELECT cl, cv FROM {p}n{i}"
            f" UNION ALL SELECT cl, cv FROM {p}c{i-1}"
            f" WHERE cl NOT IN (SELECT cl FROM {p}n{i}))"
        )
    parts.append(
        f"{p}df AS (SELECT {p}v.vec_id, c.cl, {sq} AS d"
        f" FROM {p}v CROSS JOIN {p}c{n_iters} c)"
    )
    parts.append(
        f"{p}af AS (SELECT vec_id, cl, d FROM ("
        f"SELECT vec_id, cl, d, row_number() OVER"
        f" (PARTITION BY vec_id ORDER BY d, cl) AS rk FROM {p}df) WHERE rk = 1)"
    )
    return parts


def _kmeans_oracle_sql(k: int = 8, n_iters: int = 3, dim: int = 64) -> str:
    parts = _kmeans_ctes(k, n_iters, dim)
    return (
        ",\n".join(parts)
        + "\nSELECT vec_id, CAST(cl AS INT) AS cluster,"
        " CAST(d AS BIGINT) AS dist_q FROM af"
    )


ORACLE_SQL["kmeans"] = _kmeans_oracle_sql()


def _pq_train_ctes(m: int, k: int, n_iters: int, dim: int) -> tuple[list, str, int]:
    """The training + encoding prefix shared by every PQ-backed oracle
    (pq_ann, ann_index_build/query, semdedup_pq): CTEs through ``c{n}``
    (final codebooks) and ``af`` (per-vector per-subspace code). Returns
    (parts, sq_template, d_sub)."""
    d_sub = dim // m
    sq = (
        "list_sum(list_transform(range(1, {d} + 1), i ->"
        " ({a}.sq[CAST(i AS INT)] - c.cv[CAST(i AS INT)])"
        " * ({a}.sq[CAST(i AS INT)] - c.cv[CAST(i AS INT)])))"
    )
    parts = [
        "WITH v AS MATERIALIZED (SELECT vec_id, list_transform(embedding,"
        " x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q"
        " FROM embeddings)",
        f"sv AS MATERIALIZED (SELECT vec_id, u.s,"
        f" list_slice(q, u.s * {d_sub} + 1, u.s * {d_sub} + {d_sub}) AS sq"
        f" FROM v, unnest(range(0, {m})) AS u(s))",
        f"c0 AS MATERIALIZED (SELECT s,"
        f" row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS cl,"
        f" sq AS cv FROM sv WHERE vec_id IN"
        f" (SELECT vec_id FROM v ORDER BY vec_id LIMIT {k}))",
    ]
    for i in range(1, n_iters + 1):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT sv.vec_id, sv.s, c.cl,"
            f" {sq.format(d=d_sub, a='sv')} AS d"
            f" FROM sv JOIN c{i-1} c ON sv.s = c.s)"
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT vec_id, s, cl FROM ("
            f"SELECT vec_id, s, cl, row_number() OVER"
            f" (PARTITION BY vec_id, s ORDER BY d, cl) AS rk FROM d{i})"
            f" WHERE rk = 1)"
        )
        parts.append(
            f"n{i} AS MATERIALIZED (SELECT s, cl, list(val ORDER BY wd) AS cv"
            f" FROM (SELECT a.s, a.cl, u.i AS wd,"
            f" CAST(floor(SUM(sv.sq[CAST(u.i AS INT)])"
            f" / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS val"
            f" FROM a{i} a JOIN sv ON sv.vec_id = a.vec_id AND sv.s = a.s,"
            f" unnest(range(1, {d_sub} + 1)) AS u(i)"
            f" GROUP BY a.s, a.cl, u.i) GROUP BY s, cl)"
        )
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT s, cl, cv FROM n{i}"
            f" UNION ALL SELECT c.s, c.cl, c.cv FROM c{i-1} c"
            f" WHERE NOT EXISTS (SELECT 1 FROM n{i} n"
            f" WHERE n.s = c.s AND n.cl = c.cl))"
        )
    parts.append(
        f"df AS (SELECT sv.vec_id, sv.s, c.cl, {sq.format(d=d_sub, a='sv')} AS d"
        f" FROM sv JOIN c{n_iters} c ON sv.s = c.s)"
    )
    parts.append(
        "af AS MATERIALIZED (SELECT vec_id, s, cl FROM ("
        "SELECT vec_id, s, cl, row_number() OVER"
        " (PARTITION BY vec_id, s ORDER BY d, cl) AS rk FROM df) WHERE rk = 1)"
    )
    return parts, sq, d_sub


def _pq_oracle_sql(
    m: int = 8,
    k: int = 64,
    n_iters: int = 2,
    dim: int = 64,
    topk: int = 5,
    n_q: int = 5,
    rerank: int = 100,
) -> str:
    """Unrolled replay of operators/similarity.pq_topk: per-subspace
    integer Lloyd training (first-k subvector seeds, (d, cl)-argmin,
    floor(sum/count) update with carryover), PQ encoding, per-query ADC
    tables, the (adist, vec_id)-ordered short-list, and the exact-L2
    re-ranked top-k — all in exact BIGINT arithmetic, so the hash must
    match bit-for-bit. MATERIALIZED CTEs for the round-referenced tables
    (the HITS-oracle inlining trap)."""
    parts, sq, d_sub = _pq_train_ctes(m, k, n_iters, dim)
    parts.append(
        f"qv AS (SELECT vec_id AS query_id, s, sq FROM sv WHERE vec_id < {n_q})"
    )
    parts.append(
        f"t AS MATERIALIZED (SELECT qv.query_id, qv.s, c.cl,"
        f" {sq.format(d=d_sub, a='qv')} AS d"
        f" FROM qv JOIN c{n_iters} c ON qv.s = c.s)"
    )
    parts.append(
        "adc AS (SELECT t.query_id, af.vec_id, SUM(t.d) AS adist_q"
        " FROM af JOIN t ON t.s = af.s AND t.cl = af.cl"
        " GROUP BY t.query_id, af.vec_id)"
    )
    parts.append(
        f"sl AS (SELECT query_id, vec_id FROM ("
        f"SELECT query_id, vec_id, row_number() OVER"
        f" (PARTITION BY query_id ORDER BY adist_q, vec_id) AS crk"
        f" FROM adc WHERE vec_id <> query_id) WHERE crk <= {rerank})"
    )
    parts.append(
        f"ex AS (SELECT sl.query_id, sl.vec_id,"
        f" list_sum(list_transform(range(1, {dim} + 1), i ->"
        f" (cv.q[CAST(i AS INT)] - qw.q[CAST(i AS INT)])"
        f" * (cv.q[CAST(i AS INT)] - qw.q[CAST(i AS INT)]))) AS dist_q"
        f" FROM sl JOIN v cv ON cv.vec_id = sl.vec_id"
        f" JOIN v qw ON qw.vec_id = sl.query_id)"
    )
    return (
        ",\n".join(parts)
        + f"\nSELECT CAST(query_id AS BIGINT) AS query_id, vec_id,"
        f" CAST(dist_q AS BIGINT) AS dist_q, CAST(rk AS INT) AS rank FROM ("
        f"SELECT query_id, vec_id, dist_q, row_number() OVER"
        f" (PARTITION BY query_id ORDER BY dist_q, vec_id) AS rk"
        f" FROM ex) WHERE rk <= {topk}"
    )


ORACLE_SQL["pq_ann"] = _pq_oracle_sql()


def _ann_index_build_oracle_sql(
    m: int = 8, k: int = 64, n_iters: int = 2, dim: int = 64
) -> str:
    """The persisted index's stored codes == the integer Lloyd training +
    encoding replay (same CTE prefix as pq_ann's oracle) — pinning the
    artifact a later session reopens."""
    parts, _, _ = _pq_train_ctes(m, k, n_iters, dim)
    return (
        "WITH " + ",\n".join(p[5:] if p.startswith("WITH ") else p for p in parts)
        + "\nSELECT vec_id, CAST(s AS INT) AS s, CAST(cl AS INT) AS code FROM af"
    )


ORACLE_SQL["ann_index_build"] = _ann_index_build_oracle_sql()

# the artifact round-trip must be invisible to the query result: the
# reopened-index query path answers the SAME oracle as the inline pq_ann.
ORACLE_SQL["ann_index_query"] = _pq_oracle_sql()


def _ann_index_ivf_oracle_sql(
    m: int = 8,
    k: int = 64,
    n_iters: int = 2,
    dim: int = 64,
    n_lists: int = 8,
    coarse_iters: int = 2,
    n_probe: int = 3,
    topk: int = 5,
    n_q: int = 5,
    rerank: int = 100,
) -> str:
    """IVFPQ replay: the coarse quantizer's integer Lloyd CTEs (prefixed
    ``g``) compose with the PQ training/encoding CTEs; probes rank
    (dist, cl) per query; the ADC short-list and exact re-rank are the
    pq_ann replay RESTRICTED to each query's probed lists — all BIGINT,
    bit-for-bit."""
    d_sub = dim // m
    parts, sq, _ = _pq_train_ctes(m, k, n_iters, dim)
    gparts = _kmeans_ctes(n_lists, coarse_iters, dim, p="g")
    # strip the duplicate WITH from the second prefix block
    parts += [q[5:] if q.startswith("WITH ") else q for q in gparts]
    parts.append(
        f"qv AS (SELECT vec_id AS query_id, s, sq FROM sv WHERE vec_id < {n_q})"
    )
    # probe selection: n_probe nearest coarse centroids per query, exact
    # int L2 over the FULL query vector, ties -> lowest list id
    parts.append(
        f"qprobe AS MATERIALIZED (SELECT query_id, cl FROM ("
        f"SELECT gv.vec_id AS query_id, c.cl,"
        f" list_sum(list_transform(range(1, {dim} + 1), i ->"
        f" (gv.q[CAST(i AS INT)] - c.cv[CAST(i AS INT)])"
        f" * (gv.q[CAST(i AS INT)] - c.cv[CAST(i AS INT)]))) AS d,"
        f" row_number() OVER (PARTITION BY gv.vec_id"
        f" ORDER BY list_sum(list_transform(range(1, {dim} + 1), i ->"
        f" (gv.q[CAST(i AS INT)] - c.cv[CAST(i AS INT)])"
        f" * (gv.q[CAST(i AS INT)] - c.cv[CAST(i AS INT)]))), c.cl) AS rk"
        f" FROM gv CROSS JOIN gc{coarse_iters} c WHERE gv.vec_id < {n_q})"
        f" WHERE rk <= {n_probe})"
    )
    parts.append(
        f"t AS MATERIALIZED (SELECT qv.query_id, qv.s, c.cl,"
        f" {sq.format(d=d_sub, a='qv')} AS d"
        f" FROM qv JOIN c{n_iters} c ON qv.s = c.s)"
    )
    # ADC over candidates restricted to the query's probed lists (gaf =
    # each vector's coarse list)
    parts.append(
        "adc AS (SELECT t.query_id, af.vec_id, SUM(t.d) AS adist_q"
        " FROM af JOIN gaf ON gaf.vec_id = af.vec_id"
        " JOIN qprobe p ON p.cl = gaf.cl"
        " JOIN t ON t.s = af.s AND t.cl = af.cl AND t.query_id = p.query_id"
        " GROUP BY t.query_id, af.vec_id)"
    )
    parts.append(
        f"sl AS (SELECT query_id, vec_id FROM ("
        f"SELECT query_id, vec_id, row_number() OVER"
        f" (PARTITION BY query_id ORDER BY adist_q, vec_id) AS crk"
        f" FROM adc WHERE vec_id <> query_id) WHERE crk <= {rerank})"
    )
    parts.append(
        f"ex AS (SELECT sl.query_id, sl.vec_id,"
        f" list_sum(list_transform(range(1, {dim} + 1), i ->"
        f" (cv.q[CAST(i AS INT)] - qw.q[CAST(i AS INT)])"
        f" * (cv.q[CAST(i AS INT)] - qw.q[CAST(i AS INT)]))) AS dist_q"
        f" FROM sl JOIN v cv ON cv.vec_id = sl.vec_id"
        f" JOIN v qw ON qw.vec_id = sl.query_id)"
    )
    return (
        ",\n".join(parts)
        + f"\nSELECT CAST(query_id AS BIGINT) AS query_id, vec_id,"
        f" CAST(dist_q AS BIGINT) AS dist_q, CAST(rk AS INT) AS rank FROM ("
        f"SELECT query_id, vec_id, dist_q, row_number() OVER"
        f" (PARTITION BY query_id ORDER BY dist_q, vec_id) AS rk"
        f" FROM ex) WHERE rk <= {topk}"
    )


ORACLE_SQL["ann_index_ivf_query"] = _ann_index_ivf_oracle_sql()
# the batch path is bit-identical to the driver probe path by contract —
# the SAME replay oracle checks it independently
ORACLE_SQL["ann_index_batch_query"] = _ann_index_ivf_oracle_sql()

ORACLE_SQL["video_meta"] = """
    WITH base AS (
        SELECT doc_id AS did,
               CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'webm' END AS container,
               CASE WHEN doc_id % 2 = 0
                    THEN (CASE WHEN doc_id % 5 = 0 THEN 'mp42' ELSE 'isom' END)
                    ELSE 'webm' END AS major_brand,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 600 + 100 * (doc_id % 3)
                         ELSE 1000000 END AS BIGINT) AS timescale,
               CAST(CASE WHEN doc_id % 2 = 0
                    THEN ((600 + 37 * (doc_id % 50)) * 1000)
                         // (600 + 100 * (doc_id % 3))
                    ELSE 1000 + 37 * (doc_id % 50) END AS BIGINT) AS duration_ms
        FROM documents)
    SELECT did AS blob_id, container, major_brand, timescale, duration_ms,
           CAST(1 AS INTEGER) AS track_no, 'video' AS track_type,
           CASE WHEN container = 'mp4'
                THEN (CASE WHEN did % 3 = 0 THEN 'hev1' ELSE 'avc1' END)
                ELSE (CASE WHEN did % 3 = 0 THEN 'V_VP8' ELSE 'V_VP9' END)
           END AS codec,
           CAST(160 * (1 + did % 4) AS INTEGER) AS width,
           CAST(90 * (1 + did % 4) AS INTEGER) AS height
    FROM base
    UNION ALL
    SELECT did, container, major_brand, timescale, duration_ms,
           CAST(2 AS INTEGER), 'audio',
           CASE WHEN container = 'mp4' THEN 'mp4a' ELSE 'A_OPUS' END,
           CAST(0 AS INTEGER), CAST(0 AS INTEGER)
    FROM base WHERE did % 3 = 0
"""


def _semdedup_pq_oracle_sql(
    m: int = 8,
    k: int = 64,
    n_iters: int = 2,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 7,
    num: int = 9,
    den: int = 10,
) -> str:
    """Replay of semdedup over PQ-reconstructed vectors: PQ training +
    encoding (shared CTE prefix), reconstruction as the subspace-ordered
    concat of codebook rows, integer sign-LSH bucketing against the SAME
    floor-quantized hyperplane literals the Spark side uses, and the
    exact squared-cosine test den^2*dot^2 >= num^2*|a|^2*|b|^2 in
    HUGEINT — bit-for-bit, no float anywhere."""
    from .operators.similarity import _int_hyperplanes

    parts, _, d_sub = _pq_train_ctes(m, k, n_iters, dim)
    planes = _int_hyperplanes(dim, n_planes, seed)
    parts.append(
        f"rec AS MATERIALIZED (SELECT af.vec_id,"
        f" flatten(list(c.cv ORDER BY af.s)) AS rec"
        f" FROM af JOIN c{n_iters} c ON c.s = af.s AND c.cl = af.cl"
        f" GROUP BY af.vec_id)"
    )
    bits = " + ".join(
        "(CASE WHEN list_sum(list_transform(range(1, %d + 1), i ->"
        " rec[CAST(i AS INT)] * ([%s])[CAST(i AS INT)])) > 0"
        " THEN %d ELSE 0 END)"
        % (dim, ",".join(str(v) for v in p), 2 ** i)
        for i, p in enumerate(planes)
    )
    parts.append(
        f"bkt AS MATERIALIZED (SELECT vec_id, rec,"
        f" CAST({bits} AS BIGINT) AS bucket,"
        f" list_sum(list_transform(rec, x -> x * x)) AS na FROM rec)"
    )
    parts.append(
        f"pr AS (SELECT hi.vec_id,"
        f" CAST(list_sum(list_transform(range(1, {dim} + 1), i ->"
        f" lo.rec[CAST(i AS INT)] * hi.rec[CAST(i AS INT)])) AS HUGEINT)"
        f" AS dt, CAST(lo.na AS HUGEINT) AS n_a, CAST(hi.na AS HUGEINT) AS n_b"
        f" FROM bkt lo JOIN bkt hi ON lo.bucket = hi.bucket"
        f" AND lo.vec_id < hi.vec_id)"
    )
    parts.append(
        f"removed AS (SELECT DISTINCT vec_id FROM pr"
        f" WHERE dt > 0 AND {den * den} * dt * dt >= {num * num} * n_a * n_b)"
    )
    return (
        "WITH " + ",\n".join(p[5:] if p.startswith("WITH ") else p for p in parts)
        + "\nSELECT b.vec_id, b.bucket, (r.vec_id IS NULL) AS kept"
        + " FROM bkt b LEFT JOIN removed r ON b.vec_id = r.vec_id"
    )


ORACLE_SQL["semdedup_pq"] = _semdedup_pq_oracle_sql()

# mojibake: the expected output is closed-form in the corpus construction —
# marker + corruption rounds are keyed on doc_id residues, the base corpus
# is pure ASCII (corruption-invariant), and repair must invert exactly.
ORACLE_SQL["mojibake"] = """
    SELECT doc_id,
           (doc_id % 3 = 0) AS had_mojibake,
           CAST(CASE WHEN doc_id % 9 = 0 THEN 2
                     WHEN doc_id % 3 = 0 THEN 1
                     ELSE 0 END AS INT) AS rounds,
           CASE WHEN doc_id % 3 = 0
                THEN text || ' déjà vu — café™'
                ELSE text END AS repaired
    FROM documents
"""

ORACLE_SQL["domain_prior"] = r"""
    WITH hosts AS (
        SELECT doc_id, text,
               'site' || CAST(doc_id % 12 AS VARCHAR) ||
               CASE (doc_id % 12) % 3
                   WHEN 0 THEN '.com'
                   WHEN 1 THEN '.co.uk'
                   ELSE '.github.io' END AS domain
        FROM documents
    ),
    q AS (
        SELECT doc_id, domain,
               length(text) AS n_chars,
               length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                   AS n_digits,
               length(text) - length(replace(text, ' ', '')) AS n_spaces,
               len(list_filter(string_split_regex(trim(text), '\s+'),
                               w -> w <> '')) AS n_tokens
        FROM hosts
    ),
    scored AS (
        SELECT doc_id, domain,
               CASE WHEN n_tokens >= 5
                         AND (n_chars - n_spaces) >= 2 * n_tokens
                         AND (n_chars - n_spaces) <= 12 * n_tokens
                         AND n_chars > 0
                    THEN 1000 - CAST(floor((1000 * n_digits)
                                           / CAST(n_chars AS DOUBLE)) AS BIGINT)
                    ELSE 0 END AS q_milli
        FROM q
    ),
    agg AS (
        SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs_domain,
               CAST(floor(SUM(q_milli) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)
                   AS prior_milli
        FROM scored GROUP BY domain
    )
    SELECT s.doc_id, s.domain, CAST(s.q_milli AS BIGINT) AS q_milli,
           a.n_docs_domain, a.prior_milli,
           CAST(s.q_milli - a.prior_milli AS BIGINT) AS delta_milli
    FROM scored s JOIN agg a USING (domain)
"""

# audio fingerprint re-derivation: int16 WAV round trip is exact, so frame
# energies ARE the residue formula; same signed MSB-first packing as dhash
_AFP_SAMPLE_SQL = (
    "abs(((src + 1) * (({i}) * 17 + 31)) % 2001 - 1000"
    " + CASE WHEN pert AND ({i}) < 5 THEN 500 ELSE 0 END)"
)

ORACLE_SQL["audio_dups"] = f"""
    WITH ids AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 5 THEN doc_id - 5 ELSE doc_id END AS src,
               doc_id % 10 = 5 AS pert
        FROM documents WHERE doc_id < 2000
    ),
    en AS (
        SELECT doc_id,
               list_transform(range(0, 65), f ->
                   list_sum(list_transform(range(f * 10, (f + 1) * 10),
                       i -> {_AFP_SAMPLE_SQL.format(i='i')}))) AS e
        FROM ids
    ),
    raw AS (
        SELECT doc_id,
               COALESCE(list_sum(list_transform(range(0, 64),
                   k -> CASE WHEN e[CAST(k AS INT) + 1] > e[CAST(k AS INT) + 2]
                             THEN CAST(1 AS HUGEINT) << CAST(63 - k AS INT)
                             ELSE CAST(0 AS HUGEINT) END)),
                   CAST(0 AS HUGEINT)) AS h
        FROM en
    ),
    hashes AS (
        SELECT doc_id,
               CAST(h - CASE WHEN h >= (CAST(1 AS HUGEINT) << 63)
                             THEN (CAST(1 AS HUGEINT) << 64)
                             ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS afp
        FROM raw
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.afp, b.afp)) AS INT) AS hamming
    FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.afp, b.afp)) <= 3
"""

# spectral fingerprint re-derivation: the WAV round trip is exact int16,
# so the PCM IS the (un-abs'd) residue formula; the fixed-point twiddle
# tables are embedded as SQL literals (the _PHASH_COS shared-table
# pattern — numpy matmul in the kernel, per-bin list_sum here), band
# energies square in HUGEINT, bits pack frame-major MSB-first.
_SFP_SAMPLE_SQL = (
    "(((src + 1) * (({i}) * 17 + 31)) % 2001 - 1000"
    " + CASE WHEN pert AND ({i}) < 5 THEN 500 ELSE 0 END)"
)


def _sfp_oracle_sql() -> str:
    from .kernels.stft import stft_twiddles

    C, S = stft_twiddles()

    def lit(a):
        return (
            "["
            + ",".join(
                "[" + ",".join(str(int(x)) for x in row) + "]" for row in a
            )
            + "]"
        )

    # twiddles and PCM are materialized ONCE (tw cross join / sm list) —
    # inlining the 9x64 literal into the innermost lambda rebuilds it per
    # element evaluation and runs for minutes instead of seconds
    half = (
        "list_sum(list_transform(range(0, 64), n -> "
        "CAST(s[CAST(f AS INT) * 64 + CAST(n AS INT) + 1] AS HUGEINT)"
        " * {tbl}[CAST(j AS INT) + 1][CAST(n AS INT) + 1]))"
    )
    e_fj = "e[CAST(t // 8 AS INT) + 1][CAST(t % 8 AS INT) + {off}]"
    energy = (
        "({p}[1] * {p}[1] + {p}[2] * {p}[2])"
    )
    left = energy.format(p=e_fj.format(off=1))
    right = energy.format(p=e_fj.format(off=2))
    return f"""
    WITH ids AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 5 THEN doc_id - 5 ELSE doc_id END AS src,
               doc_id % 10 = 5 AS pert
        FROM documents WHERE doc_id < 2000
    ),
    tw AS (SELECT {lit(C)} AS tc, {lit(S)} AS ts),
    sm AS (
        SELECT doc_id,
               list_transform(range(0, 512),
                   i -> {_SFP_SAMPLE_SQL.format(i='i')}) AS s
        FROM ids
    ),
    en AS (
        SELECT doc_id,
               list_transform(range(0, 8), f ->
                   list_transform(range(0, 9), j ->
                       [{half.format(tbl='tc')},
                        {half.format(tbl='ts')}])) AS e
        FROM sm, tw
    ),
    raw AS (
        SELECT doc_id,
               COALESCE(list_sum(list_transform(range(0, 64), t ->
                   CASE WHEN {left} > {right}
                        THEN CAST(1 AS HUGEINT) << CAST(63 - t AS INT)
                        ELSE CAST(0 AS HUGEINT) END)),
                   CAST(0 AS HUGEINT)) AS h
        FROM en
    ),
    hashes AS (
        SELECT doc_id,
               CAST(h - CASE WHEN h >= (CAST(1 AS HUGEINT) << 63)
                             THEN (CAST(1 AS HUGEINT) << 64)
                             ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS sfp
        FROM raw
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sfp, b.sfp)) AS INT) AS hamming
    FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sfp, b.sfp)) <= 8
"""


ORACLE_SQL["audio_spectral"] = _sfp_oracle_sql()


def _gate_oracle_sql() -> str:
    """audio_gate replay: the sfp CTE machinery (materialized twiddles +
    PCM) down to [re, im] pairs, then quantized energies (// 2^20 —
    nonnegative, so DuckDB's truncating // equals Python's floor),
    per-band noise stats over frames 0-3, and the sqrt-free threshold
    test for every signal-frame bin."""
    from .kernels.stft import (
        GATE_K_DEN,
        GATE_K_NUM,
        GATE_NOISE_FRAMES,
        GATE_SHIFT,
        stft_twiddles,
    )

    C, S = stft_twiddles()

    def lit(a):
        return (
            "["
            + ",".join(
                "[" + ",".join(str(int(x)) for x in row) + "]" for row in a
            )
            + "]"
        )

    half = (
        "list_sum(list_transform(range(0, 64), n -> "
        "CAST(s[CAST(f AS INT) * 64 + CAST(n AS INT) + 1] AS HUGEINT)"
        " * {tbl}[CAST(j AS INT) + 1][CAST(n AS INT) + 1]))"
    )
    nf = GATE_NOISE_FRAMES
    num2 = GATE_K_NUM * GATE_K_NUM
    den2 = GATE_K_DEN * GATE_K_DEN
    ebin = "(eq[{f}][CAST(j AS INT) + 1])"
    s_sum = " + ".join(ebin.format(f=f + 1) for f in range(nf))
    q_sum = " + ".join(
        f"{ebin.format(f=f + 1)} * {ebin.format(f=f + 1)}" for f in range(nf)
    )
    e_sig = "eq[CAST(f AS INT) + 1][CAST(j AS INT) + 1]"
    return f"""
    WITH ids AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 5 THEN doc_id - 5 ELSE doc_id END AS src,
               doc_id % 10 = 5 AS pert
        FROM documents WHERE doc_id < 2000
    ),
    tw AS (SELECT {lit(C)} AS tc, {lit(S)} AS ts),
    sm AS (
        SELECT doc_id,
               list_transform(range(0, 512),
                   i -> {_SFP_SAMPLE_SQL.format(i='i')}) AS s
        FROM ids
    ),
    eqt AS (
        SELECT doc_id,
               list_transform(range(0, 8), f ->
                   list_transform(range(0, 9), j ->
                       ({half.format(tbl='tc')} * {half.format(tbl='tc')}
                        + {half.format(tbl='ts')} * {half.format(tbl='ts')})
                       // {1 << GATE_SHIFT})) AS eq
        FROM sm, tw
    ),
    gated AS (
        SELECT doc_id,
               CAST(f AS INT) AS frame,
               CAST(j AS INT) AS band,
               CAST({e_sig} AS BIGINT) AS energy_q,
               ({nf} * {e_sig} - ({s_sum})) > 0
               AND {den2} * ({nf} * {e_sig} - ({s_sum}))
                         * ({nf} * {e_sig} - ({s_sum}))
                   > {num2} * ({nf} * ({q_sum}) - ({s_sum}) * ({s_sum}))
               AS kept
        FROM eqt, range({nf}, 8) tf(f), range(0, 9) tj(j)
    )
    SELECT doc_id AS blob_id, frame, band, energy_q, kept FROM gated
"""


ORACLE_SQL["audio_gate"] = _gate_oracle_sql()

def _mel_oracle_sql() -> str:
    """audio_mel replay: 32-bin twiddle tables + the 8x32 mel-weight
    matrix as materialized literals, quantized powers (// 2^20), weighted
    mel sums (// 2^10) — the corpus rate is 8000 Hz throughout, so one
    weight table covers every row."""
    from .kernels.stft import (
        GATE_SHIFT,
        MEL_BANDS,
        MEL_BINS,
        MEL_WEIGHT_SHIFT,
        mel_filterbank,
        stft_twiddles,
    )

    C, S = stft_twiddles(n_bins=MEL_BINS)
    W = mel_filterbank(8000)

    def lit(a):
        return (
            "["
            + ",".join(
                "[" + ",".join(str(int(x)) for x in row) + "]" for row in a
            )
            + "]"
        )

    half = (
        "list_sum(list_transform(range(0, 64), n -> "
        "CAST(s[CAST(f AS INT) * 64 + CAST(n AS INT) + 1] AS HUGEINT)"
        " * {tbl}[CAST(k AS INT) + 1][CAST(n AS INT) + 1]))"
    )
    return f"""
    WITH ids AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 5 THEN doc_id - 5 ELSE doc_id END AS src,
               doc_id % 10 = 5 AS pert
        FROM documents WHERE doc_id < 2000
    ),
    tw AS (SELECT {lit(C)} AS tc, {lit(S)} AS ts, {lit(W)} AS mw),
    sm AS (
        SELECT doc_id,
               list_transform(range(0, 512),
                   i -> {_SFP_SAMPLE_SQL.format(i='i')}) AS s
        FROM ids
    ),
    eqt AS (
        SELECT doc_id, mw,
               list_transform(range(0, 8), f ->
                   list_transform(range(0, {MEL_BINS}), k ->
                       ({half.format(tbl='tc')} * {half.format(tbl='tc')}
                        + {half.format(tbl='ts')} * {half.format(tbl='ts')})
                       // {1 << GATE_SHIFT})) AS eq
        FROM sm, tw
    )
    SELECT doc_id AS blob_id,
           CAST(f AS INT) AS frame,
           CAST(m AS INT) AS mel,
           CAST(list_sum(list_transform(range(0, {MEL_BINS}), k ->
                    mw[CAST(m AS INT) + 1][CAST(k AS INT) + 1]
                    * eq[CAST(f AS INT) + 1][CAST(k AS INT) + 1]))
                // {1 << MEL_WEIGHT_SHIFT} AS BIGINT) AS energy_q
    FROM eqt, range(0, 8) tf(f), range(0, {MEL_BANDS}) tm(m)
"""


ORACLE_SQL["audio_mel"] = _mel_oracle_sql()


ORACLE_SQL["srt_align"] = """
    WITH pairs AS (
        SELECT doc_id AS did, j
        FROM documents, range(0, 3) t(j)
        WHERE j < 1 + doc_id % 3
    )
    SELECT did AS blob_id, CAST(j AS INT) AS seq,
           CAST(1000 + 4000 * j + 7 * (did % 50) - 500 AS BIGINT) AS start_ms,
           CAST(1000 + 4000 * j + 7 * (did % 50) + 2300 AS BIGINT) AS end_ms,
           CAST(2800 AS BIGINT) AS dur_ms,
           'cue ' || CAST(2 * j AS VARCHAR) || ' of doc ' || CAST(did AS VARCHAR)
           || ' cue ' || CAST(2 * j + 1 AS VARCHAR) || ' of doc '
           || CAST(did AS VARCHAR) AS text
    FROM pairs
"""


# dHash re-derivation: the PNG round trip is lossless, so the decoded gray
# grid IS the closed-form residue formula; the hash is the MSB-first packing
# of the 8x8 horizontal comparisons, signed two's complement into BIGINT.
_DHASH_GRAY_SQL = (
    "CAST(((src + 1) * (({r}) * 131 + ({c}) * 31 + 7)) % 256"
    " + CASE WHEN pert AND ({r}) = 0 AND ({c}) = 0"
    "        THEN CASE WHEN ((src + 1) * 7) % 256 + 40 >= 256"
    "             THEN -216 ELSE 40 END"
    "        ELSE 0 END AS BIGINT)"
)

ORACLE_SQL["image_dups"] = f"""
    WITH ids AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 5 THEN doc_id - 5 ELSE doc_id END AS src,
               doc_id % 10 = 5 AS pert
        FROM documents WHERE doc_id < 2000
    ),
    raw AS (
        SELECT doc_id,
               COALESCE(list_sum(list_transform(range(0, 64),
                   k -> CASE WHEN {_DHASH_GRAY_SQL.format(r='k // 8', c='k % 8')}
                                < {_DHASH_GRAY_SQL.format(r='k // 8', c='k % 8 + 1')}
                             THEN CAST(1 AS HUGEINT) << CAST(63 - k AS INT)
                             ELSE CAST(0 AS HUGEINT) END)),
                   CAST(0 AS HUGEINT)) AS h
        FROM ids
    ),
    hashes AS (
        SELECT doc_id,
               CAST(h - CASE WHEN h >= (CAST(1 AS HUGEINT) << 63)
                             THEN (CAST(1 AS HUGEINT) << 64)
                             ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS dhash
        FROM raw
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
    FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
"""

# pHash re-derivation: 16x16 PNGs round-trip exactly, so the gray grid IS
# the residue formula; the integer-quantized DCT basis is embedded as a SQL
# literal (the SAME constant ocr_spark.operators.multimodal._PHASH_COS uses
# — shared table, independent derivation: numpy matmul there, per-
# coefficient list_sum here), coefficients threshold against the lower
# median of the 8x8 low-frequency block, bits pack signed MSB-first
def _phash_cos_sql() -> str:
    from .operators.multimodal import _PHASH_COS

    rows = ",".join("[" + ",".join(str(int(x)) for x in row) + "]" for row in _PHASH_COS)
    return "[" + rows + "]"


ORACLE_SQL["phash_dups"] = f"""
    WITH ids AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 5 THEN doc_id - 5 ELSE doc_id END AS src,
               doc_id % 10 = 5 AS pert
        FROM documents WHERE doc_id < 1200
    ),
    cos_t AS (SELECT {{cos_table}} AS t),
    coefs AS (
        SELECT doc_id,
               list_transform(range(0, 64), k ->
                   list_sum(list_transform(range(0, 256), i ->
                       t[k // 8 + 1][i // 16 + 1] * t[k % 8 + 1][i % 16 + 1] *
                       (((src + 1) * ((i // 16) * 131 + (i % 16) * 37 + 11)
                         + CASE WHEN pert AND i = 0 THEN 24 ELSE 0 END) % 256)
                   ))) AS cl
        FROM ids, cos_t
    ),
    med AS (SELECT doc_id, cl, list_sort(cl)[32] AS m FROM coefs),
    raw AS (
        SELECT doc_id,
               COALESCE(list_sum(list_transform(range(0, 64),
                   k -> CASE WHEN cl[k + 1] > m
                             THEN CAST(1 AS HUGEINT) << CAST(63 - k AS INT)
                             ELSE CAST(0 AS HUGEINT) END)),
                   CAST(0 AS HUGEINT)) AS h
        FROM med
    ),
    hashes AS (
        SELECT doc_id,
               CAST(h - CASE WHEN h >= (CAST(1 AS HUGEINT) << 63)
                             THEN (CAST(1 AS HUGEINT) << 64)
                             ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS phash
        FROM raw
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
    FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.phash, b.phash)) <= 3
""".replace("{cos_table}", _phash_cos_sql())


# video fingerprint re-derivation: raw-DIB AVI frames round-trip exactly, so
# each frame's gray grid IS the residue formula; per-frame dHash bits are
# majority-voted over the 7 frames (> 3 of 7), then packed signed MSB-first
_VFP_GRAY_SQL = (
    "(((src + 1) * (({r}) * 131 + ({c}) * ({c}) * 29 + ({c}) * 31 + 7)"
    " + (f + 1) * (({r}) * 59 + ({c}) * 17 + 11)"
    " + CASE WHEN pert AND ({r}) = 0 AND ({c}) = 0 THEN 40 ELSE 0 END) % 256)"
)

ORACLE_SQL["video_dups"] = f"""
    WITH ids AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 5 THEN doc_id - 5 ELSE doc_id END AS src,
               doc_id % 10 = 5 AS pert
        FROM documents WHERE doc_id < 2000
    ),
    raw AS (
        SELECT doc_id,
               COALESCE(list_sum(list_transform(range(0, 64),
                   k -> CASE WHEN list_sum(list_transform(range(0, 7), f ->
                             CASE WHEN {_VFP_GRAY_SQL.format(r='k // 8', c='k % 8')}
                                      < {_VFP_GRAY_SQL.format(r='k // 8', c='k % 8 + 1')}
                                  THEN 1 ELSE 0 END)) > 3
                             THEN CAST(1 AS HUGEINT) << CAST(63 - k AS INT)
                             ELSE CAST(0 AS HUGEINT) END)),
                   CAST(0 AS HUGEINT)) AS h
        FROM ids
    ),
    hashes AS (
        SELECT doc_id,
               CAST(h - CASE WHEN h >= (CAST(1 AS HUGEINT) << 63)
                             THEN (CAST(1 AS HUGEINT) << 64)
                             ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS vfp
        FROM raw
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.vfp, b.vfp)) AS INT) AS hamming
    FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.vfp, b.vfp)) <= 3
"""

# CDC storage dedup: bytes from the cubic residue formula, trailing-8-byte
# polynomial window hash (coefficients 31^7..31^0, no overflow below 2^63),
# cut where hash % 1e9+7 % 64 == 0, md5 over chr()-built ASCII-range chunks
# (bytes are 1..126 so UTF-8 encoding is the identity), ref counts windowed
# on the chunk hash
ORACLE_SQL["cdc_chunks"] = """
    WITH src AS (
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 5 THEN doc_id - 5 ELSE doc_id END AS s,
               doc_id % 10 = 5 AS pert
        FROM documents WHERE doc_id < 1500
    ), byt AS (
        SELECT doc_id,
               list_concat(
                   CASE WHEN pert THEN list_transform(range(0, 16),
                       i -> (doc_id * 37 + i * 11 + 5) % 126 + 1)
                        ELSE CAST([] AS BIGINT[]) END,
                   list_transform(range(0, 192 + (s % 5) * 48),
                       i -> ((s + 1) * (i * i * i + 5 * i + 11)) % 9973 % 126 + 1)
               ) AS b
        FROM src
    ), cut AS (
        SELECT doc_id, b, len(b) AS L,
               list_filter(range(7, len(b)), i ->
                   list_sum(list_transform(range(0, 8),
                       j -> b[i - 6 + j] * ([27512614111, 887503681, 28629151,
                                             923521, 29791, 961, 31, 1])[j + 1]
                   )) % 1000000007 % 64 = 0) AS hits
        FROM byt
    ), ends AS (
        SELECT doc_id, b,
               CASE WHEN len(hits) = 0 OR hits[-1] != L - 1
                    THEN list_append(hits, L - 1) ELSE hits END AS e
        FROM cut
    ), chunks AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(e) + 1), k -> struct_pack(
                   chunk_idx := k - 1,
                   off := CASE WHEN k = 1 THEN 0 ELSE e[k - 1] + 1 END,
                   endp := e[k]
               ))) AS c,
               b
        FROM ends
    ), flat AS (
        SELECT doc_id AS blob_id,
               CAST(c.chunk_idx AS INT) AS chunk_idx,
               CAST(c.off AS INT) AS "offset",
               CAST(c.endp - c.off + 1 AS INT) AS length,
               md5(list_aggregate(list_transform(range(c.off + 1, c.endp + 2),
                   x -> chr(CAST(b[x] AS INT))), 'string_agg', '')) AS chunk_md5
        FROM chunks
    )
    SELECT blob_id, chunk_idx, "offset", length, chunk_md5,
           CAST(COUNT(*) OVER (PARTITION BY chunk_md5) AS INT) AS ref_count
    FROM flat
"""

# Cavnar-Trenkle language ID: the oracle re-derives planted text, bigram
# lists, per-lang and per-doc rank profiles, out-of-place distances with
# the top_k=20 missing penalty, and the (distance, lang) argmin
_CT_CASE = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN '{v}'" for k, v in _CT_MARKS.items()
) + " END"

ORACLE_SQL["ct_langid"] = f"""
    WITH t AS (
        SELECT doc_id, lang,
               lower(text || ' ' || {_CT_CASE} || ' ' || {_CT_CASE}
                          || ' ' || {_CT_CASE}) AS s
        FROM documents
    ), grams AS (
        SELECT doc_id, lang,
               unnest(list_filter(
                   list_transform(range(1, greatest(2, length(s))),
                       i -> s[CAST(i AS INT) : CAST(i + 1 AS INT)]),
                   g -> regexp_matches(g, '^[a-z]{{2}}$'))) AS g
        FROM t
    ), lang_cnt AS (
        SELECT lang, g, COUNT(*) AS cnt FROM grams GROUP BY lang, g
    ), prof AS (
        SELECT lang AS pred_lang, g, lang_rank FROM (
            SELECT lang, g, ROW_NUMBER() OVER (PARTITION BY lang
                       ORDER BY cnt DESC, g ASC) AS lang_rank
            FROM lang_cnt
        ) WHERE lang_rank <= 20
    ), doc_cnt AS (
        SELECT doc_id, lang AS true_lang, g, COUNT(*) AS cnt
        FROM grams GROUP BY doc_id, lang, g
    ), dg AS (
        SELECT doc_id, true_lang, g, doc_rank FROM (
            SELECT doc_id, true_lang, g, ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY cnt DESC, g ASC) AS doc_rank
            FROM doc_cnt
        ) WHERE doc_rank <= 20
    ), dist AS (
        SELECT dg.doc_id, dg.true_lang, pl.pred_lang,
               SUM(COALESCE(ABS(dg.doc_rank - p.lang_rank), 20)) AS distance
        FROM dg
        CROSS JOIN (SELECT DISTINCT pred_lang FROM prof) pl
        LEFT JOIN prof p ON p.pred_lang = pl.pred_lang AND p.g = dg.g
        GROUP BY dg.doc_id, dg.true_lang, pl.pred_lang
    )
    SELECT doc_id, true_lang, pred_lang, CAST(distance AS BIGINT) AS distance
    FROM dist
    QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY distance ASC, pred_lang ASC) = 1
"""

# shuffle shards: identical integer permutation + window in SQL
ORACLE_SQL["shuffle_shards"] = """
    WITH k AS (
        SELECT doc_id,
               ((doc_id % 2147483648) * 2654435761 + 17) % 4294967296
                   AS shuffle_key
        FROM documents
    )
    SELECT doc_id, shuffle_key,
           CAST(shuffle_key % 8 AS INT) AS shard,
           ROW_NUMBER() OVER (PARTITION BY shuffle_key % 8
                              ORDER BY shuffle_key, doc_id) AS pos_in_shard
    FROM k
"""

# blocklist: the oracle scans EVERY pattern at EVERY position (substring
# equality — counts overlapping matches exactly like the automaton); the
# pattern list renders from corpus_filters.BLOCKLIST_PATTERNS
from .operators.corpus_filters import BLOCKLIST_PATTERNS as _BLK

_BLK_SQL = "[" + ", ".join(f"'{p}'" for p in _BLK) + "]"

ORACLE_SQL["blocklist"] = f"""
    WITH t AS (
        SELECT doc_id,
               lower(text || CASE WHEN doc_id % 7 = 3
                                  THEN ' click here to bet now winner'
                                  WHEN doc_id % 7 = 5
                                  THEN ' xxxx casino lottery'
                                  ELSE '' END) AS t
        FROM documents
    ), hits AS (
        SELECT doc_id, p,
               list_filter(range(1, len(t) - len(p) + 2),
                   i -> t[CAST(i AS INT) : CAST(i + len(p) - 1 AS INT)] = p) AS pos
        FROM t CROSS JOIN (SELECT unnest({_BLK_SQL}) AS p)
    )
    SELECT doc_id,
           CAST(SUM(len(pos)) AS INT) AS n_hits,
           CAST(SUM(CASE WHEN len(pos) > 0 THEN 1 ELSE 0 END) AS INT)
               AS n_patterns_hit,
           CAST(MIN(CASE WHEN len(pos) > 0 THEN list_min(pos) END) AS INT)
               AS first_hit_pos,
           SUM(len(pos)) > 0 AS blocked
    FROM hits
    GROUP BY doc_id
"""

# readability: same tokenizations, same vowel-run syllable heuristic, same
# single-step BIGINT floor divisions (// == Spark's div for the positive
# operands here); list_sum([]) is NULL in DuckDB hence the COALESCE
ORACLE_SQL["readability"] = """
    WITH base AS (
        SELECT doc_id,
               GREATEST(1, len(list_filter(
                   string_split_regex(text, '[.!?]+'),
                   s -> trim(s) != ''))) AS n_sentences,
               list_filter(string_split_regex(
                   regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), ' '),
                   w -> w != '') AS words
        FROM documents
    ), cnt AS (
        SELECT doc_id, CAST(n_sentences AS BIGINT) AS n_sentences,
               CAST(len(words) AS BIGINT) AS n_words,
               CAST(COALESCE(list_sum(list_transform(words, w ->
                   GREATEST(1, len(regexp_extract_all(w, '[aeiouy]+'))
                       - CASE WHEN w LIKE '%e'
                                   AND len(regexp_extract_all(w, '[aeiouy]+')) > 1
                              THEN 1 ELSE 0 END))), 0) AS BIGINT) AS n_syllables
        FROM base
    )
    SELECT doc_id, n_sentences, n_words, n_syllables,
           CASE WHEN n_words > 0 THEN 206835000
                    - (1015000 * n_words) // n_sentences
                    - (84600000 * n_syllables) // n_words
           END AS flesch_micro,
           CASE WHEN n_words > 0 THEN
                    (390000 * n_words) // n_sentences
                    + (11800000 * n_syllables) // n_words - 15590000
           END AS fk_grade_micro
    FROM cnt
"""

# unigram segmentation: the oracle scores EVERY cut mask of every word with
# the same literal vocab (rendered from operators.tokenize.UNIGRAM_VOCAB —
# one source of truth) and picks (max score, min mask); DuckDB 1.0 map
# lookup returns a list, hence the [1] + COALESCE fallback ladder
from .operators.tokenize import UNIGRAM_VOCAB as _UVOCAB
from .operators.tokenize import UNK_MILLI as _UNK

_UVOCAB_SQL = "MAP {" + ", ".join(f"'{k}': {v}" for k, v in _UVOCAB.items()) + "}"

ORACLE_SQL["unigram_segment"] = f"""
    WITH corpus AS (
        SELECT unnest(string_split(
                   regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), ' ')) AS word
        FROM documents WHERE doc_id < 2000
    ), synth AS (
        SELECT list_aggregate(list_transform(range(0, 3 + doc_id % 8),
                   j -> chr(97 + CAST(((doc_id + 1) * (j * j * 7 + j * 3 + 1)
                                       + (doc_id // 26) * (j + 1)) % 26
                                      AS INT))), 'string_agg', '') AS word
        FROM documents WHERE doc_id < 2000
    ), words AS (
        SELECT DISTINCT word FROM (
            SELECT word FROM corpus WHERE length(word) BETWEEN 1 AND 10
            UNION ALL SELECT word FROM synth
        )
    ), masks AS (
        SELECT word,
               unnest(range(0, CAST(1 AS BIGINT) << (length(word) - 1))) AS m
        FROM words
    ), seg AS (
        SELECT word, m,
            list_prepend(CAST(0 AS BIGINT),
                list_filter(range(1, length(word)),
                            i -> (m >> CAST(i - 1 AS INT)) & 1 = 1)) AS starts,
            list_append(
                list_filter(range(1, length(word)),
                            i -> (m >> CAST(i - 1 AS INT)) & 1 = 1),
                CAST(length(word) AS BIGINT)) AS ends
        FROM masks
    ), pieces AS (
        SELECT word, m,
            list_transform(range(1, len(starts) + 1),
                k -> word[CAST(starts[k] + 1 AS INT) : CAST(ends[k] AS INT)]) AS ps
        FROM seg
    ), scored AS (
        SELECT word, m, ps,
            list_sum(list_transform(ps, p ->
                COALESCE(({_UVOCAB_SQL})[p][1],
                         CASE WHEN length(p) = 1 THEN {_UNK}
                              ELSE -100000000 END))) AS score
        FROM pieces
    )
    SELECT word,
           list_aggregate(ps, 'string_agg', ' ') AS segmentation,
           CAST(score AS BIGINT) AS score_milli,
           CAST(len(ps) AS INT) AS n_pieces,
           CAST(m AS BIGINT) AS cut_mask
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY word ORDER BY score DESC, m ASC) = 1
"""

# wordpiece: the oracle replays the greedy longest-match-first scan with a
# recursive CTE — each step takes the LONGEST vocab piece matching at the
# cursor ('##'-prefixed when not word-initial), dies to [UNK] when none
# matches. Vocab rendered from operators.tokenize.WORDPIECE_VOCAB — one
# source of truth. Max word length 10 bounds recursion depth at 10.
from .operators.tokenize import WORDPIECE_VOCAB as _WPVOCAB

_WPVOCAB_SQL = "[" + ", ".join(f"'{p}'" for p in _WPVOCAB) + "]"

ORACLE_SQL["wordpiece"] = f"""
    WITH RECURSIVE corpus AS (
        SELECT unnest(string_split(
                   regexp_replace(lower(text), '[^a-z]+', ' ', 'g'), ' ')) AS word
        FROM documents WHERE doc_id < 2000
    ), synth AS (
        SELECT list_aggregate(list_transform(range(0, 3 + doc_id % 8),
                   j -> chr(97 + CAST(((doc_id + 1) * (j * j * 7 + j * 3 + 1)
                                       + (doc_id // 26) * (j + 1)) % 26
                                      AS INT))), 'string_agg', '') AS word
        FROM documents WHERE doc_id < 2000
    ), words AS (
        SELECT DISTINCT word FROM (
            SELECT word FROM corpus WHERE length(word) BETWEEN 1 AND 10
            UNION ALL SELECT word FROM synth
        )
    ), step AS (
        SELECT word, 0 AS pos, CAST(NULL AS VARCHAR) AS seg,
               0 AS np, FALSE AS dead
        FROM words
        UNION ALL
        SELECT word,
               CASE WHEN best IS NULL THEN length(word)
                    ELSE pos + CAST(best AS INT) END AS pos,
               CASE WHEN best IS NULL THEN seg
                    WHEN pos = 0 THEN word[1 : CAST(best AS INT)]
                    ELSE seg || ' ##' ||
                         word[pos + 1 : pos + CAST(best AS INT)] END AS seg,
               np + 1 AS np,
               best IS NULL AS dead
        FROM (
            SELECT word, pos, seg, np,
                   list_max(list_filter(range(1, length(word) - pos + 1),
                       l -> list_contains({_WPVOCAB_SQL},
                            CASE WHEN pos = 0
                                 THEN word[1 : CAST(l AS INT)]
                                 ELSE '##' ||
                                      word[pos + 1 : pos + CAST(l AS INT)]
                            END))) AS best
            FROM step
            WHERE pos < length(word) AND NOT dead
        )
    )
    SELECT word,
           CASE WHEN dead THEN '[UNK]' ELSE seg END AS segmentation,
           CAST(CASE WHEN dead THEN 1 ELSE np END AS INT) AS n_pieces,
           dead AS is_unk
    FROM step
    WHERE pos >= length(word)
"""

# winnowing: token poly-hash (31-fold mod 1e9+7) -> gram hash (37-fold over
# the k token hashes) -> rightmost window minimum; k = w = 4 throughout
_WINNOW_FP_SQL = r"""
    toks AS (SELECT doc_id,
           list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
           FROM documents),
    th AS (SELECT doc_id,
           list_transform(t, word -> list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(split(word, ''), c -> CAST(ascii(c) AS BIGINT))),
               (a, b) -> (a * 31 + b) % 1000000007)) AS h FROM toks),
    gh AS (SELECT doc_id,
           CASE WHEN len(h) >= 4 THEN
               list_transform(range(0, len(h) - 3), i -> list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_slice(h, CAST(i AS INT) + 1, CAST(i AS INT) + 4)),
                   (a, b) -> (a * 37 + b) % 1000000007))
           ELSE [] END AS g FROM th)
"""

ORACLE_SQL["winnow"] = f"""
    WITH {_WINNOW_FP_SQL},
    wins AS (SELECT doc_id,
           list_transform(range(0, len(g) - 3), i ->
               {{'pos': CAST(list_max(list_filter(range(i, i + 4),
                           j -> g[CAST(j AS INT) + 1] =
                                list_min(list_slice(g, CAST(i AS INT) + 1,
                                                       CAST(i AS INT) + 4)))) AS INT),
                'fp': list_min(list_slice(g, CAST(i AS INT) + 1,
                                             CAST(i AS INT) + 4))}}) AS fps
           FROM gh WHERE len(g) >= 4),
    ex AS (SELECT doc_id, unnest(fps) AS s FROM wins)
    SELECT DISTINCT doc_id, s.pos AS pos, s.fp AS fp FROM ex
"""

ORACLE_SQL["winnow_pairs"] = f"""
    WITH {_WINNOW_FP_SQL},
    wins AS (SELECT doc_id,
           list_transform(range(0, len(g) - 3), i ->
               list_min(list_slice(g, CAST(i AS INT) + 1, CAST(i AS INT) + 4))) AS fps
           FROM gh WHERE len(g) >= 4),
    fp AS (SELECT DISTINCT doc_id AS doc, unnest(fps) AS fp FROM wins),
    good AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) BETWEEN 2 AND 50),
    post AS (SELECT doc, fp.fp FROM fp JOIN good USING (fp))
    SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS shared
    FROM post a JOIN post b ON a.fp = b.fp AND a.doc < b.doc
    GROUP BY 1, 2 HAVING count(*) >= 2
"""


def _hits_oracle_sql(n_iters: int = 4) -> str:
    """Unrolled HITS recurrence (auth/hub half-steps, global-max integral
    normalization), replaying operators/link_graph.hits_hosts exactly.

    Every CTE is MATERIALIZED: DuckDB inlines CTEs by default, and each
    level here references the previous one twice (the max subquery + the
    rescale scan), so inlining re-expands the expensive link-extraction
    SQL ~4^n_iters times — the same exponential-lineage trap the Spark
    side avoids with localCheckpoint."""
    parts = [
        f"WITH rel AS MATERIALIZED ({_LINK_EDGE_SQL})",
        "edges AS MATERIALIZED (SELECT DISTINCT src_host, dst_host FROM rel"
        " WHERE src_host <> dst_host)",
        "nodes AS MATERIALIZED (SELECT src_host AS host FROM edges"
        " UNION SELECT dst_host FROM edges)",
        "h0 AS MATERIALIZED"
        " (SELECT host, CAST(1000000 AS BIGINT) AS hub FROM nodes)",
    ]
    for i in range(1, n_iters + 1):
        parts.append(
            f"a{i}raw AS MATERIALIZED (SELECT n.host,"
            " CAST(COALESCE(s.s, 0) AS BIGINT)"
            " AS raw FROM nodes n LEFT JOIN ("
            "SELECT e.dst_host AS host, SUM(h.hub) AS s "
            f"FROM edges e JOIN h{i - 1} h ON h.host = e.src_host "
            "GROUP BY 1) s ON s.host = n.host)"
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT host,"
            " CAST((CAST(raw AS HUGEINT) * 1000000) // "
            f"greatest((SELECT max(raw) FROM a{i}raw), 1) AS BIGINT)"
            f" AS auth FROM a{i}raw)"
        )
        parts.append(
            f"h{i}raw AS MATERIALIZED (SELECT n.host,"
            " CAST(COALESCE(s.s, 0) AS BIGINT)"
            " AS raw FROM nodes n LEFT JOIN ("
            "SELECT e.src_host AS host, SUM(a.auth) AS s "
            f"FROM edges e JOIN a{i} a ON a.host = e.dst_host "
            "GROUP BY 1) s ON s.host = n.host)"
        )
        parts.append(
            f"h{i} AS MATERIALIZED (SELECT host,"
            " CAST((CAST(raw AS HUGEINT) * 1000000) // "
            f"greatest((SELECT max(raw) FROM h{i}raw), 1) AS BIGINT)"
            f" AS hub FROM h{i}raw)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT h.host, h.hub, a.auth FROM h{n_iters} h"
        + f" JOIN a{n_iters} a USING (host)"
    )


ORACLE_SQL["hits"] = _hits_oracle_sql()

ORACLE_SQL["reciprocity"] = f"""
        WITH rel AS MATERIALIZED ({_LINK_EDGE_SQL}),
        e AS MATERIALIZED (SELECT DISTINCT src_host, dst_host FROM rel
            WHERE src_host <> dst_host),
        recip AS (SELECT e.src_host, count(*) AS n_recip
            FROM e JOIN e r ON r.src_host = e.dst_host
                           AND r.dst_host = e.src_host
            GROUP BY 1),
        outs AS (SELECT src_host, count(*) AS n_out FROM e GROUP BY 1)
        SELECT o.src_host AS host, CAST(o.n_out AS BIGINT) AS n_out,
               CAST(coalesce(r.n_recip, 0) AS BIGINT) AS n_recip,
               CAST((coalesce(r.n_recip, 0) * 1000) // o.n_out AS BIGINT)
                   AS recip_milli
        FROM outs o LEFT JOIN recip r ON r.src_host = o.src_host
"""

ORACLE_SQL["bm25_topk"] = """
        WITH toks AS (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           w -> w <> '') AS ts
             FROM documents),
        stats AS (SELECT count(*) AS n_docs, sum(len(ts)) AS total_dl
                  FROM toks),
        tf AS (SELECT doc_id, len(ts) AS dl, u.term AS term,
                      count(*) AS tf
               FROM toks, unnest(ts) AS u(term)
               WHERE u.term IN ('spark', 'vector', 'merge', 'window')
               GROUP BY doc_id, len(ts), u.term),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        scored AS (SELECT doc_id,
               CAST(floor(
                   (floor(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * 1000)
                       / 1000)
                   * tf * 2.2
                   / (tf + 1.2 * (0.25 + 0.75 * dl
                       / (CAST(total_dl AS DOUBLE) / n_docs)))
                   * 1000000) AS BIGINT) AS s
             FROM tf JOIN dfreq USING (term) CROSS JOIN stats)
        SELECT doc_id, CAST(sum(s) AS BIGINT) AS score_scaled
        FROM scored GROUP BY doc_id
        ORDER BY score_scaled DESC, doc_id ASC
        LIMIT 15
"""


ORACLE_SQL["phrase_topk"] = """
        WITH toks AS (SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           w -> w <> '') AS ts
             FROM documents),
        -- 0-based positions, matching posexplode
        pos AS (SELECT doc_id, u.i AS pos, ts[u.i + 1] AS term
                FROM toks, unnest(range(0, len(ts))) AS u(i)),
        occ AS (SELECT p0.doc_id
                FROM pos p0 JOIN pos p1
                  ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
                WHERE p0.term = 'table' AND p1.term = 'hash')
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
        FROM occ GROUP BY doc_id
        ORDER BY n_occurrences DESC, doc_id ASC
        LIMIT 20
"""


ORACLE_SQL["asof_join"] = """
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), buys AS (
        SELECT user_id, ts, max(value) AS value
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT c.event_id, c.user_id, c.ts,
           b.ts AS last_purchase_ts,
           round(b.value, 6) AS last_purchase_value
    FROM clicks c ASOF LEFT JOIN buys b
      ON c.user_id = b.user_id AND c.ts >= b.ts
"""


def _semdedup_oracle_sql() -> str:
    """Re-derive semdedup in DuckDB: the hyperplane literals are embedded so
    the bucket assignment is computed independently (list_dot_product fold
    == the fixed-order numpy accumulation in _const_dots_udf)."""
    from .operators.similarity import _hyperplanes

    planes = _hyperplanes(64, 8, seed=7)
    bits = " + ".join(
        "(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), ["
        + ",".join(repr(float(v)) for v in p)
        + f"]) > 0 THEN {2 ** i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
    WITH b AS (
        SELECT vec_id, CAST({bits} AS BIGINT) AS bucket,
               CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings
    ), removed AS (
        SELECT DISTINCT hi.vec_id
        FROM b lo JOIN b hi ON lo.bucket = hi.bucket AND lo.vec_id < hi.vec_id
        WHERE round(list_cosine_similarity(lo.e, hi.e), 4) >= 0.9
    )
    SELECT b.vec_id, b.bucket, (r.vec_id IS NULL) AS kept
    FROM b LEFT JOIN removed r ON b.vec_id = r.vec_id
    """


ORACLE_SQL["semdedup"] = _semdedup_oracle_sql()


def _quality_classifier_oracle_sql() -> str:
    """Integer-exact mirror of quality_classifier: same poly hash, same
    seeded micro-unit weights as a SQL literal list, LONG arithmetic only."""
    from .operators.corpus_filters import classifier_weights

    wlist = "[" + ",".join(str(w) for w in classifier_weights(64, 11)) + "]"
    return rf"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(substr(text, 1, 300)), '\s+'),
                           w -> w <> '') AS t
        FROM documents
    ), h AS (
        SELECT doc_id, len(t) AS n_tokens,
               list_transform(t, w -> list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(split(w, ''), c -> CAST(ascii(c) AS BIGINT))),
                   (a, b) -> (a * 31 + b) % 1000000007)) AS hs
        FROM toks
    ), s AS (
        SELECT doc_id, n_tokens,
               25000 + coalesce(list_sum(list_transform(hs,
                   x -> (CASE WHEN x % 128 < 64 THEN 1 ELSE -1 END)
                        * {wlist}[(x % 64) + 1])), 0) AS logit
        FROM h
    )
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
           CAST(logit AS BIGINT) AS logit_micro, (logit > 0) AS label
    FROM s
    """


ORACLE_SQL["quality_classifier"] = _quality_classifier_oracle_sql()


def _lr_trained_oracle_sql() -> str:
    """Mirror of lr_trained: same tokens + poly hash + sign trick, the
    teacher weights as a SQL literal; zero-error training guarantees
    y_pred == y_true, so both columns re-derive as the teacher sign."""
    from .operators.lr_train import DIM, teacher_weights

    wlist = "[" + ",".join(str(w) for w in teacher_weights(DIM, 7)) + "]"
    return rf"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(substr(text, 1, 300)), '\s+'),
                           w -> w <> '') AS t
        FROM documents
    ), h AS (
        SELECT doc_id, len(t) AS n_tokens,
               list_transform(t, w -> list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(split(w, ''), c -> CAST(ascii(c) AS BIGINT))),
                   (a, b) -> (a * 31 + b) % 1000000007)) AS hs
        FROM toks
    ), s AS (
        SELECT doc_id, n_tokens,
               coalesce(list_sum(list_transform(hs,
                   x -> (CASE WHEN x % {2 * DIM} < {DIM} THEN 1 ELSE -1 END)
                        * {wlist}[(x % {DIM}) + 1])), 0) AS dot
        FROM h
    )
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
           (dot > 0) AS y_true, (dot > 0) AS y_pred
    FROM s
    """


ORACLE_SQL["lr_trained"] = _lr_trained_oracle_sql()

# TextTiling re-derivation: same lowercased whitespace tokens, block slices
# via list_slice, dot products as equal-pair counts, integer // quotient,
# +-2 window depth via lag/lead with missing neighbors defaulting to v
ORACLE_SQL["text_tiles"] = r"""
    WITH toks AS (
        SELECT doc_id,
               list_transform(
                   list_filter(string_split_regex(trim(text), '\s+'), w -> w <> ''),
                   w -> lower(w)) AS t
        FROM documents
    ), blocks AS (
        SELECT doc_id, t, CAST(ceil(len(t) / 10.0) AS INT) AS nb FROM toks
    ), bounds AS (
        SELECT doc_id, nb, CAST(u.b AS INT) AS b,
               list_slice(t, u.b * 10 + 1, u.b * 10 + 10) AS ta,
               list_slice(t, (u.b + 1) * 10 + 1, (u.b + 1) * 10 + 10) AS tb
        FROM blocks, LATERAL UNNEST(range(0, nb - 1)) AS u(b)
        WHERE nb >= 2
    ), sims AS (
        SELECT doc_id, b,
               coalesce(list_sum(list_transform(ta,
                   x -> len(list_filter(tb, y -> y = x)))), 0) AS dot,
               coalesce(list_sum(list_transform(ta,
                   x -> len(list_filter(ta, y -> y = x)))), 0) AS n2a,
               coalesce(list_sum(list_transform(tb,
                   x -> len(list_filter(tb, y -> y = x)))), 0) AS n2b
        FROM bounds
    ), vals AS (
        SELECT doc_id, b,
               CASE WHEN n2a > 0 AND n2b > 0
                    THEN (1000000 * dot * dot) // (n2a * n2b)
                    ELSE 0 END AS v
        FROM sims
    ), win AS (
        SELECT doc_id, b, v,
               lag(v, 1) OVER w AS vm1, lag(v, 2) OVER w AS vm2,
               lead(v, 1) OVER w AS vp1, lead(v, 2) OVER w AS vp2
        FROM vals WINDOW w AS (PARTITION BY doc_id ORDER BY b)
    )
    SELECT doc_id, CAST(b AS INT) AS boundary_block,
           CAST((b + 1) * 10 AS INT) AS token_offset,
           CAST(v AS BIGINT) AS sim_milli,
           CAST(greatest(coalesce(vm1, v), coalesce(vm2, v)) - v
                + greatest(coalesce(vp1, v), coalesce(vp2, v)) - v
                AS BIGINT) AS depth_milli
    FROM win
    WHERE v <= coalesce(vm1, v) AND v <= coalesce(vp1, v)
      AND greatest(coalesce(vm1, v), coalesce(vm2, v)) - v
          + greatest(coalesce(vp1, v), coalesce(vp2, v)) - v >= 150
"""



ORACLE_SQL["robots_filter"] = """
    SELECT doc_id,
           'host' || CAST(doc_id % 10 AS VARCHAR) || '.example.com' AS host,
           CASE doc_id % 5
               WHEN 0 THEN '/exactly/page' || CAST(doc_id AS VARCHAR)
               WHEN 1 THEN '/private/x' || CAST(doc_id AS VARCHAR)
               WHEN 2 THEN '/private/ok/y' || CAST(doc_id AS VARCHAR)
               WHEN 3 THEN '/tmp' || CAST(doc_id % 10 AS VARCHAR) || '/z'
               ELSE '/exact' END AS path,
           CASE WHEN (doc_id % 10) % 3 = 0 THEN FALSE   -- ocrbot group: all off
                WHEN doc_id % 5 = 1 THEN FALSE          -- /private disallow
                WHEN doc_id % 5 = 4 THEN FALSE          -- /exact$ anchor
                WHEN doc_id % 5 = 3 AND (doc_id % 10) % 2 = 0
                     THEN FALSE                         -- even-host /tmpN
                ELSE TRUE END AS allowed
    FROM documents
"""

ORACLE_SQL["sitemap_urls"] = """
    WITH h AS (SELECT DISTINCT doc_id % 10 AS hnum FROM documents),
    base AS (SELECT hnum,
            'host' || CAST(hnum AS VARCHAR) || '.example.com' AS host,
            'https://host' || CAST(hnum AS VARCHAR) || '.example.com' AS b
        FROM h)
    SELECT host, 'sitemap' AS kind, b || '/sitemap_1.xml.gz' AS loc,
           '2026-07-15' AS lastmod, CAST(NULL AS VARCHAR) AS changefreq,
           CAST(NULL AS INT) AS priority_milli
    FROM base WHERE hnum % 3 = 0
    UNION ALL
    SELECT host, 'sitemap', b || '/sitemap_2.xml.gz', NULL, NULL, NULL
    FROM base WHERE hnum % 3 = 0
    UNION ALL
    SELECT host, 'url', b || '/page0&ref=' || CAST(hnum AS VARCHAR),
           '2026-0' || CAST(hnum % 9 + 1 AS VARCHAR) || '-01',
           NULL, CAST(hnum * 100 AS INT)
    FROM base WHERE hnum % 3 <> 0
    UNION ALL
    SELECT host, 'url', b || '/page1', NULL,
           CASE WHEN hnum % 2 = 0 THEN 'daily' ELSE 'weekly' END, NULL
    FROM base WHERE hnum % 3 <> 0
    UNION ALL
    SELECT host, 'url', b || '/page2', NULL, NULL, NULL
    FROM base WHERE hnum % 3 <> 0
"""

ORACLE_SQL["feed_entries"] = """
    WITH h AS (SELECT DISTINCT doc_id % 10 AS hnum FROM documents),
    base AS (SELECT hnum,
            'host' || CAST(hnum AS VARCHAR) || '.example.com' AS host,
            'https://host' || CAST(hnum AS VARCHAR) || '.example.com' AS b,
            CAST(hnum AS VARCHAR) AS hs
        FROM h)
    SELECT host, 'rss' AS fmt, 'tag:host' || hs || ':0' AS entry_id,
           b || '/post0?a=1&b=' || hs AS link, 'Post & 0' AS title,
           epoch_ms(make_timestamp(2026, 6, hnum + 1, hnum + 10, 15, 30.0))
               AS published_ms
    FROM base WHERE hnum % 2 = 0
    UNION ALL
    SELECT host, 'rss', b || '/post1', b || '/post1', 'Post 1',
           epoch_ms(make_timestamp(2026, 6, hnum + 1, hnum + 10, 15, 30.0))
               - 7200000
    FROM base WHERE hnum % 2 = 0
    UNION ALL
    SELECT host, 'atom', 'urn:host' || hs || ':0', b || '/e0', 'Entry 0',
           epoch_ms(make_timestamp(2026, 7, hnum + 10, hnum + 10, 15, 30.0))
    FROM base WHERE hnum % 2 = 1
    UNION ALL
    SELECT host, 'atom', 'urn:host' || hs || ':1', b || '/e1', 'Entry 1',
           epoch_ms(make_timestamp(2026, 7, hnum + 10, hnum + 10, 15, 30.0))
               + 250 - 7200000
    FROM base WHERE hnum % 2 = 1
"""

ORACLE_SQL["politeness"] = """
    WITH urls AS (SELECT doc_id,
            'host' || CAST(doc_id % 10 AS VARCHAR) || '.example.com' AS host,
            '/p' || CAST(doc_id AS VARCHAR) AS url,
            CAST(doc_id % 7 AS INT) AS priority
        FROM documents),
    s AS (SELECT *, CAST(row_number() OVER
            (PARTITION BY host ORDER BY priority DESC, url ASC) - 1 AS INT)
            AS slot FROM urls)
    SELECT doc_id, host, url, priority, slot,
           CAST(slot * (CASE WHEN (doc_id % 10) % 4 = 3 THEN 500
                             ELSE ((doc_id % 10) % 4 + 1) * 1000 END)
                AS BIGINT) AS fetch_offset_ms
    FROM s
"""

ORACLE_SQL["frontier_plan"] = """
    WITH d AS (SELECT doc_id AS k FROM documents),
    cand AS (
        SELECT k,
               'host' || CAST(k % 10 AS VARCHAR) || '.example.com' AS host,
               CASE WHEN k % 7 = 0 THEN '/priv' || CAST(k AS VARCHAR)
                    ELSE '/p' || CAST(k AS VARCHAR) END AS path,
               -- resighted urls (k%5=0) keep the fresher second sighting
               -- from the OTHER channel; dedup tie-break never fires
               CASE WHEN k % 5 = 0 THEN
                        CASE WHEN k % 2 = 0 THEN 'feed' ELSE 'sitemap' END
                    WHEN k % 2 = 0 THEN 'sitemap' ELSE 'feed' END AS src,
               CAST(1700000000000 + k * 1000
                    + CASE WHEN k % 5 = 0 THEN 500 ELSE 0 END AS BIGINT)
                   AS recency_ms
        FROM d
        WHERE k % 3 <> 0   -- crawled anti-join
          AND k % 7 <> 0   -- robots Disallow: /priv
    ),
    withurl AS (SELECT *, 'https://' || host || path AS url FROM cand),
    sched AS (SELECT *, row_number() OVER
                  (PARTITION BY host ORDER BY recency_ms DESC, url ASC) - 1
                  AS slot
              FROM withurl)
    SELECT host, path, url, src, recency_ms, CAST(slot AS INT) AS slot,
           CAST(slot * (CASE WHEN (k % 10) % 4 = 3 THEN 500
                             ELSE ((k % 10) % 4 + 1) * 1000 END)
                AS BIGINT) AS fetch_offset_ms
    FROM sched
"""

# sitemap_gap: the oracle re-derives every parsed record and both crawl
# flags purely arithmetically — it never constructs or parses XML, so the
# Spark side's regexp parser is checked against an independent derivation.
ORACLE_SQL["sitemap_gap"] = f"""
    WITH urlset AS (
        SELECT {_FQHOST_SQL.format(k='doc_id')} AS host,
               'url' AS kind,
               (doc_id * 13 + 101 * u.j) % 4096 AS t,
               DATE '2025-12-02'
                   + CAST((doc_id + 17 * u.j) % 60 AS INTEGER) AS lastmod,
               CASE (doc_id + u.j) % 3 WHEN 0 THEN 'daily'
                    WHEN 1 THEN 'weekly' ELSE 'monthly' END AS changefreq,
               CAST(((doc_id + u.j) % 10 + 1) * 100 AS INTEGER) AS priority_milli
        FROM documents, unnest(range(0, doc_id % 4 + 1)) AS u(j)
        WHERE doc_id % 10 = 1
    ),
    url_rows AS (
        SELECT host, kind,
               'https://' || {_HOST_SQL.format(k='t')} || '.example/p/'
                   || CAST(t AS VARCHAR) AS loc,
               t, lastmod, changefreq, priority_milli
        FROM urlset
    ),
    index_rows AS (
        SELECT {_FQHOST_SQL.format(k='doc_id')} AS host,
               'sitemap' AS kind,
               'https://' || {_FQHOST_SQL.format(k='doc_id')} || '/sitemap-'
                   || CAST(u.j AS VARCHAR) || '.xml' AS loc,
               CAST(NULL AS BIGINT) AS t,
               DATE '2026-01-01' + CAST(doc_id % 5 AS INTEGER) AS lastmod,
               CAST(NULL AS VARCHAR) AS changefreq,
               CAST(NULL AS INTEGER) AS priority_milli
        FROM documents, unnest(range(0, 2)) AS u(j)
        WHERE doc_id % 40 = 3
    ),
    recs AS (SELECT * FROM url_rows UNION ALL SELECT * FROM index_rows)
    SELECT r.host, r.kind, r.loc,
           CAST(r.lastmod AS VARCHAR) AS lastmod, r.changefreq, r.priority_milli,
           (c.doc_id IS NOT NULL) AS crawled,
           COALESCE(
               r.lastmod > CAST(TIMESTAMP '2026-01-01'
                                + INTERVAL (c.doc_id) SECOND AS DATE),
               false) AS stale
    FROM recs r LEFT JOIN documents c ON c.doc_id = r.t
"""

ORACLE_SQL["jsonld_entities"] = f"""
    WITH d AS (
        SELECT doc_id AS k,
               'https://' || {_HOST_SQL.format(k='doc_id')} || '.example/p/'
                   || CAST(doc_id AS VARCHAR) AS url
        FROM documents
    )
    SELECT url, CAST(b AS INTEGER) AS block_idx, CAST(e AS INTEGER) AS entity_idx,
           jtype, key, value
    FROM (
        SELECT url, 0 AS b, 0 AS e, 'Product' AS jtype, 'name' AS key,
               'Product ' || CAST(k AS VARCHAR) AS value FROM d WHERE k % 4 = 0
        UNION ALL
        SELECT url, 0, 0, 'Product', 'sku', 'SKU-' || CAST(k AS VARCHAR)
        FROM d WHERE k % 4 = 0
        UNION ALL
        SELECT url, 0, 0, 'Product', 'price', CAST(k % 997 AS VARCHAR)
        FROM d WHERE k % 4 = 0
        UNION ALL
        SELECT url, 0, 0, 'Product', 'inStock',
               CASE WHEN k % 2 = 0 THEN 'true' ELSE 'false' END
        FROM d WHERE k % 4 = 0
        UNION ALL
        SELECT url, 0, 0, 'Article', 'headline', 'Title ' || CAST(k AS VARCHAR)
        FROM d WHERE k % 4 = 1
        UNION ALL
        SELECT url, 0, 0, 'Article', 'wordCount', CAST(k % 500 AS VARCHAR)
        FROM d WHERE k % 4 = 1
        UNION ALL
        SELECT url, 0, 1, 'Person', 'name', 'Author ' || CAST(k % 50 AS VARCHAR)
        FROM d WHERE k % 4 = 1
        UNION ALL
        SELECT url, 1, 0, 'Event', 'name', 'Event ' || CAST(k AS VARCHAR)
        FROM d WHERE k % 4 = 2
    )
"""

ORACLE_SQL["microdata"] = f"""
    WITH d AS (
        SELECT doc_id AS k,
               'https://' || {_HOST_SQL.format(k='doc_id')} || '.example/p/'
                   || CAST(doc_id AS VARCHAR) AS url
        FROM documents
    )
    SELECT url, CAST(i AS INTEGER) AS item_idx, item_type, prop, value
    FROM (
        SELECT url, 0 AS i, 'https://schema.org/Product' AS item_type,
               'name' AS prop, 'Widget ' || CAST(k AS VARCHAR) AS value
        FROM d WHERE k % 4 = 0
        UNION ALL
        SELECT url, 0, 'https://schema.org/Product', 'sku',
               'SKU-' || CAST(k % 97 AS VARCHAR) FROM d WHERE k % 4 = 0
        UNION ALL
        SELECT url, 0, 'https://schema.org/Product', 'url',
               '/p/' || CAST(k AS VARCHAR) FROM d WHERE k % 4 = 0
        UNION ALL
        SELECT url, 0, 'https://schema.org/Person', 'name',
               'P ' || CAST(k % 50 AS VARCHAR) FROM d WHERE k % 4 = 1
        UNION ALL
        SELECT url, 0, 'https://schema.org/Person', 'address', 'item:1'
        FROM d WHERE k % 4 = 1
        UNION ALL
        SELECT url, 1, 'https://schema.org/PostalAddress', 'postalCode',
               CAST(10000 + k % 900 AS VARCHAR) FROM d WHERE k % 4 = 1
        UNION ALL
        SELECT url, 0, 'https://schema.org/Article', 'datePublished',
               '2024-01-' || CAST(1 + k % 28 AS VARCHAR) FROM d WHERE k % 4 = 2
        UNION ALL
        SELECT url, 0, 'https://schema.org/Article', 'image',
               '/img/' || CAST(k AS VARCHAR) || '.png' FROM d WHERE k % 4 = 2
    )
"""

ORACLE_SQL["dsir"] = r"""
    WITH toks AS (SELECT doc_id, lang,
           list_filter(string_split_regex(trim(substr(text, 1, 300)), '\s+'),
                       w -> w <> '') AS t FROM documents),
    b AS (SELECT doc_id, lang, len(t) AS n,
           list_transform(t, w -> list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(split(w, ''), c -> CAST(ascii(c) AS BIGINT))),
               (a, x) -> (a * 31 + x) % 1000000007) % 64) AS bs
         FROM toks),
    cnt AS (SELECT u.x AS bucket, count(*) AS raw_n,
            sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS target_n
        FROM b, unnest(bs) AS u(x) GROUP BY 1),
    tot AS (SELECT sum(raw_n) AS R, sum(target_n) AS T FROM cnt),
    lam AS (SELECT r.i AS bucket,
            CAST(floor(1000 * ln(
                ((coalesce(c.target_n, 0) + 1) * (t.R + 64)) * 1.0 /
                ((coalesce(c.raw_n, 0) + 1) * (t.T + 64)))) AS BIGINT) AS lam
        FROM range(0, 64) AS r(i)
        LEFT JOIN cnt c ON c.bucket = r.i CROSS JOIN tot t),
    per AS (SELECT doc_id, u.x AS bucket FROM b, unnest(bs) AS u(x)),
    sc AS (SELECT per.doc_id, sum(l.lam) AS s FROM per
           JOIN lam l ON l.bucket = per.bucket GROUP BY 1)
    SELECT b.doc_id, CAST(b.n AS INT) AS n_tokens,
           CAST(coalesce(sc.s, 0) AS BIGINT) AS dsir_milli
    FROM b LEFT JOIN sc ON b.doc_id = sc.doc_id
"""

def _dsir_resample_oracle_sql(n_samples: int = 100) -> str:
    """Full re-derivation of q_dsir_resample: the dsir oracle's hash
    models and milli-log scores as CTEs, then the shared fixed-point exp
    tables (operators/dsir.exp_tables — shared math constants, the
    BLOCKLIST_PATTERNS pattern), a window cumsum in doc-id order, and the
    systematic PPS selection predicate. Everything after the quantized ln
    is BIGINT, so the hash must match bit-for-bit."""
    from .operators.dsir import EXP_CLAMP_MILLI, exp_tables

    eq, er = exp_tables()
    eq_lit = "[" + ", ".join(str(v) for v in eq) + "]"
    er_lit = "[" + ", ".join(str(v) for v in er) + "]"
    qoff = EXP_CLAMP_MILLI // 1000 + 1
    return rf"""
    WITH toks AS (SELECT doc_id, lang,
           list_filter(string_split_regex(trim(substr(text, 1, 300)), '\s+'),
                       w -> w <> '') AS t FROM documents),
    b AS (SELECT doc_id, lang, len(t) AS n,
           list_transform(t, w -> list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(split(w, ''), c -> CAST(ascii(c) AS BIGINT))),
               (a, x) -> (a * 31 + x) % 1000000007) % 64) AS bs
         FROM toks),
    cnt AS (SELECT u.x AS bucket, count(*) AS raw_n,
            sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS target_n
        FROM b, unnest(bs) AS u(x) GROUP BY 1),
    tot AS (SELECT sum(raw_n) AS R, sum(target_n) AS T FROM cnt),
    lam AS (SELECT r.i AS bucket,
            CAST(floor(1000 * ln(
                ((coalesce(c.target_n, 0) + 1) * (t.R + 64)) * 1.0 /
                ((coalesce(c.raw_n, 0) + 1) * (t.T + 64)))) AS BIGINT) AS lam
        FROM range(0, 64) AS r(i)
        LEFT JOIN cnt c ON c.bucket = r.i CROSS JOIN tot t),
    per AS (SELECT doc_id, u.x AS bucket FROM b, unnest(bs) AS u(x)),
    sc AS (SELECT per.doc_id, sum(l.lam) AS s FROM per
           JOIN lam l ON l.bucket = per.bucket GROUP BY 1),
    m AS (SELECT b.doc_id, CAST(coalesce(sc.s, 0) AS BIGINT) AS milli
          FROM b LEFT JOIN sc ON b.doc_id = sc.doc_id),
    consts AS (SELECT {eq_lit} AS eq, {er_lit} AS er),
    wq AS (SELECT doc_id,
           GREATEST(CAST(-{EXP_CLAMP_MILLI} AS BIGINT),
                    LEAST(CAST({EXP_CLAMP_MILLI} AS BIGINT), milli)) AS mc
           FROM m),
    w AS (SELECT doc_id,
          (consts.eq[CAST(floor(mc / 1000.0) AS BIGINT) + {qoff}]
           * consts.er[mc - 1000 * CAST(floor(mc / 1000.0) AS BIGINT) + 1])
          // {1 << 20} AS weight
          FROM wq CROSS JOIN consts),
    cum AS (SELECT doc_id, weight,
            SUM(weight) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM w),
    tot2 AS (SELECT GREATEST(1, SUM(weight) // {n_samples}) AS step FROM w)
    SELECT doc_id, weight, CAST(cum AS BIGINT) AS cum FROM cum CROSS JOIN tot2
    WHERE ((cum - weight) // step) < (cum // step)
    """


ORACLE_SQL["dsir_resample"] = _dsir_resample_oracle_sql()

ORACLE_SQL["registrable_domain"] = """
    SELECT doc_id,
           CASE doc_id % 8
               WHEN 0 THEN 'a' || CAST(doc_id AS VARCHAR) || '.b.example.com'
               WHEN 1 THEN 'shop' || CAST(doc_id AS VARCHAR) || '.co.uk'
               WHEN 2 THEN 'www.blog' || CAST(doc_id AS VARCHAR) || '.blogspot.com'
               WHEN 3 THEN 'u' || CAST(doc_id AS VARCHAR) || '.github.io'
               WHEN 4 THEN 'co.uk'
               WHEN 5 THEN 'x' || CAST(doc_id AS VARCHAR) || '.w'
                           || CAST(doc_id AS VARCHAR) || '.ck'
               WHEN 6 THEN 'www.ck'
               ELSE 'm' || CAST(doc_id AS VARCHAR) || '.unlisted'
                        || CAST(doc_id % 3 AS VARCHAR) END AS host,
           CASE doc_id % 8
               WHEN 0 THEN 'com'
               WHEN 1 THEN 'co.uk'
               WHEN 2 THEN 'blogspot.com'
               WHEN 3 THEN 'github.io'
               WHEN 4 THEN 'co.uk'
               WHEN 5 THEN 'w' || CAST(doc_id AS VARCHAR) || '.ck'
               WHEN 6 THEN 'ck'
               ELSE 'unlisted' || CAST(doc_id % 3 AS VARCHAR) END AS public_suffix,
           CASE doc_id % 8
               WHEN 0 THEN 'example.com'
               WHEN 1 THEN 'shop' || CAST(doc_id AS VARCHAR) || '.co.uk'
               WHEN 2 THEN 'blog' || CAST(doc_id AS VARCHAR) || '.blogspot.com'
               WHEN 3 THEN 'u' || CAST(doc_id AS VARCHAR) || '.github.io'
               WHEN 4 THEN NULL
               WHEN 5 THEN 'x' || CAST(doc_id AS VARCHAR) || '.w'
                           || CAST(doc_id AS VARCHAR) || '.ck'
               WHEN 6 THEN 'www.ck'
               ELSE 'm' || CAST(doc_id AS VARCHAR) || '.unlisted'
                        || CAST(doc_id % 3 AS VARCHAR) END AS registrable_domain
    FROM documents
"""

ORACLE_SQL["ccnet_buckets"] = r"""
    WITH toks AS (SELECT doc_id,
           list_filter(string_split_regex(trim(lower(substr(text, 1, 300))), '\s+'),
                       w -> w <> '') AS t FROM documents),
    per AS (SELECT doc_id,
           CAST(coalesce(list_sum(list_transform(t,
                w -> CASE WHEN len(w) >= 2 THEN len(w) - 1 ELSE 0 END)), 0)
                AS BIGINT) AS n_bigrams,
           CAST(coalesce(list_sum(list_transform(t,
                w -> len(list_filter(
                    list_transform(range(1, len(w)), i -> substr(w, CAST(i AS INT), 2)),
                    b -> list_contains(['th','he','in','er','an','re','on','at','en',
                                        'nd','ti','es','or','te','of','ed','is','it',
                                        'al','ar','st','to','nt','ng','se','ha','as',
                                        'ou','io','le'], b))))), 0)
                AS BIGINT) AS n_known
         FROM toks),
    sc AS (SELECT doc_id,
           CAST((n_known * 1000) // greatest(n_bigrams, 1) AS BIGINT) AS score_milli
         FROM per),
    cnt AS (SELECT score_milli, CAST(count(*) AS BIGINT) AS cnt FROM sc GROUP BY 1),
    lab AS (SELECT score_milli,
            coalesce(sum(cnt) OVER (ORDER BY score_milli DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                CAST(0 AS BIGINT)) AS above,
            sum(cnt) OVER () AS n
        FROM cnt)
    SELECT sc.doc_id, sc.score_milli,
           CASE WHEN above * 3 < n THEN 'head'
                WHEN above * 3 < 2 * n THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM sc JOIN lab USING (score_milli)
"""

ORACLE_SQL["bitext"] = """
    WITH p AS (SELECT doc_id,
            doc_id - doc_id % 5 AS g,
            CASE doc_id % 5 WHEN 0 THEN 'en' WHEN 1 THEN 'fr' WHEN 2 THEN 'de'
                            WHEN 3 THEN 'es' ELSE 'zh' END AS lang
        FROM documents),
    keyed AS (SELECT g,
            'https://host' || CAST(g % 7 AS VARCHAR) || '.example/*/article'
                || CAST(g AS VARCHAR) AS pair_key,
            'https://host' || CAST(g % 7 AS VARCHAR) || '.example/' || lang
                || '/article' || CAST(g AS VARCHAR) AS url,
            lang
        FROM p)
    SELECT a.pair_key, a.url AS url_a, a.lang AS lang_a,
           b.url AS url_b, b.lang AS lang_b
    FROM keyed a JOIN keyed b ON a.g = b.g AND a.lang < b.lang
"""

ORACLE_SQL["bloom_prefilter"] = """
    WITH u AS (SELECT doc_id,
            'https://host' || CAST(doc_id % 10 AS VARCHAR) || '.example/p/'
                || CAST(doc_id AS VARCHAR) AS url
        FROM documents),
    pos AS (SELECT doc_id, url,
            [list_reduce(list_prepend(CAST(1000003 AS BIGINT),
                    list_transform(split(url, ''),
                                   c -> CAST(ascii(c) AS BIGINT))),
                 (a, b) -> (a * 31 + b) % 1000000007) % 4096,
             list_reduce(list_prepend(CAST(2000006 AS BIGINT),
                    list_transform(split(url, ''),
                                   c -> CAST(ascii(c) AS BIGINT))),
                 (a, b) -> (a * 37 + b) % 1000000007) % 4096,
             list_reduce(list_prepend(CAST(3000009 AS BIGINT),
                    list_transform(split(url, ''),
                                   c -> CAST(ascii(c) AS BIGINT))),
                 (a, b) -> (a * 41 + b) % 1000000007) % 4096] AS ps
        FROM u),
    bits AS (SELECT DISTINCT p.x AS pos
        FROM pos, unnest(ps) AS p(x) WHERE doc_id % 3 = 0),
    per AS (SELECT doc_id, p.x AS pos FROM pos, unnest(ps) AS p(x)),
    hits AS (SELECT per.doc_id, count(*) AS n
        FROM per JOIN bits USING (pos) GROUP BY 1)
    SELECT pos.doc_id, pos.url, coalesce(hits.n, 0) = 3 AS candidate
    FROM pos LEFT JOIN hits ON pos.doc_id = hits.doc_id
"""

ORACLE_SQL["alpha_mix"] = r"""
    WITH per AS (SELECT source,
            CAST(sum(len(list_filter(string_split_regex(trim(text), '\s+'),
                                     w -> w <> ''))) AS BIGINT) AS tokens
        FROM documents GROUP BY source),
    w AS (SELECT *, CAST(floor(sqrt(tokens)) AS BIGINT) AS weight FROM per),
    t AS (SELECT *,
            CAST(sum(tokens) OVER () // 2 AS BIGINT) AS budget,
            sum(weight) OVER () AS w_sum
        FROM w),
    b AS (SELECT *,
            (budget * weight) // greatest(w_sum, 1) AS base,
            (budget * weight) % greatest(w_sum, 1) AS rem
        FROM t),
    l AS (SELECT *, budget - sum(base) OVER () AS leftover,
            row_number() OVER (ORDER BY rem DESC, source ASC) AS rank
        FROM b)
    SELECT source, tokens, weight,
           CAST(base + CASE WHEN rank <= leftover THEN 1 ELSE 0 END AS BIGINT)
               AS allocation,
           CAST(CASE WHEN tokens > 0
                THEN ((base + CASE WHEN rank <= leftover THEN 1 ELSE 0 END)
                      * 1000) // greatest(tokens, 1)
                ELSE 0 END AS BIGINT) AS sample_milli
    FROM l
"""

ORACLE_SQL["line_langid"] = """
    WITH k AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS ks FROM documents),
    lines AS (
        SELECT doc_id, 0 AS line_no,
               length('the cat and dog of note ' || ks) AS n_chars,
               'en' AS line_lang
        FROM k
        UNION ALL
        SELECT doc_id, 1,
               length('x le chien et la maison ' || ks), 'fr'
        FROM k WHERE doc_id % 2 = 0
        UNION ALL
        SELECT doc_id,
               1 + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END,
               length('y der hund und die katze'), 'de'
        FROM k WHERE doc_id % 3 = 0
        UNION ALL
        -- the blank k%4 line is dropped but still consumes a line number
        SELECT doc_id,
               1 + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
                 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                 + CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END,
               length('12345 67890'), 'und'
        FROM k WHERE doc_id % 5 = 0
    )
    SELECT doc_id, CAST(line_no AS INT) AS line_no,
           CAST(n_chars AS INT) AS n_chars, line_lang,
           'en' AS doc_lang, (line_lang <> 'en') AS diverges
    FROM lines
"""

ORACLE_SQL["soft404_html"] = """
    SELECT 'https://h' || CAST(doc_id % 10 AS VARCHAR) || '.example/p/'
               || CAST(doc_id AS VARCHAR) AS url,
           CAST(CASE WHEN doc_id % 11 = 0 THEN 404 ELSE 200 END AS INT)
               AS status,
           CASE doc_id % 5
               WHEN 0 THEN TRUE
               WHEN 1 THEN CAST(doc_id AS VARCHAR) LIKE '%404%'
               WHEN 2 THEN CAST(doc_id AS VARCHAR) LIKE '%404%'
               WHEN 3 THEN FALSE
               ELSE TRUE END AS title_404,
           (doc_id % 5 = 1) AS body_404,
           (doc_id % 5 IN (0, 1, 3)) AS thin,
           (doc_id % 11 <> 0) AND (
               CASE doc_id % 5
                   WHEN 0 THEN TRUE
                   WHEN 1 THEN TRUE
                   WHEN 2 THEN CAST(doc_id AS VARCHAR) LIKE '%404%'
                   WHEN 3 THEN FALSE
                   ELSE TRUE END) AS soft404
    FROM documents
"""

ORACLE_SQL["unimax"] = r"""
    WITH per AS (SELECT source,
            CAST(sum(len(list_filter(string_split_regex(trim(text), '\s+'),
                                     w -> w <> ''))) AS BIGINT) AS tokens
        FROM documents GROUP BY source),
    c AS (SELECT *, tokens * 2 AS cap FROM per),
    r AS (SELECT *,
            row_number() OVER (ORDER BY cap, source) AS rank,
            sum(cap) OVER (ORDER BY cap, source
                ROWS UNBOUNDED PRECEDING) AS s_incl,
            count(*) OVER () AS n_src,
            CAST(sum(tokens) OVER () // 2 AS BIGINT) AS budget
        FROM c),
    f AS (SELECT *,
            (cap * (n_src - rank + 1) <= budget - (s_incl - cap)) AS is_capped
        FROM r),
    f2 AS (SELECT *,
            sum(CASE WHEN is_capped THEN 1 ELSE 0 END)
                OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING) AS capped_cum
        FROM f),
    g AS (SELECT *,
            coalesce(max(CASE WHEN is_capped AND rank = capped_cum
                THEN rank END) OVER (), 0) AS k_star
        FROM f2),
    h AS (SELECT *,
            coalesce(max(CASE WHEN rank = k_star THEN s_incl END) OVER (),
                     CAST(0 AS BIGINT)) AS s_k
        FROM g),
    i AS (SELECT *,
            greatest(n_src - k_star, 1) AS m,
            budget - s_k AS leftover
        FROM h),
    j AS (SELECT *,
            CAST(leftover // m AS BIGINT) AS u,
            leftover - CAST(leftover // m AS BIGINT) * m AS rem
        FROM i),
    k AS (SELECT *,
            CASE WHEN rank <= k_star THEN cap
                 ELSE u + CASE WHEN rank - k_star <= rem THEN 1 ELSE 0 END
            END AS allocation
        FROM j)
    SELECT source, tokens, cap, CAST(allocation AS BIGINT) AS allocation,
           CAST(CASE WHEN tokens > 0
                     THEN (allocation * 1000) // tokens ELSE 0 END
                AS BIGINT) AS epochs_milli
    FROM k
"""

ORACLE_SQL["meta_robots"] = """
    SELECT doc_id,
           doc_id % 6 IN (1, 3) AS noindex,
           doc_id % 6 IN (1, 3) AS nofollow,
           doc_id % 6 = 4 AS noarchive,
           doc_id % 6 = 4 AS nosnippet,
           doc_id % 6 = 2 AS noai
    FROM documents
"""

ORACLE_SQL["domain_split"] = r"""
    WITH hosts AS (
        SELECT doc_id,
               CASE doc_id % 8
                   WHEN 0 THEN 'a' || CAST(doc_id AS VARCHAR) || '.b.example.com'
                   WHEN 1 THEN 'shop' || CAST(doc_id AS VARCHAR) || '.co.uk'
                   WHEN 2 THEN 'www.blog' || CAST(doc_id AS VARCHAR) || '.blogspot.com'
                   WHEN 3 THEN 'u' || CAST(doc_id AS VARCHAR) || '.github.io'
                   WHEN 4 THEN 'co.uk'
                   WHEN 5 THEN 'x' || CAST(doc_id AS VARCHAR) || '.w'
                               || CAST(doc_id AS VARCHAR) || '.ck'
                   WHEN 6 THEN 'www.ck'
                   ELSE 'm' || CAST(doc_id AS VARCHAR) || '.unlisted'
                            || CAST(doc_id % 3 AS VARCHAR) END AS host,
               CASE doc_id % 8
                   WHEN 0 THEN 'com'
                   WHEN 1 THEN 'co.uk'
                   WHEN 2 THEN 'blogspot.com'
                   WHEN 3 THEN 'github.io'
                   WHEN 4 THEN 'co.uk'
                   WHEN 5 THEN 'w' || CAST(doc_id AS VARCHAR) || '.ck'
                   WHEN 6 THEN 'ck'
                   ELSE 'unlisted' || CAST(doc_id % 3 AS VARCHAR)
               END AS public_suffix,
               CASE doc_id % 8
                   WHEN 0 THEN 'example.com'
                   WHEN 1 THEN 'shop' || CAST(doc_id AS VARCHAR) || '.co.uk'
                   WHEN 2 THEN 'blog' || CAST(doc_id AS VARCHAR) || '.blogspot.com'
                   WHEN 3 THEN 'u' || CAST(doc_id AS VARCHAR) || '.github.io'
                   WHEN 4 THEN NULL
                   WHEN 5 THEN 'x' || CAST(doc_id AS VARCHAR) || '.w'
                               || CAST(doc_id AS VARCHAR) || '.ck'
                   WHEN 6 THEN 'www.ck'
                   ELSE 'm' || CAST(doc_id AS VARCHAR) || '.unlisted'
                            || CAST(doc_id % 3 AS VARCHAR)
               END AS registrable_domain
        FROM documents),
    h AS (SELECT *, list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(split(coalesce(registrable_domain, public_suffix), ''),
                           c -> CAST(ascii(c) AS BIGINT))),
            (a, b) -> (a * 31 + b) % 1000000007) % 100 AS bucket FROM hosts)
    SELECT doc_id, host, public_suffix, registrable_domain,
           CASE WHEN bucket < 5 THEN 'test'
                WHEN bucket < 10 THEN 'val'
                ELSE 'train' END AS split
    FROM h
"""

ORACLE_SQL["vtt_cues"] = """
    WITH c AS (SELECT doc_id, u.k AS k FROM documents,
               unnest(range(0, 2 + doc_id % 3)) AS u(k))
    SELECT doc_id AS blob_id, CAST(k AS INT) AS cue_idx,
           CAST(1000 + 153 * (doc_id % 10) + 2000 * k AS BIGINT) AS start_ms,
           CAST(1000 + 153 * (doc_id % 10) + 2000 * k + 400 + 10 * k
                AS BIGINT) AS end_ms,
           'cue ' || CAST(k AS VARCHAR) || ' of doc ' || CAST(doc_id AS VARCHAR)
               || CASE WHEN k = 0 THEN chr(10) || 'continued' ELSE '' END AS text
    FROM c
"""

ORACLE_SQL["video_frames"] = """
    WITH f AS (SELECT doc_id, u.i AS frame_idx FROM documents,
               unnest(range(0, 3 + doc_id % 3, 2)) AS u(i))
    SELECT doc_id AS blob_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(8 AS INT) AS width, CAST(6 AS INT) AS height,
           CAST(8 * 6 * 3 * ((doc_id * 7 + 31 * frame_idx) % 256) AS BIGINT)
               AS pixel_sum
    FROM f
"""

ORACLE_SQL["audio_features"] = """
    SELECT doc_id AS blob_id,
           CAST(8000 + 1000 * (doc_id % 2) AS INT) AS sample_rate,
           CAST(CASE WHEN doc_id % 7 = 0 THEN 2 ELSE 1 END AS INT) AS n_channels,
           CAST(256 + 16 * (doc_id % 5) AS INT) AS n_samples,
           CAST(500 * (1 + doc_id % 3) AS INT) AS peak,
           CAST((256 + 16 * (doc_id % 5))
                * (500 * (1 + doc_id % 3)) * (500 * (1 + doc_id % 3))
                AS BIGINT) AS energy,
           CAST((256 + 16 * (doc_id % 5) - 1) // (4 + doc_id % 4) AS INT)
               AS zero_crossings
    FROM documents
"""

ORACLE_SQL["sequence_pack"] = r"""
    WITH toks AS (
        SELECT doc_id, lang,
               len(list_filter(string_split_regex(trim(text), '\s+'),
                               w -> w <> '')) AS n
        FROM documents
    ), c AS (
        SELECT doc_id, lang, n,
               sum(n) OVER (PARTITION BY lang ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM toks
    )
    SELECT doc_id, lang, CAST(n AS BIGINT) AS n_tokens,
           CAST(cum - n AS BIGINT) AS start_offset,
           CAST(floor((cum - n) / 2048) AS BIGINT) AS seq_id,
           CAST((cum - n) % 2048 AS BIGINT) AS offset_in_seq,
           CAST(CASE WHEN n > 0
                     THEN floor((cum - 1) / 2048) - floor((cum - n) / 2048) + 1
                     ELSE 0 END AS BIGINT) AS n_seqs_spanned
    FROM c
"""

ORACLE_SQL["heavy_hitters"] = """
    WITH words AS (
        SELECT w AS key
        FROM documents, unnest(string_split(trim(text), ' ')) AS u(w)
        WHERE w <> ''
    ), pos AS (
        SELECT key, r.i AS row,
               list_reduce(list_prepend(CAST(999983 * (r.i + 1) AS BIGINT),
                       list_transform(split(key, ''),
                                      c -> CAST(ascii(c) AS BIGINT))),
                   (a, b) -> (a * r.m + b) % 1000000007) % 16 AS pos
        FROM words, (VALUES (0, 31), (1, 37), (2, 41)) r(i, m)
    ), sketch AS (
        SELECT row, pos, CAST(count(*) AS BIGINT) AS cnt
        FROM pos GROUP BY 1, 2
    ), probe AS (
        SELECT DISTINCT key, row, pos FROM pos
    ), est AS (
        SELECT p.key, CAST(min(COALESCE(s.cnt, 0)) AS BIGINT) AS est
        FROM probe p LEFT JOIN sketch s ON s.row = p.row AND s.pos = p.pos
        GROUP BY 1
    )
    SELECT key, est FROM est WHERE est >= 900
"""

ORACLE_SQL["hll_distinct"] = """
    WITH keys AS (
        SELECT DISTINCT w || '#' || CAST(doc_id AS VARCHAR) AS key
        FROM documents, unnest(string_split(trim(text), ' ')) AS u(w)
        WHERE w <> ''
    ), h AS (
        SELECT key,
               list_reduce(list_prepend(CAST(312994679 AS BIGINT),
                       list_transform(split(key, ''),
                                      c -> CAST(ascii(c) AS BIGINT))),
                   (a, b) -> (a * 37 + b) % 1000000007) % 128 AS register,
               list_reduce(list_prepend(CAST(100998283 AS BIGINT),
                       list_transform(split(key, ''),
                                      c -> CAST(ascii(c) AS BIGINT))),
                   (a, b) -> (a * 41 + b) % 1000000007) AS h2lin
        FROM keys
    ), hsq AS (
        SELECT key, register,
               xor((h2lin * h2lin) % 1000000007,
                   ((h2lin * h2lin) % 1000000007) >> 13) AS h2
        FROM h
    ), rho AS (
        SELECT register,
               len(list_filter(
                   list_transform(range(1, 31),
                                  p -> CAST(power(2, p) AS BIGINT)),
                   d -> h2 % d = 0)) + 1 AS rho
        FROM hsq
    ), regs AS (
        SELECT register, max(rho) AS max_rho FROM rho GROUP BY 1
    ), agg AS (
        SELECT CAST(count(*) AS INT) AS n_registers_set,
               CAST(sum(CAST(power(2, 31 - max_rho) AS BIGINT))
                    + (128 - count(*)) * CAST(power(2, 31) AS BIGINT)
                    AS BIGINT) AS harmonic_scaled
        FROM regs
    )
    SELECT CAST(128 AS INT) AS m, n_registers_set, harmonic_scaled,
           CAST((CAST(715 AS BIGINT) * 128 * 128 * CAST(power(2, 31) AS BIGINT))
                // (1000 * harmonic_scaled) AS BIGINT) AS estimate,
           (SELECT CAST(count(*) AS BIGINT) FROM keys) AS exact_distinct
    FROM agg
"""

def _hll_overlap_oracle_sql() -> str:
    """Replays q_crawl_overlap: three register tables (A, B, union as
    register-wise max) and the integer-quantized raw estimate for each,
    with the same poly-hash/rho pipeline as the hll_distinct oracle."""

    def regs(name: str, src: str) -> str:
        return f"""
    {name}_h AS (
        SELECT key,
               list_reduce(list_prepend(CAST(312994679 AS BIGINT),
                       list_transform(split(key, ''),
                                      c -> CAST(ascii(c) AS BIGINT))),
                   (a, b) -> (a * 37 + b) % 1000000007) % 128 AS register,
               list_reduce(list_prepend(CAST(100998283 AS BIGINT),
                       list_transform(split(key, ''),
                                      c -> CAST(ascii(c) AS BIGINT))),
                   (a, b) -> (a * 41 + b) % 1000000007) AS h2lin
        FROM {src}
    ), {name}_rho AS (
        SELECT register,
               len(list_filter(
                   list_transform(range(1, 31),
                                  p -> CAST(power(2, p) AS BIGINT)),
                   d -> xor((h2lin * h2lin) % 1000000007,
                            ((h2lin * h2lin) % 1000000007) >> 13) % d = 0))
                   + 1 AS rho
        FROM {name}_h
    ), {name}_regs AS (
        SELECT register, max(rho) AS max_rho FROM {name}_rho GROUP BY 1
    ), {name}_est AS (
        SELECT CAST((CAST(715 AS BIGINT) * 128 * 128
                     * CAST(power(2, 31) AS BIGINT))
               // (1000 * (sum(CAST(power(2, 31 - max_rho) AS BIGINT))
                           + (128 - count(*)) * CAST(power(2, 31) AS BIGINT)))
               AS BIGINT) AS estimate
        FROM {name}_regs
    )"""

    host = _HOST_SQL.format(k="doc_id")
    return (
        f"""
    WITH d AS (
        SELECT doc_id,
               'https://' || {host} || '.example/p/'
                   || CAST(doc_id AS VARCHAR) AS key
        FROM documents
    ),
    a_keys AS (SELECT key FROM d WHERE doc_id % 2 = 0),
    b_keys AS (SELECT key FROM d WHERE doc_id % 3 = 0),"""
        + regs("a", "a_keys") + "," + regs("b", "b_keys")
        + """,
    u_regs_raw AS (
        SELECT register, max_rho FROM a_regs
        UNION ALL SELECT register, max_rho FROM b_regs
    ), u_regs AS (
        SELECT register, max(max_rho) AS max_rho FROM u_regs_raw GROUP BY 1
    ), u_est AS (
        SELECT CAST((CAST(715 AS BIGINT) * 128 * 128
                     * CAST(power(2, 31) AS BIGINT))
               // (1000 * (sum(CAST(power(2, 31 - max_rho) AS BIGINT))
                           + (128 - count(*)) * CAST(power(2, 31) AS BIGINT)))
               AS BIGINT) AS estimate
        FROM u_regs
    ),
    exact AS (
        SELECT CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS exact_a,
               CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS exact_b,
               CAST(sum(CASE WHEN doc_id % 6 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS exact_intersection
        FROM d
    )
    SELECT a_est.estimate AS est_a, b_est.estimate AS est_b,
           u_est.estimate AS est_union,
           a_est.estimate + b_est.estimate - u_est.estimate
               AS est_intersection,
           exact_a, exact_b, exact_intersection
    FROM a_est, b_est, u_est, exact
"""
    )


ORACLE_SQL["crawl_overlap"] = _hll_overlap_oracle_sql()

ORACLE_SQL["length_quantiles"] = """
    WITH v AS (
        SELECT greatest(CAST(length(text) AS BIGINT), 1) AS v FROM documents
    ), sh AS (
        SELECT v, greatest(length(bin(v)) - 1 - 5, 0) AS shift FROM v
    ), lbs AS (
        SELECT v - v % CAST(power(2, shift) AS BIGINT) AS lb FROM sh
    ), buckets AS (
        SELECT lb, CAST(count(*) AS BIGINT) AS cnt FROM lbs GROUP BY 1
    ), cums AS (
        SELECT lb,
               CAST(sum(cnt) OVER (ORDER BY lb) AS BIGINT) AS cum,
               CAST(sum(cnt) OVER () AS BIGINT) AS total
        FROM buckets
    ), qs AS (SELECT q_milli FROM (VALUES (500), (900), (990), (999)) q(q_milli))
    SELECT CAST(q.q_milli AS INT) AS q_milli,
           CAST(min(c.lb) AS BIGINT) AS est,
           CAST(min(c.total) AS BIGINT) AS total
    FROM qs q JOIN cums c ON c.cum * 1000 >= q.q_milli * c.total
    GROUP BY 1
"""

ORACLE_SQL["dedup_keep_best"] = """
    WITH RECURSIVE toks AS (
        SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents
    ), sh0 AS (
        SELECT doc_id, list_aggregate(t[i:i+2], 'string_agg', ' ') AS sh
        FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
    ), sh AS (
        SELECT DISTINCT doc_id, sh FROM sh0 WHERE sh IS NOT NULL
    ), sizes AS (
        SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS shared
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), pairs AS (
        SELECT doc_a, doc_b
        FROM shared
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE round(shared * 1.0 / (sa.n + sb.n - shared), 6) >= 0.5
    ), edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs
    ), reach(doc_id, lab) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.lab FROM edges e JOIN reach r ON r.doc_id = e.dst
    ), labels AS (
        SELECT doc_id, min(lab) AS cluster_id FROM reach GROUP BY doc_id
    ), member AS (
        SELECT d.doc_id,
               CAST(COALESCE(l.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
               d.n_chars
        FROM documents d LEFT JOIN labels l USING (doc_id)
    )
    SELECT doc_id, cluster_id,
           (row_number() OVER (
                PARTITION BY cluster_id
                ORDER BY n_chars DESC, doc_id) = 1) AS keep
    FROM member
"""

ORACLE_SQL["gopher_rules"] = r"""
    WITH sig AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                    x -> x <> '')) AS BIGINT) AS n_words,
               list_filter(string_split_regex(trim(text), '\s+'),
                           x -> x <> '') AS toks,
               list_filter(string_split(text, chr(10)),
                           l -> trim(l) <> '') AS lines,
               (length(text) - length(replace(text, '#', '')))
               + CAST(floor((length(text)
                             - length(replace(text, '...', ''))) / 3.0)
                      AS BIGINT)
               + (length(text) - length(replace(text, '…', ''))) AS n_symbols
        FROM documents
    ), r AS (
        SELECT doc_id, n_words,
               CASE WHEN n_words > 0 THEN round(
                   list_aggregate(list_transform(toks, x -> length(x)), 'sum')
                   * 1.0 / n_words, 6) END AS mean_word_len,
               CASE WHEN n_words > 0
                    THEN round(n_symbols * 1.0 / n_words, 6)
               END AS symbol_word_ratio,
               CASE WHEN len(lines) > 0 THEN round(
                   len(list_filter(lines,
                       l -> substr(ltrim(l), 1, 1) IN ('-', '*', '•')))
                   * 1.0 / len(lines), 6) END AS bullet_line_frac,
               CASE WHEN len(lines) > 0 THEN round(
                   len(list_filter(lines,
                       l -> rtrim(l) LIKE '%...' OR rtrim(l) LIKE '%…'))
                   * 1.0 / len(lines), 6) END AS ellipsis_line_frac,
               CASE WHEN n_words > 0 THEN round(
                   len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))
                   * 1.0 / n_words, 6) END AS alpha_word_frac,
               CAST(CAST(list_contains(toks, 'the') AS INT)
                    + CAST(list_contains(toks, 'be') AS INT)
                    + CAST(list_contains(toks, 'to') AS INT)
                    + CAST(list_contains(toks, 'of') AS INT)
                    + CAST(list_contains(toks, 'and') AS INT)
                    + CAST(list_contains(toks, 'that') AS INT)
                    + CAST(list_contains(toks, 'have') AS INT)
                    + CAST(list_contains(toks, 'with') AS INT)
                    AS INT) AS stop_hits
        FROM sig
    )
    SELECT *,
           COALESCE(n_words BETWEEN 30 AND 100000
                    AND mean_word_len BETWEEN 2.0 AND 8.0
                    AND symbol_word_ratio <= 0.1
                    AND COALESCE(bullet_line_frac, 0.0) <= 0.9
                    AND COALESCE(ellipsis_line_frac, 0.0) <= 0.3
                    AND alpha_word_frac >= 0.8
                    AND stop_hits >= 2, false) AS passes
    FROM r
"""

ORACLE_SQL["ngram_lm"] = r"""
    WITH d AS (SELECT doc_id, substr(text, 1, 300) AS text FROM documents),
    tr AS (SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '') AS t
           FROM d WHERE doc_id % 7 = 0),
    uni_all AS (
        SELECT u.w AS w, COUNT(*) AS c1
        FROM tr, unnest(t) AS u(w) GROUP BY 1
    ),
    tot AS (SELECT CAST(COALESCE(SUM(c1), 0) AS BIGINT) AS n FROM uni_all),
    uni AS (SELECT * FROM uni_all WHERE c1 >= 2),
    bi AS (
        SELECT g, COUNT(*) AS c2 FROM (
            SELECT t[CAST(r.i AS INT)] || ' ' || t[CAST(r.i AS INT) + 1] AS g
            FROM tr, unnest(range(1, len(t))) AS r(i)
        ) GROUP BY 1 HAVING COUNT(*) >= 2
    ),
    ptoks AS (SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '') AS t
           FROM d),
    probe AS (
        SELECT doc_id,
               t[CAST(r.i AS INT)] AS w1,
               t[CAST(r.i AS INT) + 1] AS w2
        FROM ptoks, unnest(range(1, len(t))) AS r(i)
    ),
    scored AS (
        SELECT p.doc_id,
               CAST(floor(ln(
                   CASE WHEN b.c2 IS NOT NULL
                        THEN CAST(b.c2 AS DOUBLE) / CAST(u1.c1 AS DOUBLE)
                        ELSE 0.4 * (CASE WHEN u2.c1 IS NOT NULL
                                         THEN CAST(u2.c1 AS DOUBLE)
                                         ELSE 1.0 END)
                             / CAST(greatest(tot.n, 1) AS DOUBLE)
                   END) * 1000) AS BIGINT) AS term
        FROM probe p
        LEFT JOIN bi b ON p.w1 || ' ' || p.w2 = b.g
        LEFT JOIN uni u1 ON p.w1 = u1.w
        LEFT JOIN uni u2 ON p.w2 = u2.w
        CROSS JOIN tot
    ),
    agg AS (
        SELECT doc_id, COUNT(*) AS n_bigrams, SUM(term) AS sb_milli
        FROM scored GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(COALESCE(a.n_bigrams, 0) AS INT) AS n_bigrams,
           CAST(COALESCE(a.sb_milli, 0) AS BIGINT) AS sb_milli,
           CASE WHEN a.n_bigrams > 0
                THEN CAST(floor(a.sb_milli / CAST(a.n_bigrams AS DOUBLE)) AS BIGINT)
           END AS sb_per_bigram_milli
    FROM d LEFT JOIN agg a USING (doc_id)
"""

ORACLE_SQL["kn_lm"] = r"""
    WITH d AS (SELECT doc_id, substr(text, 1, 300) AS text FROM documents),
    tr AS (SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '') AS t
           FROM d WHERE doc_id % 7 = 0),
    bi AS (
        SELECT g, COUNT(*) AS c2 FROM (
            SELECT t[CAST(r.i AS INT)] || ' ' || t[CAST(r.i AS INT) + 1] AS g
            FROM tr, unnest(range(1, len(t))) AS r(i)
        ) GROUP BY 1 HAVING COUNT(*) >= 2
    ),
    lft AS (SELECT split_part(g, ' ', 1) AS w1l, SUM(c2) AS c1tot,
                   COUNT(*) AS n1w1
            FROM bi GROUP BY 1),
    rgt AS (SELECT split_part(g, ' ', 2) AS w2r, COUNT(*) AS n1w2
            FROM bi GROUP BY 1),
    ty AS (SELECT greatest(COUNT(*), 1) AS n FROM bi),
    ptoks AS (SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '') AS t
           FROM d),
    probe AS (
        SELECT doc_id,
               t[CAST(r.i AS INT)] AS w1,
               t[CAST(r.i AS INT) + 1] AS w2
        FROM ptoks, unnest(range(1, len(t))) AS r(i)
    ),
    scored AS (
        SELECT p.doc_id,
               CAST(floor(ln(
                   CASE WHEN l.c1tot IS NOT NULL THEN
                       (greatest(CAST(COALESCE(b.c2, 0) AS DOUBLE) - 0.75, 0.0)
                        + 0.75 * CAST(l.n1w1 AS DOUBLE)
                          * (CAST(greatest(COALESCE(r.n1w2, 0), 1) AS DOUBLE)
                             / CAST(ty.n AS DOUBLE)))
                       / CAST(l.c1tot AS DOUBLE)
                   ELSE CAST(greatest(COALESCE(r.n1w2, 0), 1) AS DOUBLE)
                        / CAST(ty.n AS DOUBLE)
                   END) * 1000) AS BIGINT) AS term
        FROM probe p
        LEFT JOIN bi b ON p.w1 || ' ' || p.w2 = b.g
        LEFT JOIN lft l ON p.w1 = l.w1l
        LEFT JOIN rgt r ON p.w2 = r.w2r
        CROSS JOIN ty
    ),
    agg AS (
        SELECT doc_id, COUNT(*) AS n_bigrams, SUM(term) AS kn_milli
        FROM scored GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(COALESCE(a.n_bigrams, 0) AS INT) AS n_bigrams,
           CAST(COALESCE(a.kn_milli, 0) AS BIGINT) AS kn_milli,
           CASE WHEN a.n_bigrams > 0
                THEN CAST(floor(a.kn_milli / CAST(a.n_bigrams AS DOUBLE)) AS BIGINT)
           END AS kn_per_bigram_milli
    FROM d LEFT JOIN agg a USING (doc_id)
"""



# --------------------------------------------------------------------------
# Fixture oracles (VERDICT r01 item 3): deterministic non-SQL-expressible
# queries get a committed expected-output parquet, generated at build time
# by `python scripts/make_fixtures.py` from the SAME kernels at sf0.01 (the
# driver's correctness scale). The oracle is then a trivial SELECT over the
# fixture, so rows/schema/value-hash are driver-verified; a kernel
# regression shows up as a hash mismatch. Entries register only when the
# fixture exists on disk, so a missing fixture degrades to the rows-only
# check instead of erroring.
# --------------------------------------------------------------------------

import os as _os

FIXTURE_DIR = _os.path.abspath(
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..", "fixtures", "sf001")
)

FIXTURE_ORACLES = [
    "flagship_extract",
    "markdown_export",
    "bitext_align",
    "pdf_extract",
    "charset_sniff",
    "minhash_pairs",
    "simhash_pairs",
    "lsh_ann",
    "ivf_ann",
    "normalize_numbers",
    "combine_boxes",
    "nms_boxes",
    "reading_order",
    "multimodal_meta",
    "multimodal_frames",
    "chunk_extracted",
    "training_pipeline",
    "training_pipeline_v2",
    "dedup_clusters",
    "detect_maps",
    "detect_yolo",
    "split_text",
    "attn_decode",
    "url_canon",
    "bpe_tokens",
    "compression_ratio",
]

for _name in FIXTURE_ORACLES:
    _p = _os.path.join(FIXTURE_DIR, _name + ".parquet")
    if _os.path.isdir(_p):
        ORACLE_SQL[_name] = (
            f"SELECT * FROM read_parquet('{_p}/*.parquet')"
        )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize pages from sf0.001 documents, run the full
    detect -> recognize -> order -> assemble extraction, return
    (url, warc_ts, lang, title, text, spans, n_spans)."""
    return extract_pages(pages_df(spark, "/root/testdata/sf0.001"))
