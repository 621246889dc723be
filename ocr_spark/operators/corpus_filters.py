"""Corpus-filter operators for LLM training-data pipelines.

Five first-class operators a 100 TB web corpus needs beyond dedup:

- :func:`c4_line_clean` — C4-style line cleaning (Raffel et al. 2020 §2.2):
  keep lines ending in terminal punctuation with >= min_words words and no
  "javascript"; drop whole pages containing "lorem ipsum" or "{" or with
  fewer than min_lines surviving lines.
- :func:`pii_redact` — regex redaction of emails / phone numbers / IPv4
  addresses with per-class counts (RefinedWeb/Dolma-style PII pass).
- :func:`dup_ngram_spans` — cross-document duplicated word-n-gram detection
  (Lee et al. 2022 "Deduplicating Training Data Makes Language Models
  Better"): per-doc count of n-grams whose corpus-wide document frequency
  exceeds 1.
- :func:`hash_embedding` — deterministic signed feature-hash embedding
  (hashing-trick bag-of-words, Weinberger et al. 2009) with a portable
  polynomial token hash, entirely shuffle-free.
- :func:`bigram_lm_score` — character-bigram language-model plausibility
  score against a fixed common-English bigram table (cheap fluency gate,
  CCNet-style quality signal without model weights).

Scale notes (the part that matters at 100 TB):

- c4/pii/hash/bigram are PER-ROW Column programs: zero exchanges, fully
  whole-stage-codegen'd, filters still push down past them. A 1000-executor
  run is embarrassingly parallel.
- dup_ngram_spans is the only shuffling operator: posexplode (narrow) ->
  ONE hash exchange on the n-gram key for a window count, then a groupBy
  that AQE coalesces. Boilerplate n-grams are hot keys on the *probe* rows
  of the same exchange; the per-key state is a single counter (no buffering
  of rows), so skew degrades network balance, not memory. For mega-hot
  boilerplate use the two-level partial-agg + broadcast-tail pattern of
  ``dedup.line_boilerplate_dedup``.

Everything is expressible in ANSI-ish SQL, so each operator has a hard
DuckDB oracle in ``contract.ORACLE_SQL`` (independent derivation, not a
fixture).

Reference analogs: the cleaners pipeline
(/root/reference/utils/text/cleaners.py:83-269) and the emission-filter
quality gates (/root/reference/models/ocr/base_ocr.py:679-725); the
corpus-level passes themselves follow the published C4 / Lee-et-al /
hashing-trick recipes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

#: modulus / multiplier of the portable polynomial token hash. Chosen so the
#: same fold is exact in any engine with 64-bit integers (31-base poly mod a
#: prime < 2^30, so acc*31 + 127 < 2^35 never overflows).
POLY_MOD = 1_000_000_007
POLY_MULT = 31

#: 30 most common English character bigrams (public frequency tables);
#: the "LM" of bigram_lm_score.
COMMON_BIGRAMS = (
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
    "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le",
)


def _tokens(text: Column) -> Column:
    """Whitespace-run tokens with empties removed (matches token_count)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda x: x != "")


def _poly_hash(token: Column, init: int = 0) -> Column:
    """Portable polynomial hash: fold acc*31 + ascii(ch) mod 1e9+7 over the
    characters, acc0 = ``init`` (salted variants pass a nonzero seed —
    see operators/bloom). DuckDB mirror:
    ``list_reduce(list_prepend(<init>, list_transform(split(w,''), c -> ascii(c))),
    (a, b) -> (a * 31 + b) % 1000000007)``."""
    chars = F.filter(F.split(token, ""), lambda c: c != "")
    codes = F.transform(chars, F.ascii)
    return F.aggregate(
        codes,
        F.lit(init).cast("long"),
        lambda acc, x: (acc * POLY_MULT + x.cast("long")) % POLY_MOD,
    )


# ---------------------------------------------------------------------------
# 1. C4-style line cleaning
# ---------------------------------------------------------------------------

def c4_line_clean(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 3,
    min_lines: int = 3,
) -> DataFrame:
    """C4 cleaning (Raffel et al. 2020 §2.2), line rules then page rules.

    Line kept iff it ends in ``. ! ? "`` after trim, has >= min_words
    whitespace words, and does not contain "javascript" (case-insensitive).
    Page kept iff its lowercased text contains neither "lorem ipsum" nor
    "{" and >= min_lines lines survive. (C4 proper uses 5 sentences; the
    threshold is a parameter here.)

    Pure per-row Column program — no shuffle, no Python.
    """
    t = F.col(text_col)
    # NB: lambda wrapper is load-bearing — F.trim has an optional 2nd param
    # (trimStr), so passing it bare makes transform() feed it the element
    # INDEX as the trim string
    lines = F.filter(
        F.transform(F.split(t, r"\n"), lambda x: F.trim(x)), lambda x: x != ""
    )
    kept = F.filter(
        lines,
        lambda ln: ln.rlike(r'[.!?"]$')
        & (F.size(F.filter(F.split(ln, r"\s+"), lambda w: w != "")) >= min_words)
        & ~F.lower(ln).contains("javascript"),
    )
    out = df.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, "\n").alias("clean_text"),
        F.lower(t).alias("_lt"),
    )
    return (
        out.where(
            ~F.col("_lt").contains("lorem ipsum")
            & ~F.col("_lt").contains("{")
            & (F.col("n_kept") >= min_lines)
        )
        .drop("_lt")
    )


# ---------------------------------------------------------------------------
# 2. PII redaction
# ---------------------------------------------------------------------------

# RE2-compatible (no lookaround) so the DuckDB oracle runs the SAME patterns.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails -> [EMAIL], phones -> [PHONE], IPv4 -> [IP], with
    per-class match counts (counted BEFORE redaction; email first so an
    address's host part is never re-matched as a phone/IP).

    Per-row regexp Column program — no shuffle, no Python. At 100 TB this
    runs inside the same codegen stage as the scan.
    """
    t = F.col(text_col)
    red = F.regexp_replace(t, EMAIL_RE, "[EMAIL]")
    red = F.regexp_replace(red, PHONE_RE, "[PHONE]")
    red = F.regexp_replace(red, IPV4_RE, "[IP]")
    return df.withColumns(
        {
            "n_emails": F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)),
            "n_phones": F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0)),
            "n_ips": F.size(
                F.regexp_extract_all(F.regexp_replace(t, EMAIL_RE, "[EMAIL]"), F.lit(IPV4_RE), 0)
            ),
            "redacted_text": red,
        }
    )


# ---------------------------------------------------------------------------
# 3. duplicated n-gram spans (Lee et al. 2022)
# ---------------------------------------------------------------------------

def dup_ngram_spans(df: DataFrame, n: int = 5, text_col: str = "text") -> DataFrame:
    """Per-doc count of word n-grams that occur in more than one document
    corpus-wide (the detection half of exact-substring dedup, Lee et al.
    2022; span *removal* composes with split_text downstream).

    Plan: narrow posexplode of per-doc n-grams -> ONE exchange on
    (ngram) for a two-level count (distinct docs per n-gram) -> groupBy
    doc_id. n-gram *document* frequency (not occurrence count) is used so a
    phrase repeated within a single page is not flagged as cross-doc
    boilerplate.
    """
    toks = _tokens(F.col(text_col))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = df.select("doc_id", F.explode(grams).alias("ngram"))
    # distinct docs per (doc, ngram) first: partial agg keeps the exchange
    # carrying one row per (doc, ngram), not one per occurrence
    per_doc = exploded.groupBy("doc_id", "ngram").agg(
        F.count(F.lit(1)).cast("long").alias("n_occ")
    )
    w = Window.partitionBy("ngram")
    flagged = per_doc.withColumn("doc_freq", F.count(F.lit(1)).over(w))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.sum("n_occ").cast("long").alias("n_ngrams"),
            F.sum(F.when(F.col("doc_freq") > 1, F.col("n_occ")).otherwise(0))
            .cast("long")
            .alias("n_dup"),
        )
        .select(
            "doc_id",
            "n_ngrams",
            "n_dup",
            F.round(F.col("n_dup") / F.col("n_ngrams"), 4).alias("dup_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# 4. hash embeddings (hashing trick)
# ---------------------------------------------------------------------------

def hash_embedding(df: DataFrame, dim: int = 16, text_col: str = "text") -> DataFrame:
    """Signed feature-hash bag-of-words embedding (Weinberger et al. 2009):
    token -> h = poly_hash(token); bucket = h % dim; sign = +1 if
    h % (2*dim) < dim else -1; emb[bucket] += sign.

    Integer output (exact in any engine); emitted as a CSV string so the
    value-hash compare is byte-stable. Entirely per-row: NO shuffle — the
    per-bucket sums are computed by a transform over sequence(0, dim-1),
    O(dim * n_tokens) JVM work, zero exchanges.
    """
    toks = _tokens(F.col(text_col))
    hashes = F.transform(toks, lambda t: _poly_hash(t))
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda b: F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(h % dim == b.cast("long"), F.when(h % (2 * dim) < dim, 1).otherwise(-1))
            .otherwise(0)
            .cast("long"),
        ),
    )
    return df.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_join(F.transform(emb, lambda v: v.cast("string")), ",").alias("emb_csv"),
    )


# ---------------------------------------------------------------------------
# 5. char-bigram LM score
# ---------------------------------------------------------------------------

def bigram_lm_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fluency score = fraction of word-internal character bigrams found in
    a fixed common-English bigram table. Per-row, shuffle-free; the bigram
    table is a Column literal (no broadcast needed at any scale).
    """
    common = F.array(*[F.lit(b) for b in COMMON_BIGRAMS])
    toks = _tokens(F.lower(F.col(text_col)))

    def _bigrams(tok: Column) -> Column:
        return F.when(
            F.length(tok) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.length(tok) - 1),
                lambda i: F.substring(tok, i, F.lit(2)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    n_bigrams = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.size(_bigrams(t))
    )
    n_known = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.size(F.filter(_bigrams(t), lambda b: F.array_contains(common, b))),
    )
    return df.select(
        "doc_id",
        n_bigrams.alias("n_bigrams"),
        n_known.alias("n_known"),
        F.round(
            F.when(n_bigrams > 0, n_known / n_bigrams), 4
        ).alias("bigram_score"),
    )


# ---------------------------------------------------------------------------
# 6. duplicated-span removal (the second half of Lee et al. 2022)
# ---------------------------------------------------------------------------

def dup_span_removal(df: DataFrame, n: int = 5, text_col: str = "text") -> DataFrame:
    """Remove every token covered by a word n-gram that occurs in more than
    one document (the removal half of exact-substring dedup; detection is
    :func:`dup_ngram_spans`). A token at index i is covered iff some
    duplicated n-gram starts in [i-n+1, i].

    Plan: posexplode n-grams with start positions (narrow) -> groupBy
    (doc_id, ngram) partial agg -> ONE window exchange on ngram for document
    frequency -> groupBy doc_id to collect duplicated starts -> equi-join
    back to the docs on doc_id (docs that lost nothing keep n_removed = 0
    via the left join). Rebuild is a per-row filter over token indices —
    no Python anywhere.
    """
    toks = _tokens(F.col(text_col))
    src = df.select("doc_id", toks.alias("t"))
    grams = src.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.size("t") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (n - 1)),
                    lambda i: F.array_join(F.slice("t", i, n), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos0", "ngram"),
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "ngram")
    per = grams.groupBy("doc_id", "ngram").agg(F.collect_list("pos").alias("starts"))
    w = Window.partitionBy("ngram")
    dup = (
        per.withColumn("doc_freq", F.count(F.lit(1)).over(w))
        .where(F.col("doc_freq") > 1)
        .groupBy("doc_id")
        .agg(F.array_sort(F.flatten(F.collect_list("starts"))).alias("dup_starts"))
    )
    joined = src.join(dup, "doc_id", "left").withColumn(
        "dup_starts",
        F.coalesce(F.col("dup_starts"), F.array().cast("array<bigint>")),
    )
    idxs = F.sequence(F.lit(1), F.size("t"))
    covered = lambda i: F.exists(  # noqa: E731
        F.col("dup_starts"), lambda s: (s <= i) & (i < s + n)
    )
    kept = F.filter(
        F.transform(idxs, lambda i: F.struct(i.alias("i"), F.element_at("t", i).alias("w"))),
        lambda st: ~covered(st["i"].cast("bigint")),
    )
    return joined.select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        (F.size("t") - F.size(kept)).alias("n_removed"),
        F.array_join(F.transform(kept, lambda st: st["w"]), " ").alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# 7. benchmark decontamination (GPT-3 appendix C / Dolma style)
# ---------------------------------------------------------------------------

def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    bench_text_col: str = "passage",
) -> DataFrame:
    """Flag documents sharing any word n-gram with a benchmark/eval set.

    The benchmark side is tiny by construction (eval suites are KBs, the
    corpus is TBs), so its distinct n-grams are BROADCAST and the overlap
    check is a broadcast semi-join on the n-gram key — zero shuffle of the
    corpus side. Returns every input doc with the count of distinct
    contaminated n-grams and a boolean flag.
    """

    def _grams(col, k):
        toks = _tokens(col)
        return F.when(
            F.size(toks) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (k - 1)),
                lambda i: F.array_join(F.slice(toks, i, k), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    bench_grams = (
        benchmark.select(F.explode(_grams(F.col(bench_text_col), n)).alias("ngram"))
        .distinct()
    )
    doc_grams = df.select(
        "doc_id", F.explode_outer(F.array_distinct(_grams(F.col(text_col), n))).alias("ngram")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "ngram", "inner")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return (
        df.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("is_contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# 8. deterministic stratified sampling
# ---------------------------------------------------------------------------

#: Knuth multiplicative constant — a portable deterministic shuffle key
KNUTH = 2_654_435_761
U31 = 2_147_483_648
U32 = 4_294_967_296


def stratified_sample(
    df: DataFrame, frac: float = 0.25, strata_col: str = "lang"
) -> DataFrame:
    """Keep ceil(frac * |stratum|) docs per stratum, chosen by a
    deterministic multiplicative-hash shuffle key
    ((doc_id mod 2^31) * KNUTH mod 2^32) — reproducible across engines and
    runs, unlike rand()-based sampling, and overflow-free in 64-bit integer
    arithmetic for any doc_id (the pre-mod bounds the product under 2^63,
    which matters under Spark ANSI mode at 10^12-doc ids; key collisions
    past 2^31 docs only affect ordering and are broken by doc_id). One
    window exchange on the stratum key.

    The mixture-sampling shape of training-corpus curation (per-domain /
    per-language token budgets): swap frac for a per-stratum map to weight
    domains differently.
    """
    key = ((F.col("doc_id") % F.lit(U31)) * F.lit(KNUTH)) % F.lit(U32)
    w = Window.partitionBy(strata_col).orderBy(key.asc(), F.col("doc_id").asc())
    cnt = Window.partitionBy(strata_col)
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .withColumn("n_stratum", F.count(F.lit(1)).over(cnt).cast("long"))
        .where(F.col("sample_rank") <= F.ceil(F.col("n_stratum") * frac))
        .select("doc_id", strata_col, "sample_rank", "n_stratum")
    )


# ---------------------------------------------------------------------------
# 9. token-budget sampling (greedy quality-ordered prefix per stratum)
# ---------------------------------------------------------------------------

def token_budget_sample(
    df: DataFrame,
    budget: int,
    strata_col: str = "lang",
    quality_col: str = "quality",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Within each stratum, take docs in descending quality order until the
    cumulative token count would exceed the budget (greedy prefix; the doc
    that crosses the line is excluded). The deterministic doc_id tie-break
    makes the sample reproducible.

    This is the mixture-curation step after scoring: "give me the best
    N-token slice per language/domain". One window exchange on the stratum
    key; the running sum and the filter share that partitioning.
    """
    w = (
        Window.partitionBy(strata_col)
        .orderBy(F.desc(quality_col), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("cum_tokens", F.sum(tokens_col).over(w).cast("long"))
        .where(F.col("cum_tokens") <= budget)
        .select("doc_id", strata_col, quality_col, tokens_col, "cum_tokens")
    )


# ---------------------------------------------------------------------------
# linear quality classifier (fasttext-style, integer-exact)
# ---------------------------------------------------------------------------

def classifier_weights(dim: int = 64, seed: int = 11) -> list[int]:
    """Seeded integer weight vector in micro-units (1e-6): the stand-in for
    a trained fasttext/logistic quality model's dense layer. Integer so the
    score is exact in any engine and invariant to summation order."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return [int(v) for v in rng.randint(-500_000, 500_001, size=dim)]


def quality_classifier(
    df: DataFrame,
    *,
    dim: int = 64,
    seed: int = 11,
    bias_micro: int = 25_000,
    text_col: str = "text",
    max_chars: int = 300,
) -> DataFrame:
    """fasttext-style linear quality classifier (the CCNet / GPT-3
    "looks-like-Wikipedia" filter shape): hashing-trick bag-of-words ->
    signed feature counts -> dot with a weight vector -> threshold.

    Weights live in integer micro-units and every token contributes
    ``sign * W[poly_hash(token) % dim]`` exactly, so the logit is a LONG —
    bit-identical under any partitioning, batch size, or engine (no float
    summation anywhere). The whole operator is per-row Column algebra:
    zero exchanges at any scale; the weight table is a literal (broadcast
    free). Sign trick matches hash_embedding (Weinberger et al. 2009).

    Output: (doc_id, n_tokens, logit_micro, label) — label = logit > 0.
    """
    weights = classifier_weights(dim, seed)
    warr = F.array(*[F.lit(w).cast("long") for w in weights])
    toks = _tokens(F.substring(F.col(text_col), 1, max_chars))
    hashes = F.transform(toks, lambda t: _poly_hash(t))
    contrib = F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: acc
        + F.when(h % (2 * dim) < dim, F.lit(1).cast("long"))
        .otherwise(F.lit(-1).cast("long"))
        * F.element_at(warr, (h % dim + 1).cast("int")),
    )
    logit = contrib + F.lit(bias_micro).cast("long")
    return df.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        logit.alias("logit_micro"),
        (logit > 0).alias("label"),
    )


# ---------------------------------------------------------------------------
# training-sequence packing (concat-and-chunk)
# ---------------------------------------------------------------------------

def sequence_pack(
    df: DataFrame,
    *,
    seq_len: int = 2048,
    strata_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing: within each stratum,
    documents in deterministic doc_id order are laid head-to-tail into one
    token stream, then cut into fixed ``seq_len`` windows (documents MAY
    straddle a boundary — the standard pretraining layout, vs. greedy
    no-split bin packing).

    Emits where each document lands: the sequence its first token falls in,
    the offset inside that sequence, and how many sequences it spans.
    Token count is the whitespace token count (matches `token_count`).

    Scale shape: ONE hash exchange on the stratum; the running sum is a
    window over (stratum, doc_id). In production the stratum key is
    (lang, shard) so no single stratum exceeds a task; the packing stays
    deterministic because shard assignment is hash(doc_id) — the layout
    within a shard depends only on membership, never on partitioning.
    """
    n_tok = F.size(_tokens(F.col(text_col)))
    w = (
        Window.partitionBy(strata_col)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(n_tok).over(w).cast("long")
    start = (cum - n_tok).cast("long")
    end_incl = (cum - 1).cast("long")
    seq_id = F.floor(start / seq_len).cast("long")
    last_seq = F.floor(end_incl / seq_len).cast("long")
    return df.select(
        "doc_id",
        F.col(strata_col),
        n_tok.cast("long").alias("n_tokens"),
        start.alias("start_offset"),
        seq_id.alias("seq_id"),
        (start % seq_len).cast("long").alias("offset_in_seq"),
        F.when(n_tok > 0, last_seq - seq_id + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_seqs_spanned"),
    )


def ccnet_buckets(df: DataFrame, text_col: str = "text") -> DataFrame:
    """CCNet head/middle/tail partitioning (Wenzek et al. 2020): label each
    document by its LM-fluency tercile. SCALE-SAFE shape — no global sort:

    1. per-row integer score (milli-fluency from the char-bigram LM,
       zero exchanges);
    2. groupBy on the score value — BOUNDED at 1001 distinct values, so
       the cumulative "documents strictly above this score" window runs
       over a tiny table;
    3. label broadcast-joins back on score.

    Ties share a score, hence a bucket — they can never straddle a
    boundary, so the labeling is deterministic under any partitioning:
    head iff 3*docs_above < n, middle iff 3*docs_above < 2n, else tail.

    The scored rows feed BOTH the label subquery and the probe side; they
    are persisted (16 bytes/doc — trivial at any scale) so the interpreted
    HOF bigram scoring runs once, not twice: 10.0 s -> 2.3 s at
    sf0.1/local[32].
    """
    from pyspark import StorageLevel

    scored = (
        bigram_lm_score(df, text_col=text_col)
        .select(
            "doc_id",
            F.expr("(n_known * 1000) div greatest(n_bigrams, 1)").alias(
                "score_milli"
            ),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = scored.groupBy("score_milli").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = Window.orderBy(F.desc("score_milli"))
    lab = (
        counts.withColumn(
            "above",
            F.coalesce(
                F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0).cast("long"),
            ),
        )
        .withColumn("n", F.sum("cnt").over(Window.partitionBy()))
        .select(
            "score_milli",
            F.when(F.col("above") * 3 < F.col("n"), F.lit("head"))
            .when(F.col("above") * 3 < 2 * F.col("n"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )
    return scored.join(F.broadcast(lab), "score_milli").select(
        "doc_id", "score_milli", "bucket"
    )


# ---------------------------------------------------------------------------
# 14. Gopher quality rules (Rae et al. 2021, Table A1)
# ---------------------------------------------------------------------------

#: the Gopher stop-word list (Rae et al. 2021 §A1.1): a document must
#: contain at least 2 of these as whole tokens to pass.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """The full Gopher document-quality rule set (Rae et al. 2021, Table A1)
    as per-document signals + a single ``passes`` verdict:

    - word count in ``[min_words, max_words]``
    - mean word length in ``[min_mean_len, max_mean_len]``
    - symbol-to-word ratio (``#`` + ``...``/``…`` hits per word) <= 0.1
    - fraction of (non-empty) lines starting with a bullet <= 0.9
    - fraction of lines ending with an ellipsis <= 0.3
    - >= 80% of words contain at least one alphabetic character
    - >= 2 distinct stop words present as whole tokens

    Completes the Gopher family next to :func:`text_analysis.repetition_signals`
    (the §A1.1 repetition half). Reference analog: the emission quality gates
    (/root/reference/models/ocr/base_ocr.py:679-725) are the same
    keep-or-drop shape at document granularity.

    Scale shape: a PURE per-row Column program — zero exchanges, no Python;
    at 1000 executors it is embarrassingly parallel and filters on
    ``passes`` still push down to the scan. The whitespace split is inlined
    into several signal expressions by projection collapse (same trade as
    ``repetition_signals``: recomputing a split beats materializing an
    array column through an exchange).
    """
    text = F.col(text_col)
    toks = _tokens(text)
    n_words = F.size(toks).cast("long")

    char_sum = F.aggregate(
        F.transform(toks, F.length),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long"),
    )
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_dots = F.floor(
        (F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))) / 3
    ).cast("long")
    n_uni = F.length(text) - F.length(F.replace(text, F.lit("…"), F.lit("")))
    n_symbols = (n_hash + n_dots + n_uni).cast("long")

    lines = F.filter(F.split(text, "\n"), lambda l: F.trim(l) != "")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda l: F.substring(F.ltrim(l), 1, 1).isin("-", "*", "•"),
        )
    ).cast("long")
    n_ellipsis = F.size(
        F.filter(
            lines,
            lambda l: F.rtrim(l).endswith("...") | F.rtrim(l).endswith("…"),
        )
    ).cast("long")

    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[a-zA-Z]"))).cast("long")
    stop_hits = sum(
        F.array_contains(toks, w).cast("int") for w in GOPHER_STOPWORDS
    ).cast("int")

    nz = n_words > 0
    sig = df.select(
        "doc_id",
        n_words.alias("n_words"),
        F.when(nz, F.round(char_sum / n_words, 6)).alias("mean_word_len"),
        F.when(nz, F.round(n_symbols / n_words, 6)).alias("symbol_word_ratio"),
        F.when(n_lines > 0, F.round(n_bullet / n_lines, 6)).alias(
            "bullet_line_frac"
        ),
        F.when(n_lines > 0, F.round(n_ellipsis / n_lines, 6)).alias(
            "ellipsis_line_frac"
        ),
        F.when(nz, F.round(n_alpha / n_words, 6)).alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
    )
    passes = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_len, max_mean_len)
        & (F.col("symbol_word_ratio") <= max_symbol_ratio)
        & (F.coalesce(F.col("bullet_line_frac"), F.lit(0.0)) <= max_bullet_frac)
        & (F.coalesce(F.col("ellipsis_line_frac"), F.lit(0.0)) <= max_ellipsis_frac)
        & (F.col("alpha_word_frac") >= min_alpha_frac)
        & (F.col("stop_hits") >= min_stop_hits)
    )
    return sig.withColumn("passes", F.coalesce(passes, F.lit(False)))


def soft404_flags(
    df: DataFrame,
    *,
    status_col: str = "status",
    title_col: str = "title",
    text_col: str = "text",
) -> DataFrame:
    """Flag soft 404s: pages served with HTTP 200 whose CONTENT is an
    error page ("page not found", empty shells). Hard 404s are dropped by
    the status gate; soft ones poison a corpus because every signal says
    "real page" — so the detector combines a title regex, a body regex,
    and a short-body gate (error shells are short; a long article that
    merely mentions '404' must NOT be flagged).

    Appended columns (pinned by unit tests + the closed-form oracle):
    ``title_404`` / ``body_404`` regex hits, ``short_body``
    (< 200 chars), and ``is_soft404 = status==200 AND (title_404 OR
    (body_404 AND short_body))``. Pure Column algebra — zero exchanges,
    zero Python."""
    title_hit = F.coalesce(
        F.lower(F.col(title_col)).rlike(
            r"(404|page not found|not found|page unavailable|does not exist)"
        ),
        F.lit(False),
    )
    body_hit = F.coalesce(
        F.lower(F.col(text_col)).rlike(
            r"(page (you requested )?(was |could )?not (be )?found"
            r"|no longer (exists|available)|404 error)"
        ),
        F.lit(False),
    )
    short = F.coalesce(F.length(text_col) < 200, F.lit(True))
    return df.select(
        "*",
        title_hit.alias("title_404"),
        body_hit.alias("body_404"),
        short.alias("short_body"),
        (
            (F.col(status_col) == 200) & (title_hit | (body_hit & short))
        ).alias("is_soft404"),
    )


def compression_ratio(
    df: DataFrame, *, text_col: str = "text", repetitive_below: int = 300
) -> DataFrame:
    """zlib compression-ratio quality signal (the Dolma/FineWeb-family
    "too compressible" gate): machine-generated spam, keyword stuffing
    and template loops compress far better than natural prose, so
    ``ratio_milli = 1000 * len(zlib(text)) // len(utf8(text))`` separates
    them with ONE cheap pass and no model. Deterministic: fixed zlib
    level 6, integer milli ratio; empty/NULL text -> NULL ratio (and not
    repetitive — nothing to judge).

    Appended columns: ``compress_milli`` int, ``is_repetitive`` =
    ratio < ``repetitive_below``. One Arrow-batched scalar udf, zero
    exchanges. No SQL engine exposes zlib, so the oracle is a committed
    fixture produced by this same kernel (contract.FIXTURE_ORACLES)."""
    from .pudf import compress_milli_udf

    # two projections so the udf is referenced (hence evaluated) ONCE
    return df.select(
        "*", compress_milli_udf(F.col(text_col)).alias("compress_milli")
    ).withColumn(
        "is_repetitive",
        F.coalesce(F.col("compress_milli") < repetitive_below, F.lit(False)),
    )


# --------------------------------------------------------------------------
# multi-pattern blocklist gate (Aho-Corasick)
# --------------------------------------------------------------------------

#: Literal demo blocklist (UT1/Dolma-style keyword gate) shared with the
#: DuckDB oracle — lowercase, matched over lower(text), overlaps counted.
BLOCKLIST_PATTERNS = (
    "casino", "viagra", "lottery", "jackpot", "xxx",
    "free money", "click here", "winner", "porn", "bet now",
)


def blocklist_flags(
    df: DataFrame,
    patterns: tuple[str, ...] = BLOCKLIST_PATTERNS,
    *,
    text_col: str = "text",
    max_hits: int = 0,
) -> DataFrame:
    """Keyword-blocklist gate: (doc_id, n_hits, n_patterns_hit,
    first_hit_pos, blocked).  ONE Aho-Corasick pass per document finds
    ALL occurrences of every pattern (overlaps included) — O(text +
    matches) regardless of blocklist size, vs the O(patterns x text) of
    per-pattern scans.  The automaton ships in the closure (built once
    per executor); one Arrow stage, zero exchanges.  ``first_hit_pos``
    is the 1-based START of the earliest match, the same coordinate the
    oracle's substring scan produces; blocked = n_hits > max_hits."""

    def gen(batches):
        import pandas as pd

        from ..kernels.aho import AhoCorasick

        ac = AhoCorasick(list(patterns))
        for pdf in batches:
            out = {"doc_id": [], "n_hits": [], "n_patterns_hit": [],
                   "first_hit_pos": [], "blocked": []}
            for did, text in zip(pdf["doc_id"], pdf[text_col]):
                hits = ac.find_all(str(text).lower())
                out["doc_id"].append(int(did))
                out["n_hits"].append(len(hits))
                out["n_patterns_hit"].append(len({i for _, i in hits}))
                out["first_hit_pos"].append(
                    min(p for p, _ in hits) + 1 if hits else None
                )
                out["blocked"].append(len(hits) > max_hits)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(out["doc_id"], dtype="int64"),
                    "n_hits": pd.array(out["n_hits"], dtype="int32"),
                    "n_patterns_hit": pd.array(out["n_patterns_hit"], dtype="int32"),
                    "first_hit_pos": pd.array(out["first_hit_pos"], dtype="Int32"),
                    "blocked": out["blocked"],
                }
            )

    return df.select("doc_id", text_col).mapInPandas(
        gen,
        schema="doc_id long, n_hits int, n_patterns_hit int, "
        "first_hit_pos int, blocked boolean",
    )


# --------------------------------------------------------------------------
# mojibake repair (UTF-8-as-windows-1252 damage)
# --------------------------------------------------------------------------

def mojibake_repair(
    df: DataFrame, *, text_col: str = "text", max_rounds: int = 3
) -> DataFrame:
    """Detect and repair UTF-8-as-windows-1252 mojibake (kernels/mojibake,
    the ftfy core move): (doc_id, had_mojibake, rounds, repaired).

    ``had_mojibake`` is the signature-bigram detector on the INPUT text;
    ``rounds`` counts the decode layers actually peeled (2 for
    double-mojibake); repair is refused — text passes through — unless
    the whole string round-trips to strictly valid UTF-8 with a strictly
    falling signature score. ONE Arrow stage, zero exchanges; the byte
    tables are fixed so output is bit-identical at any parallelism."""

    def gen(batches):
        import pandas as pd

        from ..kernels.mojibake import fix_mojibake, mojibake_score

        for pdf in batches:
            out = {"doc_id": [], "had_mojibake": [], "rounds": [], "repaired": []}
            for did, text in zip(pdf["doc_id"], pdf[text_col]):
                text = "" if text is None else str(text)
                fixed, rounds = fix_mojibake(text, max_rounds=max_rounds)
                out["doc_id"].append(int(did))
                out["had_mojibake"].append(mojibake_score(text) > 0)
                out["rounds"].append(rounds)
                out["repaired"].append(fixed)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(out["doc_id"], dtype="int64"),
                    "had_mojibake": out["had_mojibake"],
                    "rounds": pd.array(out["rounds"], dtype="int32"),
                    "repaired": out["repaired"],
                }
            )

    return df.select("doc_id", text_col).mapInPandas(
        gen,
        schema="doc_id long, had_mojibake boolean, rounds int, repaired string",
    )


# --------------------------------------------------------------------------
# deterministic corpus shuffle + training shards
# --------------------------------------------------------------------------

def shuffle_shards(
    df: DataFrame, *, n_shards: int = 8, seed: int = 17
) -> DataFrame:
    """The training-export tail every corpus pipeline ends with: a
    reproducible pseudo-random order, sharded for parallel data loaders.

    shard = shuffle_key % n_shards (hash sharding — balanced by
    construction, no sampled range bounds to drift between runs);
    pos_in_shard = rank by (shuffle_key, doc_id) within the shard.  The
    shuffle key is the same overflow-safe multiplicative hash as
    :func:`stratified_sample` with the seed folded in, so the permutation
    is deterministic across engines, runs, AND parallelism levels —
    rand() reshuffles differently per run and per partitioning, which
    breaks resumable training.  ONE exchange (the per-shard window);
    doc_id tie-break makes colliding keys stable."""
    key = ((F.col("doc_id") % F.lit(U31)) * F.lit(KNUTH) + F.lit(seed)) % F.lit(U32)
    shard = (key % F.lit(n_shards)).cast("int")
    w = Window.partitionBy("shard").orderBy(
        F.col("shuffle_key").asc(), F.col("doc_id").asc()
    )
    return (
        df.select("doc_id", key.alias("shuffle_key"), shard.alias("shard"))
        .withColumn("pos_in_shard", F.row_number().over(w).cast("long"))
    )


# ---------------------------------------------------------------------------
# soft-404 detection (crawl health)
# ---------------------------------------------------------------------------

def soft404_from_html(pages: DataFrame, *, thin_chars: int = 200) -> DataFrame:
    """Soft-404 detection from RAW HTML (the pre-parse sibling of
    :func:`soft404_flags`, which expects already-extracted title/text
    columns): runs where only (url, status, html) exist — i.e. straight
    off the fetcher, before any extraction stage (Bar-Yossef et al. 2004
    "Sic transit gloria telae").  Left in a corpus, soft 404s pollute
    dedup (mega-clusters of near-identical error bodies) and training
    data, so this gate can run before anything else.

    Pure per-row Column program over (url, status, html):

    - title      = first <title> text (case-insensitive tag match)
    - title_404  = title matches 404 / not found / error / does not exist
      / unavailable (case-insensitive)
    - body_404   = tag-stripped body matches page not found / does not
      exist / no longer available
    - thin       = tag-stripped whitespace-collapsed body shorter than
      ``thin_chars``
    - soft404    = status == 200 AND (title_404 OR body_404)

    Hard 404s (status != 200) are already honest — flagged false here and
    handled by status filtering. Zero exchanges, zero Python; RE2-safe
    regexes so the same patterns run in any engine."""
    html = F.col("html")
    title = F.regexp_extract(html, r"(?i)<title[^>]*>([^<]*)</title>", 1)
    body = F.regexp_replace(html, r"<[^>]+>", " ")
    squeezed = F.trim(F.regexp_replace(body, r"\s+", " "))
    title_404 = title.rlike(r"(?i)(404|not found|error|does not exist|unavailable)")
    body_404 = squeezed.rlike(
        r"(?i)(page not found|does not exist|no longer available)"
    )
    thin = F.length(squeezed) < thin_chars
    return pages.select(
        "url",
        F.col("status").cast("int").alias("status"),
        title_404.alias("title_404"),
        body_404.alias("body_404"),
        thin.alias("thin"),
        ((F.col("status") == 200) & (title_404 | body_404)).alias("soft404"),
    )
