"""Deduplication operators over the documents table.

Training-data-pipeline staples at 100 TB (driver brief): exact dedup
(hash-groupBy), n-gram-shingle Jaccard near-dup (exact, prefix-filtered),
MinHash+LSH (shingle -> minhash -> band -> bucket join), SimHash with
multi-band Hamming blocking.

All near-dup operators share one set representation: distinct word
``shingle``-grams per document (`shingle_sets`). Word *unigrams* are
useless for near-dup at web scale (tiny vocab => every doc pair shares
words => quadratic candidate sets); 3-gram shingles are high-cardinality
and bimodal — near-dups score ~1, unrelated docs ~0.

Implementation note: the set representation is a per-document ARRAY column
(`shingle_arrays`), computed once and persisted for the duration of a
dedup query; posting form (`shingle_sets`) is derived by explode where a
global view is genuinely needed (document frequencies).  Two measured
consequences (sf0.1, local[32]):
- MinHash signatures via `array_min(transform(...))` are a zero-shuffle
  narrow map — 3.2 s vs 6.2 s for the explode+groupBy(min) posting form,
  despite HOF lambdas being interpreted: dropping the signature SHUFFLE
  beats staying inside codegen.  (SimHash keeps the posting/groupBy form:
  its 64 per-bit sums would be 64 interpreted array traversals.)
- Exact verification joins candidate pairs against the doc-level arrays
  and intersects with `array_intersect` — |pairs| intermediate rows
  instead of |pairs| x |set| posting-join rows, and two doc-keyed joins
  instead of two posting joins plus a pair-key groupBy.

Shuffle inventory (the 100 TB story):
- candidate generation is the only joint-key shuffle: an equi-join on
  band/bucket/prefix-element keys that are hash-distributed by
  construction (no hot keys);
- `ngram_jaccard_pairs` is an EXACT set-similarity join made linear-ish by
  *prefix filtering* (AllPairs/PPJoin, Bayardo et al. WWW'07): two sets
  with Jaccard >= t must share at least one element among each one's
  (n - ceil(t*n) + 1) globally-rarest elements; candidates come from a
  join on those prefix elements only, then are verified exactly — results
  are identical to the naive all-pairs formulation (the DuckDB oracle runs
  the naive form; value hashes must match);
- the `sizes` join sides are (doc_id, int) projections — tiny relative to
  the corpus, broadcastable at moderate scale, plain equi-joins beyond.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Group by normalized-content fingerprint; one row per distinct content
    with the member count and canonical (min) doc_id."""
    from ..functions.text_functions import clean_text_expr

    norm = clean_text_expr("text")
    return (
        docs.select(F.col("doc_id"), F.md5(norm.cast("binary")).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


def shingle_arrays(docs: DataFrame, *, shingle: int = 3) -> DataFrame:
    """(doc_id, shs: array<string>, n: int) — each document's DISTINCT word
    ``shingle``-grams as one array row, the shared set representation of the
    near-dup family.

    Tokenization is a plain single-space split of trim(text) so the DuckDB
    oracle (string_split) sees byte-identical tokens. Docs with fewer than
    ``shingle`` tokens are dropped (empty set: they can never pair).

    array_distinct happens map-side per document — zero exchanges, vs a
    global (doc_id, sh) distinct() which shuffles every posting once before
    any consumer even starts.  n is carried here so no consumer ever needs a
    set-size aggregation or window. widen(): shingling is the heavy narrow
    stage of every dedup plan — a 1-row-group bench scan would serialize it
    on one task (no-op at real scale).
    """
    from ..plans.session import widen

    toks = F.split(F.trim(F.col("text")), " ")
    shingles = F.when(
        F.size(toks) >= shingle,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - shingle),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, shingle)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # emptiness is filtered on the CHEAP token-count predicate (>= shingle
    # tokens guarantees a non-empty distinct array), not on size(shs):
    # a filter on the array column would be pushed below the projection and
    # make the array_distinct subexpression evaluate twice per row
    return (
        widen(docs)
        .where(F.size(toks) >= shingle)
        .select("doc_id", F.array_distinct(shingles).alias("shs"))
        .withColumn("n", F.size("shs").cast("int"))
    )


def char_shingle_arrays(docs: DataFrame, *, width: int = 6) -> DataFrame:
    """(doc_id, shs, n) with DISTINCT CHARACTER ``width``-grams — the set
    representation for scripts whitespace tokenization can't segment
    (CJK, Thai, unsegmented Arabic): word shingles over such text
    degenerate to whole-line grams and near-dup recall collapses. Same
    output contract as `shingle_arrays`, so every consumer (prefix
    filtering, verification, MinHash) composes unchanged. Route with
    `text_analysis.script_mix` (dominant in {han, ...} -> char grams)."""
    from ..plans.session import widen

    n_pos = F.length("text") - width + 1
    grams = F.when(
        n_pos >= 1,
        F.transform(
            F.sequence(F.lit(1), n_pos),
            lambda i: F.col("text").substr(i, F.lit(width)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        widen(docs)
        .where(F.length("text") >= width)
        .select("doc_id", F.array_distinct(grams).alias("shs"))
        .withColumn("n", F.size("shs").cast("int"))
    )


def shingle_sets(docs: DataFrame, *, shingle: int = 3) -> DataFrame:
    """(doc_id, sh) distinct word-``shingle``-gram postings for consumers
    that need a global per-shingle view (document frequencies, SimHash bit
    sums).  NOT derived from `shingle_arrays`: its where(n > 0) filter is
    redundant after an explode (empty arrays yield no rows) but forces the
    array_distinct subexpression to evaluate twice (filter + generate),
    measured 3.7x slower on the SimHash aggregation — so the explode fuses
    directly over the shingling expression here."""
    from ..plans.session import widen

    toks = F.split(F.trim(F.col("text")), " ")
    shingles = F.when(
        F.size(toks) >= shingle,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - shingle),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, shingle)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return widen(docs).select(
        "doc_id", F.explode(F.array_distinct(shingles)).alias("sh")
    )


def _verify_pairs(cand: DataFrame, sets: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard verification of candidate (doc_a, doc_b) pairs against
    the doc-level shingle arrays: two doc-keyed equi-joins + array_intersect,
    so the intermediate is |pairs| rows (vs |pairs| x |set| for a posting
    join) and there is no pair-key groupBy at all."""
    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shs").alias("shs_a"),
        F.col("n").alias("na"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shs").alias("shs_b"),
        F.col("n").alias("nb"),
    )
    shared = F.size(F.array_intersect("shs_a", "shs_b")).cast("long")
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(shared / (F.col("na") + F.col("nb") - shared), 6).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    threshold: float = 0.5,
    shingle: int = 3,
    prefix_filter: bool = True,
    hot_df_threshold: int | None = None,
    cache: bool = True,
    unit: str = "word",
) -> DataFrame:
    """EXACT n-gram-shingle Jaccard near-dup pairs: every (doc_a, doc_b,
    jaccard) with doc_a < doc_b and Jaccard >= threshold.

    prefix_filter=True (default) applies AllPairs prefix filtering: order
    shingles globally by (document frequency, shingle); a doc of n shingles
    only indexes its first (n - ceil(t*n) + 1) rarest ones; any pair with
    Jaccard >= t must collide on a prefix element, so the candidate join
    touches a small fraction of the postings while losing nothing.  A
    size-ratio prune (t*na <= nb <= na/t, implied by Jaccard >= t) drops
    impossible candidates before verification.

    hot_df_threshold: the df-attach join's skew guard.  None (default)
    relies on AQE skew-join splitting the Zipfian hot keys — measured 2x
    faster end-to-end at sf0.1/local[32] (6.7 s vs 12.8 s) because at that
    scale the hot head is EMPTY and the split's broadcast subquery + anti
    probe + per-key window are pure overhead.  Set an int for corpora with
    known pathological stop-shingles: the hot HEAD (few distinct shingles)
    broadcast-joins so postings never shuffle on a hot key, and the cold
    tail's per-key window has < threshold rows per key by construction.

    cache=True persists the doc-level shingle arrays (MEMORY_AND_DISK) for
    the three passes that read them (df ranking, prefix index, verify) —
    the standard materialized-index shape of AllPairs/PPJoin; spills to
    disk at scale, recomputed on executor loss. Caller may unpersist via
    spark.catalog.clearCache() after the action.

    unit="word" (default) shingles whitespace tokens; unit="char" uses
    CHARACTER ``shingle``-grams (`char_shingle_arrays`) for scripts
    whitespace can't segment — everything downstream (prefix filter,
    size prune, verify) is representation-agnostic and unchanged.

    The DuckDB oracle runs the naive all-pairs form — identical output.
    """
    if unit == "char":
        sets = char_shingle_arrays(docs, width=shingle)
    else:
        sets = shingle_arrays(docs, shingle=shingle)
    if cache:
        from pyspark import StorageLevel

        sets = sets.persist(StorageLevel.MEMORY_AND_DISK)
    sh = sets.select("doc_id", F.explode("shs").alias("sh"), "n")

    if prefix_filter:
        dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
        # Attaching df to every posting is the one skew-sensitive exchange
        # in the dedup family (shingle frequencies are Zipfian; VERDICT
        # r01).  The dfreq aggregation itself is safe: map-side partial agg
        # caps any reducer's rows per key at the partition count.
        if hot_df_threshold is not None:
            hot = dfreq.where(F.col("df") >= hot_df_threshold)
            bhot = F.broadcast(hot)
            # identical broadcast subplan for the inner join and the anti
            # probe -> ReusedExchange: the dfreq aggregation runs once.
            # Cold-side df needs no second global aggregation: a cold
            # shingle has NO hot row, so ALL its postings are in the anti
            # subset and a window count there equals the global df exactly.
            cold_post = sh.join(bhot, "sh", "left_anti").withColumn(
                "df", F.count(F.lit(1)).over(Window.partitionBy("sh"))
            )
            with_df = sh.join(bhot, "sh").select(
                "doc_id", "sh", "n", "df"
            ).unionByName(cold_post.select("doc_id", "sh", "n", "df"))
        else:
            with_df = sh.join(dfreq, "sh")
        # n rides along from shingle_arrays — the rank is the only window
        ranked = with_df.withColumn(
            "rk", F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "sh"))
        )
        # prefix length: n - ceil(t*n) + 1. The 1e-9 slack keeps binary-FP
        # threshold products (0.8*5 -> 4.0000000000000004) from rounding the
        # prefix SHORTER than the recall-safe bound.
        index = ranked.where(
            F.col("rk")
            <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n") - F.lit(1e-9)) + 1
        ).select("doc_id", "sh", "n")
    else:
        index = sh

    a = index.select(F.col("doc_id").alias("doc_a"), "sh", F.col("n").alias("na"))
    b = index.select(F.col("doc_id").alias("doc_b"), "sh", F.col("n").alias("nb"))
    cand = (
        a.join(b, "sh")
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            # size-ratio prune, implied by Jaccard >= t: t*na <= nb <= na/t.
            # 1e-9 slack so pairs sitting exactly ON the bound survive binary
            # FP (4 >= 0.8*5 must hold); exactness is decided by the final
            # jaccard >= threshold filter, the prune only needs recall.
            & (F.col("nb") >= F.lit(threshold) * F.col("na") - F.lit(1e-9))
            & (F.col("nb") <= F.col("na") / F.lit(threshold) + F.lit(1e-9))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _verify_pairs(cand, sets, threshold)


def containment_pairs(
    docs: DataFrame,
    *,
    threshold: float = 0.7,
    shingle: int = 3,
    cache: bool = True,
) -> DataFrame:
    """EXACT asymmetric set-CONTAINMENT pairs: every (doc_a, doc_b,
    containment) with doc_a != doc_b and
    ``containment = |S_a ∩ S_b| / |S_a| >= threshold`` — "a is (mostly)
    contained in b", the quote-page / wrapper-page / syndicated-excerpt
    detector that symmetric Jaccard misses by construction (a 30-word
    quote inside a 500-word article has Jaccard ~0.06 but containment
    ~1.0).

    Probe-side prefix filtering: |S_a ∩ S_b| >= ceil(t*n_a) means S_a
    cannot miss B on ALL of its first (n_a - ceil(t*n_a) + 1) rarest
    shingles (rank by global document frequency, rarest first — any
    global order is recall-safe; rarest-first minimizes join fan-out).
    Only the PROBE side prunes: containment puts no constraint on where
    A's shingles sit inside B, so the index side carries its full
    posting list — one corpus-postings exchange, the same price the
    df-attach join already pays (Zipf-headed keys on the index side
    meet a rare-biased probe side, so hot keys produce ~no output and
    AQE splits what remains). Size prune: n_b >= t*n_a (the
    intersection can't exceed n_b); no upper bound exists — that
    asymmetry IS the operator.

    Verification is exact per candidate pair via the doc-level arrays
    (array_intersect), same shape as `_verify_pairs`. The DuckDB oracle
    runs the naive all-pairs form — identical output."""
    sets = shingle_arrays(docs, shingle=shingle)
    if cache:
        from pyspark import StorageLevel

        sets = sets.persist(StorageLevel.MEMORY_AND_DISK)
    sh = sets.select("doc_id", F.explode("shs").alias("sh"), "n")

    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    ranked = sh.join(dfreq, "sh").withColumn(
        "rk", F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "sh"))
    )
    probe = ranked.where(
        F.col("rk")
        <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n") - F.lit(1e-9)) + 1
    ).select(F.col("doc_id").alias("doc_a"), "sh", F.col("n").alias("na"))
    index = sh.select(F.col("doc_id").alias("doc_b"), "sh", F.col("n").alias("nb"))
    cand = (
        probe.join(index, "sh")
        .where(
            (F.col("doc_a") != F.col("doc_b"))
            & (F.col("nb") >= F.lit(threshold) * F.col("na") - F.lit(1e-9))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shs").alias("shs_a"),
        F.col("n").alias("na"),
    )
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"))
    shared = F.size(F.array_intersect("shs_a", "shs_b")).cast("long")
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(shared / F.col("na"), 6).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


def cross_corpus_jaccard_dedup(
    new_docs: DataFrame,
    old_docs: DataFrame,
    *,
    threshold: float = 0.5,
    shingle: int = 3,
) -> DataFrame:
    """Incremental-ingestion near-dup gate: keep only the rows of
    ``new_docs`` whose EXACT n-gram-shingle Jaccard against every document
    of the existing corpus (``old_docs``) is below ``threshold``.

    The 100 TB shape is the R-S variant of the AllPairs prefix join: the
    new increment (small) and the existing corpus (huge) each index only
    their prefix shingles under a global (df, shingle) order computed over
    the UNION of both posting sets — the prefix theorem needs one
    consistent total order across the two relations.  Candidates come from
    the prefix equi-join new x old (never old x old: the quadratic
    within-corpus work is skipped entirely), are size-ratio pruned, then
    verified exactly against the doc-level arrays.  Matched new ids leave
    by broadcast-friendly anti-join.  Existing-corpus deployments would
    store `shingle_arrays(old)` + its df table as maintained tables and
    skip their recompute per increment.

    Column contract: both inputs carry (doc_id, text ...); doc_id spaces
    may overlap (sides are tracked independently). Returns new_docs rows
    that survive, unchanged schema.
    """
    sets_new = shingle_arrays(new_docs, shingle=shingle)
    sets_old = shingle_arrays(old_docs, shingle=shingle)
    from pyspark import StorageLevel

    sets_new = sets_new.persist(StorageLevel.MEMORY_AND_DISK)
    sets_old = sets_old.persist(StorageLevel.MEMORY_AND_DISK)

    post_new = sets_new.select("doc_id", F.explode("shs").alias("sh"), "n")
    post_old = sets_old.select("doc_id", F.explode("shs").alias("sh"), "n")
    # ONE global order over the union; map-side partial agg, AQE skew-join
    # on the attach (same rationale as ngram_jaccard_pairs)
    dfreq = (
        post_new.select("sh")
        .unionByName(post_old.select("sh"))
        .groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
    )

    def prefix_index(post):
        ranked = post.join(dfreq, "sh").withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "sh")),
        )
        return ranked.where(
            F.col("rk")
            <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n") - F.lit(1e-9)) + 1
        ).select("doc_id", "sh", "n")

    a = prefix_index(post_new).select(
        F.col("doc_id").alias("doc_a"), "sh", F.col("n").alias("na")
    )
    b = prefix_index(post_old).select(
        F.col("doc_id").alias("doc_b"), "sh", F.col("n").alias("nb")
    )
    cand = (
        a.join(b, "sh")
        .where(
            (F.col("nb") >= F.lit(threshold) * F.col("na") - F.lit(1e-9))
            & (F.col("nb") <= F.col("na") / F.lit(threshold) + F.lit(1e-9))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sets_new.select(
        F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"), F.col("n").alias("na")
    )
    sb = sets_old.select(
        F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"), F.col("n").alias("nb")
    )
    shared = F.size(F.array_intersect("shs_a", "shs_b")).cast("long")
    matched = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        # round-6 then compare, the family convention — the oracle SQL uses
        # the same rounding so the boundary decision is bit-identical
        .where(
            F.round(shared / (F.col("na") + F.col("nb") - shared), 6)
            >= F.lit(threshold)
        )
        .select(F.col("doc_a").alias("doc_id"))
        .distinct()
    )
    return new_docs.join(matched, "doc_id", "left_anti")


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    num_hashes: int = 32,
    bands: int = 8,
    shingle: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH candidate pairs, verified with exact shingle Jaccard.

    shingle (word n-gram) -> per-seed min(xxhash64) signature -> band hash ->
    same-bucket candidates -> exact verify against the SAME shingle sets the
    signature was built from. The band groupBy is the only big shuffle;
    buckets are hash-distributed so no hot keys.
    Not SQL-portable (xxhash64 is Spark-specific) -> rows-only oracle.
    """
    rows_per_band = num_hashes // bands
    sets = shingle_arrays(docs, shingle=shingle)
    from pyspark import StorageLevel

    sets = sets.persist(StorageLevel.MEMORY_AND_DISK)

    # Signatures as a NARROW map over the doc-level array: min(xxhash64) per
    # seed via array_min(transform) — no groupBy, so signature computation
    # has ZERO shuffle (measured 3.2 s vs 6.2 s for explode+groupBy(min) at
    # sf0.1/local[32], identical values). The seed must be bound through a
    # 1-arg closure: a 2-parameter lambda would be read by PySpark as an
    # (element, index) HOF and silently hash with the array index.
    def _minhash(seed: int):
        return F.array_min(
            F.transform("shs", lambda x: F.xxhash64(x, F.lit(seed)))
        )

    mins = sets.select(
        "doc_id", *[_minhash(seed).alias(f"h{seed}") for seed in range(num_hashes)]
    )
    bucketed = mins.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        F.lit(b),
                        *[
                            F.col(f"h{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    ).alias("sig"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig"))

    cand = (
        bucketed.alias("x")
        .join(bucketed.alias("y"), ["band", "sig"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return _verify_pairs(cand, sets, jaccard_threshold)


def simhash(docs: DataFrame, *, bits: int = 64, shingle: int = 3) -> DataFrame:
    """64-bit SimHash over shingle hashes: sign-sum of per-bit contributions.

    Pure Column algebra: shingle postings -> xxhash64 -> per-bit +1/-1 ->
    sum -> sign bits reassembled; every aggregate is codegen'd with
    map-side partial agg. Shingles (not unigrams) so signatures of
    unrelated docs are far apart. Not SQL-portable -> rows-only oracle.
    """
    h = shingle_sets(docs, shingle=shingle).select(
        "doc_id", F.xxhash64("sh").alias("h")
    )
    bit_sums = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    bit_terms = [
        F.when(F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
            F.lit(0).cast("long")
        )
        for b in range(bits)
    ]
    acc = bit_terms[0]
    for term in bit_terms[1:]:
        acc = acc.bitwiseOR(term)
    return bit_sums.select("doc_id", acc.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame, *, max_hamming: int = 3, n_blocks: int = 4, shingle: int = 3
) -> DataFrame:
    """SimHash near-dup pairs via multi-band Hamming blocking (the web-crawl
    dedup scheme of Manku et al., WWW'07): split the 64-bit signature into
    ``n_blocks`` bands; by pigeonhole, any pair with Hamming distance
    <= n_blocks - 1 agrees exactly on at least one band, so blocking on each
    band and unioning candidates has PERFECT recall for
    max_hamming < n_blocks.  Verification is bit_count(xor) <= max_hamming.
    """
    # no persist here: the band self-join's two sides are the identical
    # subplan, so ReuseExchange already runs the 64-sum aggregation once —
    # persisting was measured 4x SLOWER (it blocks the reuse and inserts an
    # InMemoryTableScan between codegen stages)
    sig = simhash(docs, shingle=shingle)
    return hamming_near_pairs(
        sig, sig_col="simhash", max_hamming=max_hamming, n_blocks=n_blocks
    )


def hamming_near_pairs(
    sig: DataFrame,
    *,
    sig_col: str,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_blocks: int = 4,
) -> DataFrame:
    """Generic Manku-style multi-band Hamming blocking over ANY 64-bit
    signature column (simhash, image dhash, audio fingerprint): band
    equi-join candidates + exact bit_count(xor) verify.  Perfect recall
    for max_hamming < n_blocks by pigeonhole.  Returns
    (doc_a, doc_b, hamming), doc_a < doc_b, distinct."""
    assert max_hamming < n_blocks, "recall guarantee needs max_hamming < n_blocks"
    width = 64 // n_blocks
    blocked = sig.select(
        F.col(id_col).alias("_id"),
        F.col(sig_col).alias("_sig"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(sig_col, b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("key"),
                )
                for b in range(n_blocks)
            ])
        ).alias("bk"),
    ).select("_id", "_sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = blocked.select(
        F.col("_id").alias("doc_a"), F.col("_sig").alias("sig_a"), "band", "key"
    )
    b = blocked.select(
        F.col("_id").alias("doc_b"), F.col("_sig").alias("sig_b"), "band", "key"
    )
    return (
        a.join(b, ["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def dedup_clusters(pairs: DataFrame, *, max_iters: int = 25) -> DataFrame:
    """Near-dup pair list -> duplicate CLUSTERS via min-label propagation
    with pointer jumping (distributed connected components): every doc
    adopts the smallest doc_id reachable through the pair graph; the
    smallest member is the cluster's canonical document.

    Each round does (a) a one-hop neighbor min and (b) a label-shortcut
    join (label := label(label)) — the pointer-jumping step that gives
    O(log(diameter)) convergence even for chain-shaped clusters.  The
    input edge set is localCheckpoint()ed once so the (possibly
    expensive) upstream pair computation runs exactly once, and labels
    are checkpointed per round so plans stay bounded.  Raises if the
    graph has not converged within ``max_iters`` — silent almost-clusters
    would leak duplicates into training data.

    NOTE: executes eagerly (iterative algorithm), unlike the lazy
    relational operators. Input: (doc_a, doc_b [, ...]) with doc_a <
    doc_b. Output: (doc_id, cluster_id) for every doc with >= 1 dup.
    """
    edges = pairs.select("doc_a", "doc_b").distinct().localCheckpoint()
    # undirected adjacency
    adj = edges.unionByName(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).localCheckpoint()
    labels = (
        adj.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint()
    )
    # the label table is one row per doc with a dup: bound the round
    # shuffles by that cardinality (see iteration_shuffle) — the count is
    # a scan of the checkpoint just built
    from ..plans.session import iteration_shuffle

    with iteration_shuffle(pairs.sparkSession, labels.count()) as it:
        labels = _propagate_labels(it.bind(adj), it.bind(labels), max_iters)
    return labels


def _propagate_labels(adj: DataFrame, labels: DataFrame, max_iters: int) -> DataFrame:
    for _ in range(max_iters):
        # (a) one-hop: min over neighbors' labels and own label
        neighbor_labels = adj.join(
            labels, adj["doc_b"] == labels["doc_id"]
        ).select(F.col("doc_a").alias("doc_id"), "cluster_id")
        hop = (
            labels.unionByName(neighbor_labels)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
        )
        # (b) pointer jumping: label := label(label) where the label itself
        # has a (smaller) label
        parent = hop.select(
            F.col("doc_id").alias("cluster_id"),
            F.col("cluster_id").alias("grand_id"),
        )
        # convergence detection folds INTO the label pass (VERDICT r01 item
        # 6): the old label rides along the same join, the ``changed`` flag
        # is a column of the checkpointed frame, so each round runs ONE
        # materializing job; the flag probe below only scans the checkpoint.
        new_labels = (
            hop.join(parent, "cluster_id", "left")
            .join(labels.withColumnRenamed("cluster_id", "old_cluster_id"), "doc_id")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce("grand_id", "cluster_id")
                ).alias("cluster_id"),
                (
                    F.least(F.col("cluster_id"), F.coalesce("grand_id", "cluster_id"))
                    != F.col("old_cluster_id")
                ).alias("changed"),
            )
            .localCheckpoint()
        )
        changed = new_labels.where("changed").limit(1).count()
        labels = new_labels.drop("changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"dedup_clusters did not converge in {max_iters} rounds — "
        "component diameter too large; raise max_iters"
    )


def line_boilerplate_dedup(
    docs: DataFrame,
    *,
    min_df: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document LINE dedup (the CCNet/RefinedWeb boilerplate pass):
    a line whose normalized form appears in >= ``min_df`` distinct
    documents is boilerplate (cookie banners, nav footers, share bars) and
    is dropped from every document; remaining lines reassemble in their
    original order.

    Plan shape at 100 TB: posexplode -> one groupBy on the normalized
    line (map-side partial agg; the distinct-doc count uses the
    (norm, doc_id) pre-aggregate so no count-distinct shuffle of raw
    postings) -> left_anti join of lines against the high-df tail -> one
    groupBy(doc) reassembly. The df table is Zipf-headed, but the join key
    carries only lines ALREADY reduced to distinct norms, and the anti
    join's build side is the (small) boilerplate tail — the same
    hot-head/broadcast stance as ngram_jaccard_pairs.

    Output: (doc_id, clean_text, n_kept, n_removed) — empty/whitespace
    lines are never counted as boilerplate and are always kept.
    """
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("norm", F.trim(F.lower(F.col("line"))))

    # distinct-per-doc first (map-side combine), then the df count — two
    # partial-agg friendly groupBys instead of one countDistinct shuffle
    dfreq = (
        lines.where(F.length("norm") > 0)
        .select("norm", "doc_id")
        .distinct()
        .groupBy("norm")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    boiler = F.broadcast(
        dfreq.where(F.col("df") >= F.lit(min_df))
        .select("norm")
        .withColumn("_boiler", F.lit(True))
    )

    # left join + flag (not left_anti): a document whose EVERY line is
    # boilerplate must still emit a row (empty clean_text), and the
    # removed-count needs the dropped lines
    kept = lines.join(boiler, "norm", "left").withColumn(
        "keep", F.col("_boiler").isNull()
    )

    # collect_list skips the NULL structs of dropped lines; array_sort on
    # (pos, line) structs restores document order before the join
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.sum(F.col("keep").cast("int")).cast("long").alias("n_kept"),
        F.sum((~F.col("keep")).cast("int")).cast("long").alias("n_removed"),
    )


def dedup_keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    quality_col: str = "n_chars",
) -> DataFrame:
    """Near-dup RETENTION policy: collapse duplicate clusters to their
    best member. Every production dedup pass ends here — finding pairs
    is half the job; deciding which copy enters the training corpus is
    the other half (RefinedWeb/Dolma keep one canonical document per
    cluster rather than dropping all copies).

    ``pairs`` is any near-dup pair list (doc_a, doc_b) — exact Jaccard,
    MinHash, SimHash — and ``docs`` must carry ``quality_col``. Per
    cluster the kept document is argmax(quality, tie -> min doc_id);
    docs in no pair are singleton clusters and always kept.

    Output: (doc_id, cluster_id, keep) for EVERY input doc, cluster_id =
    smallest member doc_id.

    Scale shape: clusters come from :func:`dedup_clusters` (log-diameter
    label propagation over the pair list only — dup docs, a small
    fraction of the corpus). The full-corpus work is one left join on
    doc_id (the cluster side is the small one; AQE broadcasts it when it
    fits) plus one window exchange on cluster_id whose partitions are
    cluster-sized — singletons are unique keys, so no hot partitions."""
    clusters = dedup_clusters(pairs)
    member = (
        docs.select("doc_id", F.col(quality_col).alias("_q"))
        .join(clusters, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col("doc_id")))
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("_q"), F.asc("doc_id"))
    return member.select(
        "doc_id",
        "cluster_id",
        (F.row_number().over(w) == 1).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson, Aiken, SIGMOD 2003 — MOSS)
# ---------------------------------------------------------------------------

#: second-level multiplier for hashing a k-gram from its token hashes
#: (distinct from the per-token POLY_MULT=31 so "a b" and "ab" differ)
GRAM_MULT = 37


def winnow_fingerprints(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, §4 — the
    MOSS algorithm): token k-gram hashes -> in each sliding window of
    ``w`` consecutive hashes keep the minimum, rightmost occurrence on
    ties -> distinct (pos, fp) pairs per document.

    Guarantee (the paper's correctness property): any shared substring of
    at least ``w + k - 1`` tokens between two documents yields at least
    one shared fingerprint *value*, and density is bounded (~2/(w+1) of
    all gram hashes are selected) — local fingerprinting, unlike MinHash,
    so it also localizes WHERE the overlap is (``pos`` = gram index).

    Scale shape: pure Column algebra over per-document arrays — ONE
    narrow projection, zero shuffles, zero Python.  Hashes are the
    portable polynomial fold (corpus_filters._poly_hash) composed with a
    second-level fold over the k token hashes (O(k) per gram, not
    O(k * chars)), so the DuckDB oracle re-derives values exactly.

    Output: (id_col, pos:int, fp:long) — documents shorter than
    ``w + k - 1`` tokens emit no rows (no window exists).
    """
    from .corpus_filters import POLY_MOD, _poly_hash, _tokens

    th = F.transform(_tokens(F.col(text_col)), lambda t: _poly_hash(t))
    d = df.select(F.col(id_col), th.alias("_th"))

    d = d.select(
        id_col,
        F.when(
            F.size("_th") >= k,
            F.transform(
                F.sequence(F.lit(0), F.size("_th") - k),
                lambda i: F.aggregate(
                    F.slice(F.col("_th"), i + 1, k),
                    F.lit(0).cast("long"),
                    lambda a, x: (a * F.lit(GRAM_MULT) + x) % F.lit(POLY_MOD),
                ),
            ),
        )
        .otherwise(F.array().cast("array<long>"))
        .alias("_gh"),
    )

    def _win(i):
        mn = F.array_min(F.slice(F.col("_gh"), i + 1, w))
        pos = F.array_max(
            F.filter(
                F.sequence(i, i + w - 1),
                lambda j: F.element_at(F.col("_gh"), j + 1) == mn,
            )
        )
        return F.struct(pos.cast("int").alias("pos"), mn.alias("fp"))

    sel = F.when(
        F.size("_gh") >= w,
        F.array_distinct(
            F.transform(F.sequence(F.lit(0), F.size("_gh") - w), _win)
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,fp:long>>"))
    return d.select(id_col, F.explode(sel).alias("_s")).select(
        id_col, F.col("_s.pos").alias("pos"), F.col("_s.fp").alias("fp")
    )


def winnow_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
) -> DataFrame:
    """Document-overlap candidate pairs from shared winnowing
    fingerprints — the MOSS pairing step as a posting-list self-join.

    Fingerprint *values* appearing in more than ``max_df`` documents are
    dropped before the join (stop-fingerprints — boilerplate fragments;
    the exact analogue of stop-shingle capping in prefix-filtered
    Jaccard), so the self-join key distribution is bounded: every
    surviving posting list has <= max_df entries => <= max_df^2 pair
    rows per key, no hot keys at any corpus size.  Pairs sharing >=
    ``min_shared`` distinct fingerprint values are emitted.

    Output: (doc_a, doc_b, shared:long), doc_a < doc_b.
    """
    fps = (
        winnow_fingerprints(df, text_col=text_col, id_col=id_col, k=k, w=w)
        .select(F.col(id_col).alias("doc"), "fp")
        .distinct()
    )
    good = (
        fps.groupBy("fp")
        .agg(F.count("*").alias("_df"))
        .where((F.col("_df") >= 2) & (F.col("_df") <= max_df))
        .select("fp")
    )
    post = fps.join(good, "fp")
    a = post.select(F.col("doc").alias("doc_a"), "fp")
    b = post.select(F.col("doc").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )


def host_template_strip(
    docs: DataFrame,
    *,
    pct: int = 60,
    min_df: int = 3,
    id_col: str = "doc_id",
    host_col: str = "host",
    text_col: str = "text",
) -> DataFrame:
    """SITE-scoped template removal — the complement of the corpus-wide
    :func:`line_boilerplate_dedup`: a normalized line is a site template
    when it appears on >= ``pct`` percent of its OWN host's pages (and on
    >= ``min_df`` pages, so tiny hosts don't strip everything). Nav bars,
    per-site footers and cookie banners are host-local: a corpus-wide df
    threshold misses a 40-page site's menu, while a host-local fraction
    catches it without a magic absolute count. This is the classic
    site-level boilerplate pass crawl pipelines run ON TOP of per-page
    DOM heuristics (the reference's per-page segmentation,
    html_extract.py, cannot see cross-page repetition at all).

    Integer-exact threshold: ``df * 100 >= pct * n_pages`` — no float
    fraction. Plan shape at 100 TB: every aggregation and join keys on
    (host[, norm]) — the natural crawl partitioning — with map-side
    partial aggs; per-host page counts are a bounded second aggregate of
    the SAME distinct pre-aggregate, so raw postings shuffle once.
    Mega-host skew rides the same salting/AQE story as the extraction
    job itself.

    Output: (doc_id, host, clean_text, n_kept, n_removed), document line
    order preserved; empty/whitespace lines are always kept.
    """
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("norm", F.trim(F.lower(F.col("line"))))

    # one distinct pre-aggregate feeds BOTH the per-(host, line) df and
    # the per-host page count — no countDistinct shuffle of raw postings
    post = (
        lines.where(F.length("norm") > 0)
        .select("host", "norm", "doc_id")
        .distinct()
    )
    dfreq = post.groupBy("host", "norm").agg(F.count(F.lit(1)).alias("df"))
    npages = (
        post.select("host", "doc_id")
        .distinct()
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )
    templates = (
        dfreq.join(npages, "host")
        .where(
            (F.col("df") >= F.lit(min_df))
            & (F.col("df") * 100 >= F.lit(pct) * F.col("n_pages"))
        )
        .select("host", "norm")
        .withColumn("_tpl", F.lit(True))
    )

    kept = lines.join(templates, ["host", "norm"], "left").withColumn(
        "keep", F.col("_tpl").isNull()
    )
    return kept.groupBy("doc_id", "host").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(F.col("keep"), F.struct("pos", "line")))
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.sum((~F.col("keep")).cast("long")).alias("n_removed"),
    )
