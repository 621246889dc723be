"""Deduplication operators over the documents table.

Training-data-pipeline staples at 100 TB (driver brief): exact dedup
(hash-groupBy), n-gram/word-set Jaccard near-dup (relational, blocked),
MinHash+LSH (shingle -> minhash -> band -> bucket join), SimHash.

Scale notes:
- exact dedup is a single hash aggregation with map-side partial agg.
- the Jaccard pair join is BLOCKED (same length bucket) so the self-join
  never goes quadratic in the corpus; at 100 TB the block key would also
  include a minhash band — that composition is exactly `minhash_lsh_pairs`.
- minhash/simhash use xxhash64 (JVM-side, codegen); the only shuffle is the
  groupBy on band buckets, keyed evenly by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Group by normalized-content fingerprint; one row per distinct content
    with the member count and canonical (min) doc_id."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return (
        docs.select(F.col("doc_id"), F.md5(norm.cast("binary")).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


def _word_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, word) distinct pairs — the relational word-set encoding."""
    return (
        docs.select("doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("word"))
        .where(F.col("word") != "")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, *, threshold: float = 0.5, block_bucket: int = 64
) -> DataFrame:
    """Word-set Jaccard near-dup pairs, fully relational (oracle-checkable).

    Blocking: candidate pairs must share a word AND sit in the same
    n_chars//block_bucket length bucket — |len(a)-len(b)| large implies low
    Jaccard, so the block loses no pairs above a sane threshold while
    keeping the join linear-ish. Output: (doc_a, doc_b, jaccard).
    """
    words = _word_sets(docs)
    sizes = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_words"))
    bucket = docs.select(
        "doc_id", (F.length("text") / block_bucket).cast("int").alias("bucket")
    )
    w = words.join(bucket, "doc_id")

    a = w.select(
        F.col("doc_id").alias("doc_a"), F.col("word"), F.col("bucket")
    )
    b = w.select(
        F.col("doc_id").alias("doc_b"), F.col("word"), F.col("bucket")
    )
    shared = (
        a.join(b, ["word", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_words").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_words").alias("nb"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    num_hashes: int = 32,
    bands: int = 8,
    shingle: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH candidate pairs, verified with exact word-set Jaccard.

    shingle (word n-gram) -> per-seed min(xxhash64) signature -> band hash ->
    same-bucket candidates -> exact verify. The band groupBy is the only big
    shuffle; buckets are hash-distributed so no hot keys.
    Not SQL-portable (xxhash64 is Spark-specific) -> rows-only oracle.
    """
    rows_per_band = num_hashes // bands
    tokens = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), " ").alias("toks")
    )
    shingles = tokens.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - shingle),
                lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i + 1, shingle)),
            )
        ).alias("sh"),
    ).distinct()

    mins = shingles.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.col("sh"), F.lit(seed))).alias(f"h{seed}")
            for seed in range(num_hashes)
        ]
    )
    band_cols = [
        F.xxhash64(
            F.lit(b), *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = mins.select("doc_id", *band_cols)

    bucketed = banded.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("sig"))
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig"))

    cand = (
        bucketed.alias("x")
        .join(bucketed.alias("y"), ["band", "sig"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )

    # exact verify of candidates only
    words = _word_sets(docs)
    sizes = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_words"))
    wa = words.select(F.col("doc_id").alias("doc_a"), "word")
    wb = words.select(F.col("doc_id").alias("doc_b"), "word")
    shared = (
        cand.join(wa, "doc_a").join(wb, ["doc_b", "word"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_words").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_words").alias("nb"))
    return (
        shared.join(sa, "doc_a").join(sb, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
    )


def simhash(docs: DataFrame, *, bits: int = 64) -> DataFrame:
    """64-bit SimHash over word hashes: sign-sum of per-bit contributions.

    Pure Column algebra: explode words -> xxhash64 -> per-bit +1/-1 -> sum ->
    sign bits reassembled. Not SQL-portable -> rows-only oracle.
    """
    words = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("word")
    ).where(F.col("word") != "")
    h = words.select("doc_id", F.xxhash64("word").alias("h"))
    bit_sums = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
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


def simhash_near_pairs(docs: DataFrame, *, max_hamming: int = 3, prefix_bits: int = 16) -> DataFrame:
    """SimHash near-dup candidates: block on the top ``prefix_bits`` of the
    signature, verify Hamming distance via bit_count(xor)."""
    sig = simhash(docs)
    blocked = sig.select("doc_id", "simhash", F.shiftright("simhash", 64 - prefix_bits).alias("blk"))
    a = blocked.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"), "blk")
    b = blocked.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"), "blk")
    return (
        a.join(b, "blk")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )
