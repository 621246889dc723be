"""Asymmetric set-containment pairs: the quote-inside-article case
Jaccard misses, exactness vs a python brute force (probe-prefix filter
loses nothing), and the asymmetry itself."""

from pyspark.sql import functions as F

from ocr_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs


ARTICLE = (
    "the committee met on tuesday to review the annual budget and after "
    "a long discussion about infrastructure spending the members voted "
    "to approve the proposal with minor amendments to the transit plan "
    "and a final report will be published next month for public comment"
)
QUOTE = "the members voted to approve the proposal with minor amendments"


def _docs(spark):
    rows = [
        (1, ARTICLE),
        (2, "completely different text about gardening tips for growing "
            "tomatoes in raised beds during a dry summer season"),
        (3, QUOTE + " a reader wrote"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _shingles(text, n=3):
    t = text.strip().split(" ")
    return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}


def test_quote_found_by_containment_not_jaccard(spark):
    docs = _docs(spark)
    cont = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(docs, threshold=0.7).collect()
    }
    assert (3, 1) in cont  # the quote page is contained in the article
    assert (1, 3) not in cont  # ...but not vice versa: asymmetry
    jac = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.7).collect()
    }
    assert (3, 1) not in jac and (1, 3) not in jac  # Jaccard misses it


def test_exact_vs_brute_force(spark):
    # vocab small enough to create incidental overlaps; brute force in
    # python is the ground truth the prefix filter must reproduce
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = {}
    for did in range(20):
        words = [vocab[(did * 7 + i * i) % len(vocab)] for i in range(12)]
        texts[did] = " ".join(words)
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    t = 0.6
    expect = {}
    for a, ta in texts.items():
        for b, tb in texts.items():
            if a == b:
                continue
            sa, sb = _shingles(ta), _shingles(tb)
            if not sa:
                continue
            c = round(len(sa & sb) / len(sa), 6)
            if c >= t:
                expect[(a, b)] = c
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(docs, threshold=t).collect()
    }
    assert got == expect


def test_identical_docs_contain_each_other(spark):
    docs = spark.createDataFrame(
        [(1, ARTICLE), (2, ARTICLE)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(docs, threshold=0.9).collect()
    }
    assert got == {(1, 2): 1.0, (2, 1): 1.0}


def test_probe_prefix_is_strictly_smaller(spark):
    # the probe side indexes only each doc's (n - ceil(t*n) + 1) rarest
    # shingles — the recall-safe bound that keeps the candidate join off
    # the full posting cross product
    from pyspark.sql import Window

    from ocr_spark.contract import _t
    from ocr_spark.operators.dedup import shingle_sets

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    sh = shingle_sets(docs)
    full = sh.count()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        sh.join(dfreq, "sh")
        .withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "sh")),
        )
        .join(sizes, "doc_id")
    )
    t = 0.7
    probe = ranked.where(
        F.col("rk") <= F.col("n") - F.ceil(F.lit(t) * F.col("n") - F.lit(1e-9)) + 1
    ).count()
    assert probe < 0.45 * full, (probe, full)


def test_char_shingles_catch_unsegmented_near_dups(spark):
    """Word shingles see one 'token' per CJK doc (no whitespace) and find
    nothing; char shingles pair the near-identical docs."""
    a = "日月火水木金土山川田" * 5
    rows = [(1, a), (2, a + "日日日"), (3, "田川山土金木水火月日" * 5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    word = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert word == []  # degenerate: <3 word tokens per doc
    char = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, threshold=0.5, shingle=6, unit="char"
        ).collect()
    }
    assert (1, 2) in char and char[(1, 2)] > 0.8
    assert (1, 3) not in char  # reversed glyph order shares no 6-gram run
