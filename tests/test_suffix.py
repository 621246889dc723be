"""Distributed suffix array (prefix doubling): rank parity with a naive
python suffix sort, dense tie semantics, init-width invariance, and the
Lee-et-al adjacency dup read-out."""

import pytest

from pyspark.sql import functions as F

from ocr_spark.operators.suffix import adjacent_dup_grams, suffix_array


def _naive_ranks(texts: dict[int, str]) -> dict[tuple[int, int], int]:
    """(doc, 1-based pos) -> 1-based DENSE rank of the suffix among all
    suffixes of all docs, ties (equal suffixes) sharing a rank."""
    sufs = [
        (s[i:], did, i + 1)
        for did, s in texts.items()
        for i in range(len(s))
    ]
    sufs.sort(key=lambda t: t[0])
    ranks, r, prev = {}, 0, None
    for suf, did, pos in sufs:
        if suf != prev:
            r += 1
            prev = suf
        ranks[(did, pos)] = r
    return ranks


def _docs_df(spark, texts: dict[int, str]):
    return spark.createDataFrame(
        [(did, s) for did, s in texts.items()], "doc_id long, s string"
    )


TEXTS = {
    1: "banana#1#",
    2: "bandana#2#",
    3: "an apple and a banana split#3#",
}


def test_ranks_match_naive_sort(spark):
    got = {
        (r["doc_id"], r["pos"]): r["rnk"]
        for r in suffix_array(_docs_df(spark, TEXTS), n_partitions=4).collect()
    }
    assert got == _naive_ranks(TEXTS)


def test_dense_ties_share_rank(spark):
    # identical docs -> every suffix duplicated; dense semantics means
    # ranks cover exactly 1..len and each rank appears twice
    texts = {1: "abcab", 2: "abcab"}
    rows = suffix_array(_docs_df(spark, texts), n_partitions=2).collect()
    got = {(r["doc_id"], r["pos"]): r["rnk"] for r in rows}
    assert got == _naive_ranks(texts)
    assert sorted({v for v in got.values()}) == list(range(1, 6))


@pytest.mark.parametrize("width", [1, 4, 64])
def test_init_width_invariance(spark, width):
    rows = suffix_array(
        _docs_df(spark, TEXTS), n_partitions=4, init_width=width
    ).collect()
    got = {(r["doc_id"], r["pos"]): r["rnk"] for r in rows}
    assert got == _naive_ranks(TEXTS)


def test_adjacency_finds_cross_doc_duplicate(spark):
    shared = "the quick brown fox jumps over the lazy dog"
    texts = {
        7: "intro text then " + shared + " and an outro#7#",
        9: shared + " opens this one#9#",
        11: "nothing in common here at all#11#",
    }
    docs = _docs_df(spark, texts)
    sa = suffix_array(docs, n_partitions=4)
    pairs = adjacent_dup_grams(docs, sa, gram_len=len(shared)).collect()
    cross = {(r["doc_a"], r["doc_b"]) for r in pairs if r["cross_doc"]}
    assert (7, 9) in cross or (9, 7) in cross
    grams = {r["gram"] for r in pairs if r["cross_doc"]}
    assert shared in grams
    # doc 11 shares no >=len(shared) substring with anyone
    assert all(11 not in p for p in cross)


def test_ranks_deterministic_across_partitioning(spark):
    a = suffix_array(_docs_df(spark, TEXTS), n_partitions=2).collect()
    b = suffix_array(_docs_df(spark, TEXTS), n_partitions=7).collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}


def test_default_partitioning_scales_and_matches(spark):
    # default n_partitions (None) resolves from defaultParallelism /
    # input size instead of a fixed 32, and yields the identical ranks
    auto = suffix_array(_docs_df(spark, TEXTS)).collect()
    fixed = suffix_array(_docs_df(spark, TEXTS), n_partitions=3).collect()
    assert {tuple(r) for r in auto} == {tuple(r) for r in fixed}


def test_suffix_array_fuzz_vs_naive(spark):
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.text(alphabet="abc ", min_size=1, max_size=24),
            min_size=1,
            max_size=5,
        )
    )
    def check(texts):
        docs = {i + 1: t + f"#{i + 1}#" for i, t in enumerate(texts)}
        got = {
            (r["doc_id"], r["pos"]): r["rnk"]
            for r in suffix_array(
                _docs_df(spark, docs), n_partitions=3, init_width=4
            ).collect()
        }
        assert got == _naive_ranks(docs)

    check()
