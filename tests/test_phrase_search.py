"""Positional-postings exact-phrase search (operators/search.phrase_topk)."""

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.search import phrase_topk

pytestmark = pytest.mark.usefixtures("spark")


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _run(spark, texts, phrase, k=10):
    return [
        tuple(r)
        for r in phrase_topk(_docs(spark, texts), phrase, k=k).collect()
    ]


def test_counts_and_ranking(spark):
    texts = [
        "big table hash join",              # 1 occurrence
        "table hash and table hash again",  # 2
        "hash table",                       # reversed: 0
        "table of hash",                    # gap: 0
    ]
    assert _run(spark, texts, ["table", "hash"]) == [(1, 2), (0, 1)]


def test_three_term_phrase_and_case_punct(spark):
    texts = ["the Quick, BROWN fox!", "quick brown cat", "a quick brown fox b"]
    assert _run(spark, texts, ["quick", "brown", "fox"]) == [(0, 1), (2, 1)]


def test_overlapping_and_repeated_terms(spark):
    # "a a a" holds TWO occurrences of the phrase "a a" (positions 0 and 1)
    assert _run(spark, ["a a a"], ["a", "a"]) == [(0, 2)]


def test_no_match_and_tie_break(spark):
    assert _run(spark, ["x y", "y x"], ["p", "q"]) == []
    # equal counts -> lowest doc_id first
    assert _run(spark, ["m n", "m n"], ["m", "n"]) == [(0, 1), (1, 1)]


def test_plan_has_no_cartesian(spark):
    df = phrase_topk(_docs(spark, ["table hash"] * 5), ["table", "hash"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
