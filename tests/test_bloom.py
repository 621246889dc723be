"""Deterministic Bloom prefilter (operators/bloom.py): the no-false-
negative guarantee, bit-table bound, broadcast plan, and determinism."""

import pandas as pd

from ocr_spark.operators.bloom import bloom_bits, bloom_probe


def _urls(spark, n, prefix="https://h.example/p/"):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(n), "url": [f"{prefix}{i}" for i in range(n)]})
    )


def test_no_false_negatives_and_determinism(spark):
    urls = _urls(spark, 200)
    crawled = urls.where("doc_id % 3 = 0")
    bits = bloom_bits(crawled, m_bits=4096, k=3)
    out = {r.doc_id: r.candidate for r in bloom_probe(urls, bits, m_bits=4096, k=3).collect()}
    # every member MUST be a candidate
    assert all(out[i] for i in range(0, 200, 3))
    # columns preserved, one row per input
    assert len(out) == 200
    # deterministic: a second build+probe gives identical verdicts
    out2 = {r.doc_id: r.candidate for r in bloom_probe(urls, bits, m_bits=4096, k=3).collect()}
    assert out == out2


def test_bit_table_bounded_and_fp_resolved_by_exact_join(spark):
    urls = _urls(spark, 300)
    crawled = urls.where("doc_id % 2 = 0")
    m = 512  # deliberately tight -> false positives likely
    bits = bloom_bits(crawled, m_bits=m, k=3)
    assert bits.count() <= m
    probed = bloom_probe(urls, bits, m_bits=m, k=3)
    # the exact anti-join AFTER the prefilter yields the true frontier:
    # candidates minus members == false positives, all caught downstream
    frontier = probed.where("NOT candidate")
    member_ids = {r.doc_id for r in crawled.collect()}
    assert all(r.doc_id not in member_ids for r in frontier.collect())


def test_probe_broadcasts_bits(spark):
    urls = _urls(spark, 50)
    bits = bloom_bits(urls, m_bits=1024, k=3)
    plan = (
        bloom_probe(urls, bits, m_bits=1024, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan


def test_probe_duplicates_preserved_and_no_row_ids(spark):
    import pandas as pd

    urls = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3], "url": ["https://h/p/1", "https://h/p/1", "https://h/p/9"]}
        )
    )
    bits = bloom_bits(urls.where("doc_id = 1"), m_bits=1024, k=3)
    out = bloom_probe(urls, bits, m_bits=1024, k=3).collect()
    # duplicate probe rows both come back, with identical verdicts
    assert len(out) == 3
    verdicts = sorted((r.doc_id, r.candidate) for r in out)
    assert verdicts[0] == (1, True) and verdicts[1] == (2, True)
    plan = (
        bloom_probe(urls, bits, m_bits=1024, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "monotonically_increasing_id" not in plan


def test_bloom_rejects_k_beyond_multipliers(spark):
    import pytest as _pytest

    from ocr_spark.operators.bloom import _positions
    from pyspark.sql import functions as F

    with _pytest.raises(ValueError):
        _positions(F.lit("x"), m_bits=4096, k=9)
