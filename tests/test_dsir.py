"""DSIR importance weights (operators/dsir.py): hand-checked arithmetic on
a tiny corpus, zero-token behavior, and the zero-exchange scoring plan."""

import math

import pandas as pd

from ocr_spark.operators.dsir import dsir_weights
from pyspark.sql import functions as F

POLY_MOD = 1_000_000_007


def _bucket(tok: str, n: int) -> int:
    acc = 0
    for ch in tok:
        acc = (acc * 31 + ord(ch)) % POLY_MOD
    return acc % n


def _expected(docs, langs, n_buckets):
    raw = [0] * n_buckets
    tgt = [0] * n_buckets
    for text, lang in zip(docs, langs):
        for tok in text.split():
            b = _bucket(tok, n_buckets)
            raw[b] += 1
            if lang == "en":
                tgt[b] += 1
    R, T = sum(raw), sum(tgt)
    lam = [
        math.floor(
            1000 * math.log(((tgt[b] + 1) * (R + n_buckets)) / ((raw[b] + 1) * (T + n_buckets)))
        )
        for b in range(n_buckets)
    ]
    return [
        sum(lam[_bucket(t, n_buckets)] for t in text.split()) for text in docs
    ]


def test_dsir_hand_computed(spark):
    docs = ["the cat sat", "le chat", "the dog", ""]
    langs = ["en", "fr", "en", "fr"]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2, 3], "lang": langs, "text": docs})
    )
    out = {
        r.doc_id: (r.n_tokens, r.dsir_milli)
        for r in dsir_weights(df, F.col("lang") == "en", n_buckets=16).collect()
    }
    exp = _expected(docs, langs, 16)
    assert out[0] == (3, exp[0])
    assert out[1] == (2, exp[1])
    assert out[2] == (2, exp[2])
    assert out[3] == (0, 0)  # zero tokens -> score 0
    # target-heavy text outranks off-target text
    assert out[0][1] > out[1][1]


def test_dsir_scoring_pass_is_exchange_free(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "lang": ["en"], "text": ["a b c"]})
    )
    scored = dsir_weights(df, F.col("lang") == "en", n_buckets=8)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "MapInPandas" not in plan


def test_dsir_resample_partition_invariance_and_proportionality(spark):
    """Systematic PPS selection must be identical at any range-partition
    count (prefix sums are boundary-invariant), must return ~n_samples
    rows, and must sample target-like (heavy) docs at a higher rate."""
    from ocr_spark.operators.dsir import dsir_resample

    docs, langs = [], []
    for i in range(200):
        if i % 4 == 0:
            docs.append("alpha beta gamma delta epsilon zeta")
            langs.append("en")
        else:
            docs.append("uno dos tres")
            langs.append("es")
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(200), "lang": langs, "text": docs})
    )
    sel2 = {
        r.doc_id
        for r in dsir_resample(
            df, F.col("lang") == "en", n_samples=40, n_partitions=2
        ).collect()
    }
    sel8 = {
        r.doc_id
        for r in dsir_resample(
            df, F.col("lang") == "en", n_samples=40, n_partitions=8
        ).collect()
    }
    assert sel2 == sel8
    assert 35 <= len(sel8) <= 45
    en_rate = len([d for d in sel8 if d % 4 == 0]) / 50
    es_rate = len([d for d in sel8 if d % 4 != 0]) / 150
    assert en_rate > 2 * es_rate


def test_dsir_resample_cum_matches_weight_prefix(spark):
    """The emitted cum column must equal the true global prefix sum of
    weights in doc-id order (offsets wired through partitions correctly)."""
    from ocr_spark.operators.dsir import dsir_resample

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(50),
                "lang": ["en" if i % 2 == 0 else "fr" for i in range(50)],
                "text": [f"tok{i} tok{i+1} shared" for i in range(50)],
            }
        )
    )
    rows = dsir_resample(
        df, F.col("lang") == "en", n_samples=10, n_partitions=4
    ).collect()
    assert rows, "selection must be non-empty"
    for r in rows:
        assert r.cum >= r.weight > 0
    cums = [r.cum for r in sorted(rows, key=lambda r: r.doc_id)]
    assert cums == sorted(cums)
