"""Trained EAST-style detection (operators/detect_train.py, D1 closure)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ocr_spark.kernels import pixel_ocr as px
from ocr_spark.operators.detect_train import (
    _dilate,
    _page_arrays,
    _patch_features,
    east_train_scorer,
    east_trained_detect,
    east_trained_roundtrip,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def parts(spark):
    return (
        spark.read.parquet(f"{SF}/part.parquet")
        .select("p_partkey", "p_name")
        .limit(80)
        .persist()
    )


@pytest.fixture(scope="module")
def trained(parts):
    return east_train_scorer(parts)


def _expected(name, key):
    nm = px.sanitize_for_font(str(name))
    decoded = (nm + " " + str(int(key))).strip()
    words = decoded.split()
    sum_w = sum(
        6 * len(w) - 1 - (w[0] in "i1") - (w[-1] in "i1") for w in words
    )
    return decoded, len(words), sum_w, 7 * len(words)


def test_training_reaches_zero_errors(trained):
    w, n_passes, errs = trained
    assert errs == 0
    assert 1 <= n_passes <= 16
    # ink weights dominate the bias: the learned rule is "any ink nearby"
    assert w[-1] < 0 and (w[:-1] > 0).all()


def test_trained_scorer_reproduces_label_mask(trained):
    w, _, _ = trained
    _, ink = _page_arrays("violet burnished i1i zq", 111)
    z = _patch_features(ink) @ w
    assert (((z > 0).reshape(ink.shape)) == _dilate(ink)).all()


def test_roundtrip_matches_arithmetic(parts, trained):
    w, _, _ = trained
    out = {
        int(r["p_partkey"]): r
        for r in east_trained_detect(parts, w).collect()
    }
    for prow in parts.collect():
        decoded, n_boxes, sum_w, sum_h = _expected(prow["p_name"], prow["p_partkey"])
        r = out[int(prow["p_partkey"])]
        assert r["decoded"] == decoded
        assert r["n_boxes"] == n_boxes
        assert r["sum_w"] == sum_w
        assert r["sum_h"] == sum_h


def test_narrow_glyph_word_stays_one_box(spark, trained):
    """'11' has a 3-column ink gap — the word-gap-sized trap the 3x5
    receptive field exists for; it must stay a single box."""
    w, _, _ = trained
    d = spark.createDataFrame([(11, "new plate")], "p_partkey long, p_name string")
    r = east_trained_detect(d, w).collect()[0]
    assert r["decoded"] == "new plate 11"
    assert r["n_boxes"] == 3


def test_partition_invariance(parts):
    """Training sums are integer-quantized: the fitted weights and the
    detection output are identical at any parallelism."""
    a = east_train_scorer(parts.repartition(1))[0]
    b = east_train_scorer(parts.repartition(7))[0]
    assert np.array_equal(a, b)


def test_roundtrip_contract_query(spark, parts):
    out = east_trained_roundtrip(parts)
    assert out.columns == ["p_partkey", "decoded", "n_boxes", "sum_w", "sum_h"]
    n = out.where(F.col("n_boxes") >= 1).count()
    assert n == parts.count()
