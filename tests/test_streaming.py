"""Streaming stateful dedup demo (X3 analog) + kernel gates."""

import numpy as np

from ocr_spark.streaming.stream_ops import dice_coeff, emitted_text_gate, run_demo


def test_dice_coeff():
    a = np.array([1.0, 1.0, 0.0, 0.0])
    b = np.array([1.0, 1.0, 0.0, 0.0])
    assert dice_coeff(a, b) == 1.0
    c = np.array([0.0, 0.0, 1.0, 1.0])
    assert dice_coeff(a, c) == 0.0


def test_emitted_text_gate():
    emitted, last_k = set(), []
    texts = [
        "hello world one",
        "hello world one",      # exact dup
        "hello world ones",     # near dup (dist < 0.2)
        "completely different thing",
    ]
    keep = emitted_text_gate(texts, emitted, last_k)
    assert keep == [True, False, False, True]


def test_streaming_dedup(spark, tmp_path):
    texts = [
        "first unique text",
        "first unique text",       # dup -> suppressed
        "second unique content",
        "first unique texts",      # near-dup of #0 -> suppressed
    ]
    rows = run_demo(spark, texts, checkpoint_dir=str(tmp_path))
    flags = [r.is_new for r in sorted(rows, key=lambda r: r.frame_id)]
    assert flags == [True, False, True, False]
