"""R8 attention decode: windowed monotonic mechanism invariants, batch ==
per-sequence equality, termination, and the Spark operator."""

import numpy as np

from ocr_spark.kernels import ctc as ctc_kernel
from ocr_spark.kernels.attn_decode import (
    AttnWeights,
    attn_greedy_decode_batch,
    synth_memory_for_text,
)

VOCAB = ctc_kernel.make_vocab()
INDEX = {c: i for i, c in enumerate(VOCAB)}
W = AttnWeights(vocab=len(VOCAB) + 2, memory_dim=len(VOCAB), hidden=32, seed=42)
SOS, EOS = len(VOCAB), len(VOCAB) + 1


def _decode(texts, max_length=48):
    mems = [synth_memory_for_text(t, INDEX, memory_dim=len(VOCAB)) for t in texts]
    t_max = max(m.shape[0] for m in mems)
    batch = np.stack([np.pad(m, ((0, t_max - m.shape[0]), (0, 0))) for m in mems])
    lengths = np.array([m.shape[0] for m in mems])
    return attn_greedy_decode_batch(
        batch, lengths, W, sos=SOS, eos=EOS, max_length=max_length
    )


def test_terminates_and_is_deterministic():
    texts = ["hello world", "abc", "the quick brown fox jumps over it all"]
    t1, s1, _ = _decode(texts)
    t2, s2, _ = _decode(texts)
    assert t1 == t2 and (s1 == s2).all()
    # forced EOS bounds steps by memory length + 1 (monotone head: the
    # read head advances >= 1 per step and EOS fires when it passes T)
    for text, steps in zip(texts, s1):
        assert steps <= len(text) + 1


def test_batch_equals_singleton_runs():
    texts = ["hello world", "abcdef ghij", "zzz"]
    tb, sb, _ = _decode(texts)
    for i, t in enumerate(texts):
        ts, ss, _ = _decode([t])
        assert ts[0] == tb[i]
        assert ss[0] == sb[i]


def test_attention_respects_window_and_padding():
    texts = ["a much longer memory sequence for the window test", "ab"]
    _, _, traces = _decode(texts)
    long_trace = traces[0]
    t_long = len(texts[0])
    for step, attn in enumerate(long_trace):
        nz = np.nonzero(attn > 1e-12)[0]
        assert nz.max() - nz.min() <= 16  # attn_mask_win_len
    # the short sequence's padded frames never receive attention
    short_trace = traces[1]
    assert short_trace.shape[1] == t_long  # padded width
    assert (short_trace[:, len(texts[1]):] < 1e-12).all()


def test_read_head_monotone():
    texts = ["monotone attention read head check sequence"]
    _, _, traces = _decode(texts)
    centers = [int(a.argmax()) for a in traces[0]]
    lower = -1
    for c in centers:
        assert c >= lower  # window floor advances every step
        lower = max(lower + 1, c) - 5  # head >= prev+1; window reaches back 5


def test_attn_operator_on_spark(spark):
    from ocr_spark.operators.recognize import attn_decode_table

    parts = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    out = attn_decode_table(parts.limit(50))
    rows = out.collect()
    assert len(rows) == 50
    assert all(r.n_steps >= 1 for r in rows)
    assert all(r.n_tokens == (len(r.tokens_csv.split(",")) if r.tokens_csv else 0) for r in rows)
