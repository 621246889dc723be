"""Recognition stage as a standalone operator: logits -> text via CTC.

The reference's recognize path (R4-R6): CRNN forward -> ctc_decode -> vocab
decode (/root/reference/models/ocr/base_ocr.py:171-222,
/root/reference/utils/text/ctc_decoder.py:14-36). We do not ship model
weights (FIXTURES.md §3): logits are deterministic fixtures synthesized from
a target string, so the decode semantics are exercised byte-identically.

``ctc_roundtrip`` is the oracle-checkable form: synth(text) -> decode must
reproduce the text, so the DuckDB oracle is simply the identity projection.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from ..kernels import ctc as ctc_kernel

ROUNDTRIP_SCHEMA = "p_partkey long, decoded string, score double"


def ctc_roundtrip(parts: DataFrame, *, beam: bool = False) -> DataFrame:
    """part names -> fixture logits -> batched CTC decode -> text.

    One mapInPandas stage; the whole Arrow chunk decodes as a single padded
    (N, T, V) batch (pad_batch analog, base_ocr.py:210-211).
    """

    def gen(batches):
        import pandas as pd

        vocab = ctc_kernel.make_vocab()
        index = {c: i for i, c in enumerate(vocab)}
        for pdf in batches:
            texts = [
                ctc_kernel.sanitize_for_vocab(str(t), index) for t in pdf["p_name"]
            ]
            jobs = [ctc_kernel.synth_logits_for_text(t, vocab) for t in texts]
            if beam:
                decoded, scores = [], []
                for j in jobs:
                    (tokens, score), = ctc_kernel.ctc_beam_decode(j, beam_width=10)
                    decoded.append(ctc_kernel.decode_tokens(tokens, vocab))
                    scores.append(score)
            else:
                t_max = max((j.shape[0] for j in jobs), default=1)
                batch = np.stack(
                    [np.pad(j, ((0, t_max - j.shape[0]), (0, 0))) for j in jobs]
                ) if jobs else np.zeros((0, 1, len(vocab)))
                lengths = np.array([j.shape[0] for j in jobs])
                tokens, scores = ctc_kernel.ctc_greedy_decode_batch(batch, lengths)
                decoded = [ctc_kernel.decode_tokens(t, vocab) for t in tokens]
            yield pd.DataFrame(
                {
                    "p_partkey": pdf["p_partkey"].astype("int64"),
                    "decoded": decoded,
                    "score": np.round(np.asarray(scores, dtype=np.float64), 6),
                }
            )

    return parts.select("p_partkey", "p_name").mapInPandas(gen, schema=ROUNDTRIP_SCHEMA)
