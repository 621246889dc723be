"""DSIR-style importance weights over hashed token features
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" — the standard pretraining-corpus reweighting pass).

Estimator: bag-of-hashed-tokens unigram models for the TARGET slice and
the RAW corpus, add-1 smoothed over ``n_buckets`` hash buckets; a
document's log importance weight is

    log w(doc) = sum_tokens [ log p_target(bucket) - log p_raw(bucket) ]

Execution shape (the part that must survive 100 TB):

1. ONE groupBy over ``n_buckets`` keys (map-side partial agg; the result
   is <= n_buckets rows regardless of corpus size) counts each bucket in
   the raw corpus and in the target slice simultaneously (`sum(is_target)`
   rides the same aggregate — no second pass over the data).
2. The driver turns the bounded count table into per-bucket integer
   milli-log-ratios: ``lam[b] = floor(1000 * ln(((t_b+1)*(R+B)) /
   ((r_b+1)*(T+B))))``. Floor-quantizing at 1e-3 keeps libm-vs-anything
   ``ln`` ulps from propagating (same hardening as the BM25 idf), and the
   quantized table is exact integers from then on.
3. The scoring pass is a ZERO-exchange per-row Column program: the lam
   table is an array literal indexed by ``poly_hash(token) % n_buckets``
   (portable hash — see operators/corpus_filters._poly_hash), and the
   per-doc score is an integer sum — byte-identical under any
   partitioning or reduction order, and exactly re-derivable by the
   DuckDB oracle.

Reference analog: the reference has no corpus reweighting; this is part
of the training-data-pipeline surface the rebuild adds (quality/langid/
dedup family). The two-distribution structure mirrors its
score-vs-threshold emission gating (models/ocr/base_ocr.py:679-725) at
corpus scale.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from .corpus_filters import _poly_hash, _tokens


def dsir_weights(
    df: DataFrame,
    target_pred: Column,
    *,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR log importance weight in integer milli-units.

    ``target_pred`` selects the target slice (e.g. ``col('lang') == 'en'``)
    — it must be computable per row of ``df``. Returns
    (id_col, n_tokens:int, dsir_milli:long); documents with zero tokens
    score 0."""
    toks = _tokens(F.col(text_col))
    buckets = F.transform(toks, lambda t: _poly_hash(t) % n_buckets)

    # pass 1: bounded bucket counts, raw + target in one aggregate
    counts = (
        df.select(
            target_pred.cast("long").alias("is_target"),
            F.explode(buckets).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("raw_n"),
            F.sum("is_target").alias("target_n"),
        )
        .collect()
    )
    raw = [0] * n_buckets
    tgt = [0] * n_buckets
    for r in counts:
        raw[int(r["bucket"])] = int(r["raw_n"])
        tgt[int(r["bucket"])] = int(r["target_n"])
    R = sum(raw)
    T = sum(tgt)
    lam = [
        math.floor(
            1000.0
            * math.log(((tgt[b] + 1) * (R + n_buckets)) / ((raw[b] + 1) * (T + n_buckets)))
        )
        for b in range(n_buckets)
    ]

    # pass 2: zero-exchange integer scoring with the lam literal
    lam_col = F.array(*[F.lit(int(v)).cast("long") for v in lam])
    score = F.aggregate(
        buckets,
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.element_at(lam_col, (b + 1).cast("int")),
    )
    return df.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        score.alias("dsir_milli"),
    )
