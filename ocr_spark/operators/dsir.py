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


#: clamp for the milli-log weight before exponentiation: e^±10 spans 9
#: orders of magnitude — anything beyond is saturated, and the clamp
#: bounds the integer exp tables so products stay far inside int64.
EXP_CLAMP_MILLI = 10_000
EXP_SCALE = 1 << 20


def exp_tables() -> tuple[list[int], list[int]]:
    """Fixed-point integer e^x tables shared verbatim with the DuckDB
    oracle (the BLOCKLIST_PATTERNS shared-constant pattern): for
    milli-nats m = 1000q + r (q = floor(m/1000) in [-10, 10], r in
    [0, 999]),  e^(m/1000) * 2^20 ~= EQ[q] * ER[r] / 2^20.  Both tables
    are pure math constants computed once here — scoring is then integer
    multiply/shift everywhere, immune to libm differences."""
    eq = [
        math.floor(EXP_SCALE * math.exp(q))
        for q in range(-EXP_CLAMP_MILLI // 1000, EXP_CLAMP_MILLI // 1000 + 1)
    ]
    er = [math.floor(EXP_SCALE * math.exp(r / 1000.0)) for r in range(1000)]
    return eq, er


def dsir_resample(
    df: DataFrame,
    target_pred: Column,
    *,
    n_samples: int = 100,
    n_buckets: int = 64,
    n_partitions: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The RESAMPLING half of DSIR (Xie et al. 2023 select documents
    proportionally to their importance weight, not top-k — top-k collapses
    onto the mode of the target distribution; proportional sampling keeps
    diversity). Deterministic variant: systematic (Madow) PPS sampling in
    doc-id order — select doc i iff floor(C_{i-1}/step) < floor(C_i/step)
    where C is the cumulative integer weight and step = total/n_samples.
    Returns the selected rows (id_col, weight, cum).

    Weights: w = 2^20 * e^(dsir_milli/1000), computed EXACTLY in int64 via
    the shared :func:`exp_tables` (milli-log clamped to ±10 nats).

    Scale shape — the distributed prefix sum (same two-pass pattern as the
    CDX range-partitioned sort): repartitionByRange on doc id (pinned with
    persist so both passes see identical partitions), pass 1 collects ONE
    row per partition (its weight sum), the driver turns those into
    per-partition starting offsets, pass 2 is a zero-exchange Arrow scan
    that cumsums within each partition from its offset and emits the
    selected rows. No global-order window (a partitionBy-less window
    funnels the corpus through one partition); prefix sums are
    partition-boundary-invariant, so any range placement yields the same
    selection. The input stays persisted — the selection references the
    pinned partitioning."""
    eq, er = exp_tables()
    eq_arr = F.array(*[F.lit(int(v)).cast("long") for v in eq])
    er_arr = F.array(*[F.lit(int(v)).cast("long") for v in er])

    scores = dsir_weights(
        df, target_pred, n_buckets=n_buckets, text_col=text_col, id_col=id_col
    )
    mc = F.greatest(
        F.lit(-EXP_CLAMP_MILLI), F.least(F.lit(EXP_CLAMP_MILLI), F.col("dsir_milli"))
    )
    q = F.floor(mc / F.lit(1000.0)).cast("long")
    r = (mc - F.lit(1000) * q).cast("int")
    # the product reaches ~2^56 — beyond double mantissa — so the 2^20
    # rescale must stay integral: arithmetic shift, never float division
    prod = F.element_at(
        eq_arr, (q + F.lit(EXP_CLAMP_MILLI // 1000 + 1)).cast("int")
    ) * F.element_at(er_arr, r + F.lit(1))
    w_df = scores.select(
        F.col(id_col),
        F.shiftright(prod, 20).cast("long").alias("weight"),
    )

    ranged = (
        w_df.repartitionByRange(n_partitions, F.col(id_col))
        .sortWithinPartitions(id_col)
        .persist()
    )
    part_rows = (
        ranged.select(F.spark_partition_id().alias("pid"), "weight")
        .groupBy("pid")
        .agg(F.sum("weight").alias("s"))
        .collect()
    )
    sums = {int(row["pid"]): int(row["s"]) for row in part_rows}
    total = sum(sums.values())
    if total <= 0:
        raise ValueError("dsir_resample: corpus has zero total weight")
    step = max(1, total // n_samples)
    offsets = {}
    acc = 0
    for pid in sorted(sums):  # range partitions are ordered by pid
        offsets[pid] = acc
        acc += sums[pid]

    def gen(batches):
        import pandas as pd
        from pyspark import TaskContext

        running = offsets.get(TaskContext.get().partitionId(), 0)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cum = running + pdf["weight"].to_numpy().cumsum()
            prev = cum - pdf["weight"].to_numpy()
            running = int(cum[-1])
            keep = (prev // step) < (cum // step)
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[keep],
                    "weight": pdf["weight"].to_numpy()[keep],
                    "cum": cum[keep],
                }
            )
            yield out

    return ranged.mapInPandas(
        gen, schema=f"{id_col} long, weight long, cum long"
    )
