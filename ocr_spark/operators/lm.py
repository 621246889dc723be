"""Corpus-trained n-gram language model with stupid-backoff scoring
(Brants et al. 2007, "Large Language Models in Machine Translation" —
the distributed-LM recipe built *for* MapReduce-shaped engines, and the
model family behind KenLM-style quality filtering in CCNet/RefinedWeb).

Two operators:

- :func:`ngram_lm_counts` — train: unigram + bigram count tables from a
  (possibly filtered) training slice, pruned at ``min_count`` (the
  KenLM ``filter`` step that bounds the model size independently of
  corpus size).
- :func:`stupid_backoff_score` — score every document against the
  trained tables with the stupid-backoff estimator

      S(w2 | w1) = c(w1 w2) / c(w1)          if c(w1 w2) > 0
                 = alpha * c(w2) / N          elif c(w2) > 0
                 = alpha * 1 / N              otherwise (OOV floor)

  and per-doc ``sb_milli = sum floor(1000 * ln S)`` over adjacent token
  pairs, plus the length-normalized ``sb_per_bigram_milli`` (the value a
  quality gate actually thresholds — CCNet buckets by per-token
  perplexity, not total log-prob).

Scale shape (the part that must survive 100 TB):

1. Training is two map-side-partial-agg groupBys (unigrams, bigrams)
   followed by the ``min_count`` prune. After pruning, the model is
   bounded by the (Zipf-truncated) vocabulary, not the corpus: the
   standard KenLM-filter artifact that makes web-scale LMs shippable.
2. Scoring explodes each doc into adjacent pairs (narrow), then joins
   the gram tables. Both count tables are pruned and hinted
   ``broadcast`` — the probe side never shuffles on a gram key, so the
   Zipfian hot grams ("of the", "in a") cost nothing. At vocabulary
   sizes past executor memory, drop the hint and the same plan becomes
   three hash joins on gram keys (documented fallback, not default).
3. The only probe-side exchange is the final groupBy on ``doc_id``.

Float hardening: count ratios are exact (small-integer division is
correctly rounded in every IEEE engine); the single ``ln`` call is
floor-quantized to 1e-3 *in the same expression* (the BM25 idf
hardening — see operators/search.py:10), so the DuckDB oracle re-derives
every score bit-for-bit.

Invariant used by the backoff ladder: unigrams and bigrams are pruned at
the SAME ``min_count``, and c(w1) >= c(w1 w2), so any surviving bigram's
left context is guaranteed present in the unigram table — the
``c(w1 w2) > 0`` branch never divides by a pruned-away denominator.

Reference analog: the reference scores recognition emissions against a
decoder LM table broadcast once per executor (SURVEY §2.8/§4); this is
the corpus-scale sibling trained *from* the data instead of shipped
with the model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .corpus_filters import _tokens

#: stupid-backoff discount (Brants et al. 2007 use 0.4 throughout)
ALPHA = 0.4
#: ln quantization, matching operators/search.IDF_QUANT
LN_QUANT = 1000


def ngram_lm_counts(
    train: DataFrame,
    *,
    min_count: int = 2,
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, "object"]:
    """Train pruned unigram/bigram count tables from ``train``.

    Returns ``(uni, bi, total_tokens_col_input)`` where ``uni`` is
    (w, c1), ``bi`` is (w1w2, c2) keyed by the space-joined bigram, and
    the third element is the *unpruned* total token count N as a Python
    int (a single scalar — the one driver-side value the model needs).
    """
    toks = _tokens(F.col(text_col))
    words = train.select(F.explode(toks).alias("w"))
    uni_all = words.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    # N is the unpruned token total: one row out of the same aggregate tree
    total = uni_all.agg(F.sum("c1").alias("n")).collect()[0]["n"] or 0
    uni = uni_all.filter(F.col("c1") >= min_count)

    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.array_join(F.slice(toks, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bi = (
        train.select(F.explode(pairs).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c2"))
        .filter(F.col("c2") >= min_count)
    )
    return uni, bi, int(total)


def stupid_backoff_score(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    total_tokens: int,
    *,
    alpha: float = ALPHA,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """Score each doc: (id, n_bigrams, sb_milli, sb_per_bigram_milli).

    ``sb_milli`` is the integer milli-log-prob sum over adjacent pairs;
    ``sb_per_bigram_milli`` the integer-division length normalization.
    Zero-bigram docs score NULL on the normalized column and 0 total.
    """
    n = max(int(total_tokens), 1)
    toks = _tokens(F.col(text_col))
    # zero-bigram docs emit ONE null sentinel pair instead of vanishing, so
    # no join-back exchange is needed to reinstate them after the groupBy
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(
        F.array(
            F.struct(
                F.lit(None).cast("string").alias("w1"),
                F.lit(None).cast("string").alias("w2"),
            )
        )
    )
    probe = docs.select(id_col, F.explode(pairs).alias("p")).select(
        id_col,
        F.col("p.w1").alias("w1"),
        F.col("p.w2").alias("w2"),
    )

    uni_m = F.broadcast(uni) if broadcast_model else uni
    bi_m = F.broadcast(bi) if broadcast_model else bi
    joined = (
        probe.join(
            bi_m, F.concat_ws(" ", probe["w1"], probe["w2"]) == bi_m["g"], "left"
        )
        .drop("g")
        .join(uni_m.withColumnRenamed("w", "_u1").withColumnRenamed("c1", "c_w1"),
              F.col("w1") == F.col("_u1"), "left")
        .drop("_u1")
        .join(uni_m.withColumnRenamed("w", "_u2").withColumnRenamed("c1", "c_w2"),
              F.col("w2") == F.col("_u2"), "left")
        .drop("_u2")
    )

    # the single ln is floor-quantized in-expression (BM25 idf hardening)
    seen = F.col("c2").isNotNull()
    backoff_num = F.when(
        F.col("c_w2").isNotNull(), F.col("c_w2").cast("double")
    ).otherwise(F.lit(1.0))
    ratio = F.when(
        seen, F.col("c2").cast("double") / F.col("c_w1").cast("double")
    ).otherwise(F.lit(float(alpha)) * backoff_num / F.lit(float(n)))
    term = F.when(
        F.col("w1").isNotNull(), F.floor(F.log(ratio) * F.lit(LN_QUANT)).cast("long")
    )

    return (
        joined.groupBy(id_col)
        .agg(
            F.count("w1").alias("n_bigrams"),
            F.coalesce(F.sum(term), F.lit(0)).alias("sb_milli"),
        )
        .select(
            id_col,
            F.col("n_bigrams").cast("int").alias("n_bigrams"),
            F.col("sb_milli").cast("long").alias("sb_milli"),
            F.when(
                F.col("n_bigrams") > 0,
                F.floor(F.col("sb_milli") / F.col("n_bigrams")).cast("long"),
            ).alias("sb_per_bigram_milli"),
        )
    )


def nb_train_score(
    docs: DataFrame,
    target_pred,
    *,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multinomial Naive Bayes quality filter TRAINED ON-CLUSTER — the
    actual CCNet/GPT-3 shape (train looks-like-target vs rest, score the
    whole corpus), where `quality_classifier` covers only the fixed-
    weight inference half.

    Training is two aggregations over the exploded token table: per-word
    class-conditional counts (pruned at ``min_count`` on the combined
    count) and one scalar row (class token totals, doc counts). Weights
    are Laplace-smoothed per-class milli-log-likelihoods, quantized
    ``floor(1000 * ln((c+1)/(N+V)))`` each side — the same engine-exact
    float discipline as ``stupid_backoff_score`` (the ONE ln is applied
    to a ratio of exact integers, so DuckDB reproduces every term).

    Scoring joins the exploded corpus against the BROADCAST model table
    (pruned vocab — model-sized, never corpus-sized); unseen words take
    the constant OOV delta; zero-token docs survive via a null sentinel
    (no join-back). Output: (id, n_tokens, nb_milli, label) with
    ``label = nb_milli > 0``.

    Scale: one explode + two hash aggregations to train, one broadcast
    join + one groupBy(id) to score — no corpus-keyed shuffle other than
    the per-doc aggregation the answer itself requires."""
    base = docs.select(
        F.col(id_col), F.col(text_col).alias("_t"), target_pred.alias("_y")
    )
    toks = _tokens(F.col("_t"))
    words = base.select(F.explode(toks).alias("w"), "_y")
    counts_all = words.groupBy("w").agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).cast("long").alias("cpos"),
        F.sum(F.when(F.col("_y"), 0).otherwise(1)).cast("long").alias("cneg"),
    )
    scal = counts_all.agg(
        F.coalesce(F.sum("cpos"), F.lit(0)).alias("npos"),
        F.coalesce(F.sum("cneg"), F.lit(0)).alias("nneg"),
    ).collect()[0]
    npos, nneg = int(scal["npos"]), int(scal["nneg"])
    dc = base.agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("dpos"),
        F.sum(F.when(F.col("_y"), 0).otherwise(1)).alias("dneg"),
    ).collect()[0]
    dpos, dneg = max(int(dc["dpos"]), 1), max(int(dc["dneg"]), 1)

    model = counts_all.filter(F.col("cpos") + F.col("cneg") >= min_count)
    v = model.count()
    denom_pos = float(npos + v)
    denom_neg = float(nneg + v)

    def _milli(num_col, denom: float):
        return F.floor(
            F.log(num_col.cast("double") / F.lit(denom)) * F.lit(1000)
        ).cast("long")

    model_w = model.select(
        "w",
        (_milli(F.col("cpos") + 1, denom_pos) - _milli(F.col("cneg") + 1, denom_neg)).alias(
            "delta"
        ),
    )
    import math

    oov = int(math.floor(math.log(1.0 / denom_pos) * 1000)) - int(
        math.floor(math.log(1.0 / denom_neg) * 1000)
    )
    prior = int(math.floor(math.log(float(dpos) / float(dneg)) * 1000))

    # zero-token docs emit one null sentinel so they survive the groupBy
    probe_toks = F.when(F.size(toks) > 0, toks).otherwise(
        F.array(F.lit(None).cast("string"))
    )
    probe = base.select(id_col, F.explode(probe_toks).alias("w"))
    joined = probe.join(F.broadcast(model_w), "w", "left")
    term = F.when(
        F.col("w").isNotNull(),
        F.coalesce(F.col("delta"), F.lit(oov).cast("long")),
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("w").alias("n_tokens"),
            (F.coalesce(F.sum(term), F.lit(0)) + F.lit(prior)).alias("nb_milli"),
        )
        .select(
            id_col,
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.col("nb_milli").cast("long").alias("nb_milli"),
            (F.col("nb_milli") > 0).alias("label"),
        )
    )


def kneser_ney_score(
    docs: DataFrame,
    bi: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; the
    smoothing KenLM ships and CCNet-style perplexity filters rely on) —
    the principled sibling of :func:`stupid_backoff_score` (Brants et al.
    2007 trade exactness for scale; KN keeps proper probabilities):

        P(w2|w1) = max(c(w1w2) - D, 0)/c(w1.) + D*N1+(w1,.)/c(w1.) * Pc(w2)
        Pc(w2)   = max(N1+(., w2), 1) / N_types        (floor = OOV guard)
        P(w2|w1) = Pc(w2)                              when w1 unseen

    with discount D = 0.75.  EVERY model quantity derives from the ONE
    pruned bigram count table ``bi`` (w1, w2, c2) — the left/right
    continuation tables and the type total are aggregates of it, so the
    model stays bounded and the DuckDB oracle can re-derive it all:

    - left  (w1): c(w1.) = sum c2, N1+(w1,.) = count rows
    - right (w2): N1+(., w2) = count rows
    - N_types = count(*) over ``bi`` (>= 1 guard)

    Per-term quantization is the established floor-milli-ln contract
    (``floor(ln(p) * 1000)`` with p built by a FIXED double expression
    tree both engines evaluate identically).  Scale shape identical to
    stupid_backoff_score: explode adjacent pairs, THREE broadcast model
    joins, one doc_id groupBy.  Output: (id, n_bigrams, kn_milli,
    kn_per_bigram_milli)."""
    left = bi.groupBy(F.split(F.col("g"), " ").getItem(0).alias("w1l")).agg(
        F.sum("c2").alias("c1tot"), F.count(F.lit(1)).alias("n1w1")
    )
    right = bi.groupBy(F.split(F.col("g"), " ").getItem(1).alias("w2r")).agg(
        F.count(F.lit(1)).alias("n1w2")
    )
    n_types = max(int(bi.count()), 1)

    toks = _tokens(F.col(text_col))
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(
        F.array(
            F.struct(
                F.lit(None).cast("string").alias("w1"),
                F.lit(None).cast("string").alias("w2"),
            )
        )
    )
    probe = docs.select(id_col, F.explode(pairs).alias("p")).select(
        id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    bi_m = F.broadcast(bi) if broadcast_model else bi
    left_m = F.broadcast(left) if broadcast_model else left
    right_m = F.broadcast(right) if broadcast_model else right
    joined = (
        probe.join(
            bi_m, F.concat_ws(" ", probe["w1"], probe["w2"]) == bi_m["g"], "left"
        )
        .drop("g")
        .join(left_m, F.col("w1") == F.col("w1l"), "left")
        .drop("w1l")
        .join(right_m, F.col("w2") == F.col("w2r"), "left")
        .drop("w2r")
    )

    pc = (
        F.greatest(F.coalesce(F.col("n1w2"), F.lit(0)), F.lit(1)).cast("double")
        / F.lit(float(n_types))
    )
    c2d = F.coalesce(F.col("c2"), F.lit(0)).cast("double")
    p_seen = (
        F.greatest(c2d - F.lit(0.75), F.lit(0.0))
        + F.lit(0.75) * F.col("n1w1").cast("double") * pc
    ) / F.col("c1tot").cast("double")
    p = F.when(F.col("c1tot").isNotNull(), p_seen).otherwise(pc)
    term = F.when(
        F.col("w1").isNotNull(), F.floor(F.log(p) * F.lit(LN_QUANT)).cast("long")
    )

    return (
        joined.groupBy(id_col)
        .agg(
            F.count("w1").alias("n_bigrams"),
            F.coalesce(F.sum(term), F.lit(0)).alias("kn_milli"),
        )
        .select(
            id_col,
            F.col("n_bigrams").cast("int").alias("n_bigrams"),
            F.col("kn_milli").cast("long").alias("kn_milli"),
            F.when(
                F.col("n_bigrams") > 0,
                F.floor(F.col("kn_milli") / F.col("n_bigrams")).cast("long"),
            ).alias("kn_per_bigram_milli"),
        )
    )
