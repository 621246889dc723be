"""UniMax source-mixture allocation (Chung et al. 2023, "UniMax: Fairer
and More Effective Language Sampling") — the standard budget allocator
across corpus sources: give every source a uniform share of the token
budget, capped at ``max_epochs`` passes over its own data, re-distributing
what capped sources cannot absorb (water-filling).

Closed form over sources sorted ascending by capacity c_i = tokens_i *
max_epochs (the capped set is a prefix of that order):

    k* = the longest prefix where c_i * (n - i + 1) <= B - S_{i-1}
    a_i = c_i                       for i <= k*   (capped)
    a_i = u + [i - k* <= rem]       for i >  k*   (uniform remainder)
        with u = (B - S_{k*}) // (n - k*), rem = (B - S_{k*}) % (n - k*)

Everything is INTEGER arithmetic (long tokens; the division remainder is
distributed deterministically to the first sources in sort order), so the
allocation is byte-identical under any partitioning and exactly
re-derivable by the DuckDB window-SQL oracle; a loop-form Python reference
differential-tests the closed form in pytest.

Scale shape: ONE corpus-wide groupBy on source (map-side partial agg; the
result has one row per source — dozens, not billions), then window math
over that bounded table. No driver logic, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .corpus_filters import _tokens


def unimax_allocation(
    docs: DataFrame,
    *,
    budget_divisor: int = 2,
    max_epochs: int = 2,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source UniMax token allocation.

    The budget is ``total_tokens // budget_divisor`` (derived from the
    corpus itself so both engines state it identically). Returns
    (source, tokens, cap, allocation, epochs_milli) where epochs_milli =
    allocation * 1000 // tokens."""
    per = (
        docs.select(
            F.col(source_col).alias("source"),
            F.size(_tokens(F.col(text_col))).cast("long").alias("n"),
        )
        .groupBy("source")
        .agg(F.sum("n").alias("tokens"))
        .withColumn("cap", F.col("tokens") * max_epochs)
    )
    w = Window.orderBy("cap", "source")
    all_w = Window.partitionBy()
    # `div` (integral divide on longs) everywhere — '/' promotes to double
    # and loses exactness above 2^53, which 100 TB token counts can reach
    ranked = (
        per.withColumn("rank", F.row_number().over(w))
        .withColumn("s_incl", F.sum("cap").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("n_src", F.count(F.lit(1)).over(all_w))
        .withColumn("_total", F.sum("tokens").over(all_w))
        .withColumn("budget", F.expr(f"_total div {int(budget_divisor)}"))
        .drop("_total")
    )
    capped = ranked.withColumn(
        "is_capped",
        F.col("cap") * (F.col("n_src") - F.col("rank") + 1)
        <= F.col("budget") - (F.col("s_incl") - F.col("cap")),
    )
    # k* = longest capped PREFIX (guard against any non-prefix stragglers)
    kstar = capped.withColumn(
        "k_star",
        F.max(F.when(F.col("is_capped") & (F.col("rank") == F.sum(F.col("is_capped").cast("int")).over(w.rowsBetween(Window.unboundedPreceding, 0))), F.col("rank"))).over(all_w),
    ).withColumn("k_star", F.coalesce(F.col("k_star"), F.lit(0)))
    sk = kstar.withColumn(
        "s_k",
        F.coalesce(
            F.max(F.when(F.col("rank") == F.col("k_star"), F.col("s_incl"))).over(all_w),
            F.lit(0).cast("long"),
        ),
    )
    # greatest(m, 1): when every source is capped (k* = n) the uniform
    # branch is dead but must not divide by zero under ANSI
    final = (
        sk.withColumn(
            "m", F.greatest(F.col("n_src") - F.col("k_star"), F.lit(1)).cast("long")
        )
        .withColumn("leftover", (F.col("budget") - F.col("s_k")).cast("long"))
        .withColumn("u", F.expr("leftover div m"))
        .withColumn("rem", F.col("leftover") - F.col("u") * F.col("m"))
        .withColumn(
            "allocation",
            F.when(F.col("rank") <= F.col("k_star"), F.col("cap"))
            .otherwise(
                F.col("u")
                + F.when(F.col("rank") - F.col("k_star") <= F.col("rem"), 1).otherwise(0)
            )
            .cast("long"),
        )
    )
    return final.select(
        "source",
        "tokens",
        "cap",
        "allocation",
        F.when(
            F.col("tokens") > 0,
            F.expr("(allocation * 1000) div greatest(tokens, 1)"),
        )
        .otherwise(0)
        .cast("long")
        .alias("epochs_milli"),
    )


def alpha_half_allocation(
    docs: DataFrame,
    *,
    budget_divisor: int = 2,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """XLM-style temperature sampling at alpha = 1/2 (Lample & Conneau
    2019 §3.1: sample sources with p_j ∝ n_j^alpha to upweight the tail;
    alpha=0.5 is their multilingual setting) — the smooth complement of
    :func:`unimax_allocation`'s hard caps.

    alpha = 1/2 is chosen deliberately for EXACTNESS: IEEE 754 requires
    sqrt to be correctly rounded (unlike pow/exp/ln), so
    ``floor(sqrt(tokens))`` is bit-identical in every engine and the
    whole allocation stays in integer arithmetic:

    - w_j = floor(sqrt(tokens_j))
    - budget = total_tokens div budget_divisor
    - base_j = (budget * w_j) div W,  W = sum w_j   (fits long up to
      ~1e12-token corpora x 1e6 weights; lift to decimal(38,0) beyond,
      the pagerank_hosts pattern)
    - the leftover budget - sum(base_j) < n_sources goes +1 each to the
      largest remainders (budget*w_j mod W), ties broken by source name —
      the deterministic largest-remainder method.

    One groupBy(source) + bounded window math over the per-source table
    (sources number in the hundreds at corpus scale): same shuffle shape
    as unimax.  Output: (source, tokens, weight, allocation,
    sample_milli = allocation*1000 div tokens)."""
    per = (
        docs.select(
            F.col(source_col).alias("source"),
            F.size(_tokens(F.col(text_col))).cast("long").alias("n"),
        )
        .groupBy("source")
        .agg(F.sum("n").alias("tokens"))
        .withColumn("weight", F.floor(F.sqrt(F.col("tokens"))).cast("long"))
    )
    all_w = Window.partitionBy()
    rem_w = Window.orderBy(
        F.desc("rem"), F.asc("source")
    )
    sized = (
        per.withColumn("_total", F.sum("tokens").over(all_w))
        .withColumn("budget", F.expr(f"_total div {int(budget_divisor)}"))
        .withColumn("w_sum", F.sum("weight").over(all_w))
        .withColumn("base", F.expr("(budget * weight) div greatest(w_sum, 1)"))
        .withColumn("rem", F.expr("(budget * weight) % greatest(w_sum, 1)"))
        .withColumn("leftover", F.col("budget") - F.sum("base").over(all_w))
    )
    final = sized.withColumn("rank", F.row_number().over(rem_w)).withColumn(
        "allocation",
        (F.col("base") + F.when(F.col("rank") <= F.col("leftover"), 1).otherwise(0)).cast(
            "long"
        ),
    )
    return final.select(
        "source",
        "tokens",
        "weight",
        "allocation",
        F.when(
            F.col("tokens") > 0,
            F.expr("(allocation * 1000) div greatest(tokens, 1)"),
        )
        .otherwise(0)
        .cast("long")
        .alias("sample_milli"),
    )
