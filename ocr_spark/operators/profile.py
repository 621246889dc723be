"""Single-pass table profiling — the DESCRIBE-EXTENDED/data-quality
summary every ingestion pipeline runs before trusting a new crawl drop:
per column, row count, null count, exact distinct count, lexical/numeric
min and max.

Scale shape: ONE scan. All per-column aggregates land in a single wide
``agg`` (Spark plans one hash-aggregate with partial+final phases —
count-distinct expands to the standard expand-node rewrite), then the one
result row unpivots with ``stack``. Profiling a 100 TB table must never
be a per-column loop of jobs; this is the one-pass formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PROFILE_SCHEMA = (
    "column string, n_rows long, n_nulls long, n_distinct long, "
    "min_str string, max_str string"
)


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_nulls, n_distinct,
    min_str, max_str). min/max are computed on the native type (numeric
    order for numbers, lexicographic for strings) and rendered as
    strings so the output schema is column-type-independent."""
    cols = list(cols) if cols is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).cast("long").alias(f"{c}__nn"),
            F.countDistinct(F.col(c)).cast("long").alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', `{c}__nn`, `{c}__nd`, `{c}__min`, `{c}__max`" for c in cols
    )
    return row.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack})"
        " as (column, __nn, n_distinct, min_str, max_str)",
    ).select(
        "column",
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("__nn")).cast("long").alias("n_nulls"),
        "n_distinct",
        "min_str",
        "max_str",
    )
