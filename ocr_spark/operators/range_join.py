"""Bucketed range (interval) join — equi-join machinery for the
``point BETWEEN lo AND hi`` predicate Spark would otherwise plan as a
broadcast-nested-loop / cartesian filter.

The crawl-pipeline use is enrichment against interval tables: IPv4 ->
ASN/geo blocks (server location for politeness and dedup-by-mirror),
timestamp -> crawl-wave windows, byte-offset -> WARC segment. At 100 TB
the nested-loop plan is quadratic wall-clock; the standard fix (what
Databricks' range-join optimization and postgres GiST both amount to) is
PREFIX BUCKETING: pick a bucket width 2^bits, explode each interval to
the buckets it overlaps (fan-out = width/2^bits + 1, bounded for bounded
intervals), bucket each point by its prefix, hash-equi-join on the
bucket id, and re-check the exact predicate. One narrow explode + ONE
hash join — shuffle proportional to data, never to |points| x |ranges|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def bucketed_range_join(
    points: DataFrame,
    ranges: DataFrame,
    *,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_bits: int = 20,
    how: str = "inner",
) -> DataFrame:
    """Join every point row to the range rows whose ``[lo, hi]`` contains
    ``point_col``. ``how`` may be ``inner`` or ``left`` (unmatched points
    survive with NULL range columns). Intervals may overlap (a point can
    match several); callers with non-overlapping tables get <= 1 match.

    The bucket width 2^bucket_bits trades explode fan-out (wide
    intervals -> more bucket rows) against join selectivity (narrow
    buckets -> fewer false candidates re-checked by the exact
    predicate). Both sides are exact-filtered after the equi-join, so
    the parameter affects ONLY performance, never results."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    width = 1 << bucket_bits
    # integral `div`, not float `/`: exact for the full long range
    r = ranges.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"cast(`{lo_col}` as long) div {width}"),
                F.expr(f"cast(`{hi_col}` as long) div {width}"),
            )
        ),
    )
    p = points.withColumn("_bucket", F.expr(f"cast(`{point_col}` as long) div {width}"))
    cond = (p["_bucket"] == r["_bucket"]) & F.col(point_col).between(
        F.col(lo_col), F.col(hi_col)
    )
    joined = p.join(r, cond, how).drop("_bucket")
    return joined
