"""Deterministic Bloom prefilter — the semi-join-reduction pattern for
crawl-frontier dedup at scale.

Checking "is this url already crawled?" against a multi-billion-row
lineage table is an anti-join whose build side dwarfs memory. The classic
mitigation (Spark's own runtime-filter injection does the same under the
hood) is a Bloom prefilter: probe rows that cannot be in the build side
skip the exact join entirely; only candidate hits pay the shuffle.

This implementation is fully DETERMINISTIC (portable polynomial hash with
k salts over m bits — no RNG, no JVM-version-dependent hashing), so the
bit set and every verdict are exactly re-derivable by the DuckDB oracle
and byte-identical under any partitioning:

- :func:`bloom_bits` — build: url -> k bit positions, ONE distinct over
  the position space (<= m rows out regardless of corpus size; map-side
  partial dedup does the heavy lifting).
- :func:`bloom_probe` — probe: a row is a *candidate* iff all k of its
  positions are set; counted with ONE aggregated semi-join on position.
  No false negatives by construction (a membership test asserts this);
  false positives are the documented price and are resolved by the exact
  anti-join that follows.

Reference analog: the predicted-cache probe
(/root/reference/models/detection/base_detector.py:170-207) is an O(1)
dict lookup per input; the Bloom prefilter is its distributed form when
the "dict" is billions of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .corpus_filters import POLY_MOD, POLY_MULT


def _positions(col, *, m_bits: int, k: int):
    """k deterministic bit positions for a string: fold the poly hash with
    k salt prefixes. Returns an array<long> column."""

    def one(salt: int):
        chars = F.filter(F.split(col, ""), lambda c: c != "")
        codes = F.transform(chars, F.ascii)
        return F.aggregate(
            codes,
            F.lit(salt).cast("long"),
            lambda acc, x: (acc * POLY_MULT + x.cast("long")) % POLY_MOD,
        ) % m_bits

    return F.array(*[one(1000003 * (i + 1)) for i in range(k)])


def bloom_bits(
    df: DataFrame, key_col: str = "url", *, m_bits: int = 1 << 20, k: int = 3
) -> DataFrame:
    """Build side: distinct set bit positions (single column ``pos``).
    At most ``m_bits`` rows out, whatever the input size."""
    return (
        df.select(F.explode(_positions(F.col(key_col), m_bits=m_bits, k=k)).alias("pos"))
        .distinct()
    )


def bloom_probe(
    probe: DataFrame,
    bits: DataFrame,
    key_col: str = "url",
    *,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Probe side: adds ``candidate`` (all k positions set). The join
    ships only (row-id, position) pairs; the bit table is <= m_bits rows,
    so Catalyst broadcasts it at any realistic m."""
    keyed = probe.withColumn(
        "_pos", _positions(F.col(key_col), m_bits=m_bits, k=k)
    ).withColumn("_rid", F.monotonically_increasing_id())
    exploded = keyed.select("_rid", F.explode("_pos").alias("pos"))
    hits = (
        exploded.join(bits, "pos", "left_semi")
        .groupBy("_rid")
        .agg(F.count(F.lit(1)).alias("_nhit"))
    )
    return (
        keyed.join(hits, "_rid", "left")
        .withColumn("candidate", F.coalesce(F.col("_nhit"), F.lit(0)) == k)
        .drop("_pos", "_rid", "_nhit")
    )
