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

from .sketches import _MULTS, _poly_hash_m


def _positions(col, *, m_bits: int, k: int):
    """k deterministic bit positions for a string: the portable poly hash
    folded from k salt initializers AND k distinct multipliers. Salted
    inits alone give affinely-related hashes (h_i = base + salt_i*31^len
    mod p), so same-length keys whose base hashes differ by a multiple of
    m collide in ALL k positions at once — an effective k=1 filter. The
    per-position multipliers (sketches._MULTS) make the k functions
    independent. Returns an array<long> column."""
    if k > len(_MULTS):
        raise ValueError(f"k must be <= {len(_MULTS)} (one multiplier per hash)")
    return F.array(
        *[
            _poly_hash_m(col, init=1000003 * (i + 1), mult=_MULTS[i]) % m_bits
            for i in range(k)
        ]
    )


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
    """Probe side: adds ``candidate`` (all k positions set).

    The verdict is a pure function of the KEY STRING, so it is computed
    once per DISTINCT key and equi-joined back — no row ids (a
    monotonically_increasing_id here would be re-evaluated on both sides
    of a self-join and is NOT stable across task retries), duplicate probe
    rows trivially preserved. The join ships (key, position) pairs only
    for distinct keys; the bit table is <= m_bits rows, so Catalyst
    broadcasts it at any realistic m."""
    keys = probe.select(F.col(key_col).alias("_k")).distinct()
    exploded = keys.select(
        "_k", F.explode(_positions(F.col("_k"), m_bits=m_bits, k=k)).alias("pos")
    )
    verdicts = (
        exploded.join(bits, "pos", "left_semi")
        .groupBy("_k")
        .agg((F.count(F.lit(1)) == k).alias("_cand"))
    )
    return (
        probe.join(verdicts, probe[key_col] == verdicts["_k"], "left")
        .withColumn("candidate", F.coalesce(F.col("_cand"), F.lit(False)))
        .drop("_k", "_cand")
    )
