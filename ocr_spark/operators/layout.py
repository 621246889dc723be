"""Z-order (Morton) data layout keys.

Why: the catalog's commit-level zone maps (sources/catalog.read_pruned)
prune on per-commit min/max — which only bites when writes are CLUSTERED
on the pruned column. A crawl table is queried on two axes at once (host
for politeness/templates, time for incremental waves); sorting by either
one scatters the other. Interleaving the two keys' bits (Morton 1966;
what Iceberg/Delta expose as ``zorder by``) bounds BOTH ranges inside
any contiguous shard: fixing the top 2k bits of the z-value fixes the
top k bits of each axis, so range predicates on either column skip most
shards.

Everything here is pure Column algebra over non-negative bounded ints —
no UDF, no shuffle; the layout itself is ONE repartitionByRange on the
z-value (the sort Spark would do for any write-ordering). The bit
arithmetic is portable integer math, so the DuckDB oracle re-derives
every z-value exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(x: Column, y: Column, *, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints into a
    long: bit 2b of the result is x's bit b, bit 2b+1 is y's bit b."""
    xl, yl = x.cast("long"), y.cast("long")
    acc = F.lit(0).cast("long")
    for b in range(bits):
        acc = acc + F.shiftright(xl, b).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * b)
        ).cast("long")
        acc = acc + F.shiftright(yl, b).bitwiseAND(F.lit(1)) * F.lit(
            1 << (2 * b + 1)
        ).cast("long")
    return acc


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    bits: int = 16,
    n_shards: int = 16,
) -> DataFrame:
    """Append ``zval`` and ``shard`` (the top log2(n_shards) bits of the
    z-value). Writing shard-clustered (repartitionByRange on zval) makes
    the catalog's zone maps selective on BOTH source columns at once."""
    if n_shards & (n_shards - 1):
        raise ValueError("n_shards must be a power of two")
    shift = 2 * bits - n_shards.bit_length() + 1
    z = zorder_key(F.col(x_col), F.col(y_col), bits=bits)
    return df.withColumn("zval", z).withColumn(
        "shard", F.shiftright(F.col("zval"), shift).cast("int")
    )


def rendezvous_shard(key: Column, shards) -> Column:
    """Rendezvous / highest-random-weight sharding (Thaler & Ravishankar
    1998): shard(key) = argmax over shards of hash(key, shard). The
    property a 1000-node output sink needs: adding or removing ONE shard
    moves ONLY the keys whose argmax was that shard (~1/N of data) —
    unlike mod-N hashing, which reshuffles nearly everything. Stateless
    (no ring to store), pure Column algebra (one portable poly hash per
    candidate shard, argmax via struct GREATEST with the shard name as
    the deterministic tiebreak), so assignments are byte-identical
    across engines and the DuckDB oracle replays every argmax.

    Hash construction: ``square(poly(shard || '#' || key)) mod p``.
    Both pieces are load-bearing. Appending the shard instead
    (``poly(key || '#' || s)``) makes the per-shard hashes an AFFINE
    family — they differ by a key-independent constant, so ONE shard
    wins every argmax (measured: 100% of keys landed on one node).
    Prefixing the shard lets the multiplier mix it through every key
    char, and the squaring (the sketches' _rho nonlinearity; h^2 < 1e18
    stays exact in BIGINT in both engines) breaks the remaining
    same-length-key ring structure. Measured balance at 4/16/100
    shards: within ~10% of uniform; removing one shard moves exactly
    its own keys."""
    from .sketches import _REG_INIT, _REG_MULT, _poly_hash_m

    shards = list(shards)
    if len(shards) < 2:
        raise ValueError("rendezvous_shard needs at least 2 shards")
    structs = []
    for s in shards:
        h = _poly_hash_m(
            F.concat(F.lit(s + "#"), key), init=_REG_INIT, mult=_REG_MULT
        )
        h2 = (h * h) % F.lit(1_000_000_007).cast("bigint")
        structs.append(F.struct(h2.alias("h"), F.lit(s).alias("s")))
    return F.greatest(*structs).getField("s")
