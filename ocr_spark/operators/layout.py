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
