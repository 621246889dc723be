"""Storage-level CDC payload dedup: content-defined chunks over binary
columns, chunk-hash reference counting, storage-savings rollup.

The crawl-archive use: WARC payload stores and revisit records dedupe at
chunk granularity, so a mega-site's template boilerplate or a mirror's
shifted body is stored once even when whole-payload digests differ
(kernels/cdc.py explains the boundary scheme).  Scale shape:

- chunking is ONE Arrow stage over the payload scan — zero exchanges,
  no per-row Python (batched mapInPandas);
- reference counting is a single groupBy on the 128-bit chunk hash —
  map-side partial agg, uniformly distributed keys (hash keys cannot be
  skewed), so the exchange is balanced by construction at any corpus
  size;
- the savings rollup is a bounded second aggregate over the ref table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CHUNK_SCHEMA = "blob_id long, chunk_idx int, offset int, length int, chunk_md5 string"


def payload_chunks(
    df: DataFrame,
    *,
    blob_col: str = "blob",
    id_col: str = "blob_id",
    window: int = 8,
    divisor: int = 64,
    min_size: int = 1,
    max_size: int | None = None,
) -> DataFrame:
    """Content-defined chunk table: one row per chunk with (offset,
    length, md5).  NULL / empty payloads yield zero rows (the crawl-side
    no-task-failure contract).  Defaults are the pure divisor rule; pass
    ``min_size``/``max_size`` for production floors/ceilings."""

    def gen(batches):
        import pandas as pd

        from ..kernels.cdc import cdc_chunks

        for pdf in batches:
            ids, idxs, offs, lens, md5s = [], [], [], [], []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    continue
                for ci, (off, ln, h) in enumerate(
                    cdc_chunks(
                        bytes(blob),
                        window=window,
                        divisor=divisor,
                        min_size=min_size,
                        max_size=max_size,
                    )
                ):
                    ids.append(int(bid))
                    idxs.append(ci)
                    offs.append(off)
                    lens.append(ln)
                    md5s.append(h)
            yield pd.DataFrame(
                {
                    "blob_id": pd.array(ids, dtype="int64"),
                    "chunk_idx": pd.array(idxs, dtype="int32"),
                    "offset": pd.array(offs, dtype="int32"),
                    "length": pd.array(lens, dtype="int32"),
                    "chunk_md5": pd.array(md5s, dtype="string"),
                }
            )

    return df.mapInPandas(gen, schema=CHUNK_SCHEMA)


def chunk_refs(chunks: DataFrame) -> DataFrame:
    """Chunk rows annotated with the corpus-wide reference count of their
    hash — ref_count > 1 marks bytes the store keeps only once.  One
    window exchange on the uniformly-hashed chunk key."""
    w = Window.partitionBy("chunk_md5")
    return chunks.withColumn("ref_count", F.count(F.lit(1)).over(w).cast("int"))


def storage_savings(chunks: DataFrame) -> DataFrame:
    """Corpus rollup: logical bytes (every reference), stored bytes (one
    copy per distinct chunk), saved bytes.  Two bounded aggregates."""
    per_chunk = chunks.groupBy("chunk_md5").agg(
        F.first("length").alias("length"),
        F.count(F.lit(1)).alias("refs"),
    )
    return per_chunk.agg(
        F.sum(F.col("length") * F.col("refs")).alias("logical_bytes"),
        F.sum("length").alias("stored_bytes"),
        (F.sum(F.col("length") * F.col("refs")) - F.sum("length")).alias(
            "saved_bytes"
        ),
    )
