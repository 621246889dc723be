"""CDXJ url-index export — the cc-index companion to the WET sink.

Common Crawl publishes its url index as SURT-sorted CDXJ shards plus a
secondary index of each shard's key range, so a lookup binary-searches the
tiny range table and then ONE shard. ``export_cdxj`` is that build as a
Spark job:

- each page becomes one line ``<SURT> <ts14> {json}`` (json carries url,
  sha256 payload digest, byte length — key order pinned by the struct);
- ``repartitionByRange(surt, ts14)`` + ``sortWithinPartitions`` is the
  distributed total-order sort (Spark's RangePartitioner samples split
  points — record ORDER is deterministic, shard boundary PLACEMENT may
  move between runs; the manifest records the realized ranges, which is
  exactly what the cc-index cluster.idx does);
- shards are gzip members with fixed mtime, content-addressed filenames
  (sha256 of bytes) written FROM THE EXECUTORS — no collect, re-runs that
  produce the same shard bytes are idempotent;
- the returned manifest (path, first_key, last_key, n_records, n_bytes)
  is the secondary index: ranges are disjoint by construction.

Round-trip guarantee: ``read_cdxj`` parses the shards back; export ->
read returns the identical (surt, ts14, url, digest, length) set and a
globally sorted key sequence when shards are read in manifest order —
pinned by tests/test_cdx.py.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import json
import os

from pyspark.sql import DataFrame, functions as F

_TS_FALLBACK = "20260101000000"  # NaT/None warc_ts (matches the WET sink)


def export_cdxj(pages: DataFrame, out_dir: str, shards: int = 8) -> DataFrame:
    """(url, warc_ts, html) -> SURT-sorted .cdxj.gz shards under
    ``out_dir``; returns the manifest (path, first_key, last_key,
    n_records, n_bytes). One range exchange (the sort IS the product) +
    one python write stage."""
    from ..operators.urls import surt_keys

    os.makedirs(out_dir, exist_ok=True)

    ts14 = F.coalesce(
        F.date_format("warc_ts", "yyyyMMddHHmmss"), F.lit(_TS_FALLBACK)
    )
    # the line format is space-delimited: a space inside the SURT (urls
    # with unescaped spaces survive real crawls) would shear the key off
    # at read time. Encode BEFORE the range sort so file order == key
    # order, matching cc-index's percent-encoded key convention.
    rows = surt_keys(pages).select(
        F.regexp_replace("surt", " ", "%20").alias("surt"),
        ts14.alias("ts14"),
        F.to_json(
            F.struct(
                F.col("url"),
                F.sha2(F.col("html"), 256).alias("digest"),
                F.coalesce(F.length("html"), F.lit(0))
                .cast("long")
                .alias("length"),
            )
        ).alias("meta"),
    )

    def gen(batches):
        import pandas as pd

        os.makedirs(out_dir, exist_ok=True)
        lines = []
        for pdf in batches:
            for surt, ts, meta in zip(pdf["surt"], pdf["ts14"], pdf["meta"]):
                lines.append(f"{surt} {ts} {meta}\n")
        if lines:
            payload = "".join(lines).encode("utf-8")
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(payload)
            blob = buf.getvalue()
            name = f"cdx-{hashlib.sha256(blob).hexdigest()[:16]}.cdxj.gz"
            path = os.path.join(out_dir, name)
            with open(path, "wb") as f:
                f.write(blob)
            first = lines[0].split(" ", 2)
            last = lines[-1].split(" ", 2)
            yield pd.DataFrame(
                {
                    "path": [path],
                    "first_key": [f"{first[0]} {first[1]}"],
                    "last_key": [f"{last[0]} {last[1]}"],
                    "n_records": [len(lines)],
                    "n_bytes": [len(blob)],
                }
            )

    return (
        rows.repartitionByRange(shards, "surt", "ts14", "meta")
        .sortWithinPartitions("surt", "ts14", "meta")
        .mapInPandas(
            gen,
            schema="path string, first_key string, last_key string,"
            " n_records long, n_bytes long",
        )
    )


def read_cdxj(path: str) -> list[dict]:
    """Parse one .cdxj.gz shard -> [{surt, ts14, url, digest, length}],
    in file order (sorted by construction)."""
    out = []
    with gzip.open(path, "rt", encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            surt, ts, meta = line.split(" ", 2)
            d = json.loads(meta)
            out.append(
                {
                    "surt": surt,
                    "ts14": ts,
                    "url": d["url"],
                    "digest": d["digest"],
                    "length": d["length"],
                }
            )
    return out


def lookup_cdxj(spark, manifest: DataFrame, key_prefix: str) -> DataFrame:
    """Distributed prefix lookup against an exported CDXJ index:
    binary-search semantics over the manifest (the cluster.idx role),
    then read ONLY the shards whose realized [first_key, last_key] range
    intersects the prefix — the partition-pruning read path that makes
    the index an index.

    A shard can contain keys ``k >= key_prefix`` iff its last_key
    reaches the prefix, and keys ``k < key_prefix+MAX`` iff its
    first_key starts before the prefix's upper bound — both checks are
    driver-free Column predicates on the (tiny, one-row-per-shard)
    manifest. The surviving shard paths fan out to ONE Arrow read stage;
    rows are prefix-filtered as they stream out of the gzip member.
    Returns (surt, ts14, url, digest, length) in within-shard key order.
    """
    upper = key_prefix + "￿"
    pruned = manifest.where(
        (F.col("last_key") >= key_prefix) & (F.col("first_key") < upper)
    ).select("path")

    def gen(batches):
        import pandas as pd

        cols = ["surt", "ts14", "url", "digest", "length"]
        for pdf in batches:
            rows = []
            for path in pdf["path"]:
                for r in read_cdxj(path):
                    if f"{r['surt']} {r['ts14']}".startswith(key_prefix):
                        rows.append(r)
            yield pd.DataFrame(rows, columns=cols)

    return pruned.mapInPandas(
        gen,
        schema="surt string, ts14 string, url string, digest string,"
        " length long",
    )
