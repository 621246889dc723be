"""Inverted-index export — the search-index product of a crawl, as a
Spark sink in the WET/CDXJ family (content-addressed shards written from
executors + a range manifest).

Layout (one line per posting BLOCK, term-sorted shards):

    <term>\t<base_doc>\t[[gap,tf],...]

- tf table: ONE (term, doc_id) groupBy (map-side partial agg).
- BLOCKED postings: ``block = doc_id // block_size`` joins the groupBy
  key, so a stop word's posting list never materializes in one reducer
  row — per-key state is bounded by ``block_size`` postings, the way
  real index builders cap posting blocks. Hot terms cost network
  balance, not executor memory.
- within a block, postings sort by doc_id and store FIRST-ABSOLUTE +
  GAP encoding (the classic d-gap compression shape; json-encoded here —
  swapping in varint bytes is a pure format change).
- ``repartitionByRange(term, base_doc)`` + sortWithinPartitions is the
  distributed total-order sort: shards are term-ordered, the manifest's
  (first_term, last_term) ranges are disjoint, and a term lookup prunes
  to the few shards whose range covers it (the cluster.idx pattern,
  see sources/cdx.lookup_cdxj).
- shards are gzip members with fixed mtime and content-addressed names:
  re-running the same corpus rewrites byte-identical files (idempotent).

Reference analog: none (the reference is an OCR engine); this is part of
the corpus-product surface next to BM25 (operators/search.py) — BM25
answers queries online, this ships the offline index artifact.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import json
import os

from pyspark.sql import DataFrame, functions as F

from ..operators.corpus_filters import _tokens

POSTINGS_SCHEMA = (
    "path string, first_term string, last_term string,"
    " n_blocks long, n_postings long, n_bytes long"
)


def term_frequencies(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, text) -> (term, doc_id, tf): explode + ONE composite-key
    groupBy; lowercased whitespace tokens (matches operators/search.bm25)."""
    toks = _tokens(F.lower(F.col(text_col)))
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )


def export_postings(
    docs: DataFrame,
    out_dir: str,
    *,
    shards: int = 8,
    block_size: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Write term-sorted blocked posting shards under ``out_dir``; returns
    the manifest (path, first_term, last_term, n_blocks, n_postings,
    n_bytes). Exchanges: tf groupBy -> block groupBy -> ONE range sort."""
    os.makedirs(out_dir, exist_ok=True)
    tf = term_frequencies(docs, text_col=text_col, id_col=id_col)
    blocks = (
        tf.withColumn("block", F.expr(f"doc_id div {int(block_size)}"))
        .groupBy("term", "block")
        .agg(
            F.sort_array(F.collect_list(F.struct("doc_id", "tf"))).alias("ps"),
        )
        .select(
            "term",
            F.col("ps")[0]["doc_id"].alias("base_doc"),
            F.col("ps").alias("ps"),
        )
    )

    def gen(batches):
        import pandas as pd

        os.makedirs(out_dir, exist_ok=True)
        lines = []
        n_post = 0
        for pdf in batches:
            for term, base, ps in zip(pdf["term"], pdf["base_doc"], pdf["ps"]):
                prev = None
                enc = []
                for p in ps:
                    d, t = int(p["doc_id"]), int(p["tf"])
                    enc.append([d - (prev if prev is not None else int(base)), t])
                    prev = d
                n_post += len(enc)
                lines.append(
                    f"{term}\t{int(base)}\t{json.dumps(enc, separators=(',', ':'))}\n"
                )
        if lines:
            payload = "".join(lines).encode("utf-8")
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(payload)
            blob = buf.getvalue()
            name = f"postings-{hashlib.sha256(blob).hexdigest()[:16]}.idx.gz"
            path = os.path.join(out_dir, name)
            with open(path, "wb") as f:
                f.write(blob)
            yield pd.DataFrame(
                {
                    "path": [path],
                    "first_term": [lines[0].split("\t", 1)[0]],
                    "last_term": [lines[-1].split("\t", 1)[0]],
                    "n_blocks": [len(lines)],
                    "n_postings": [n_post],
                    "n_bytes": [len(blob)],
                }
            )

    return (
        blocks.repartitionByRange(shards, "term", "base_doc")
        .sortWithinPartitions("term", "base_doc")
        .mapInPandas(gen, schema=POSTINGS_SCHEMA)
    )


def read_postings(path: str) -> list[dict]:
    """Parse one shard -> [{term, doc_id, tf}] in (term, doc_id) order."""
    out = []
    with gzip.open(path, "rt", encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            term, base, enc = line.split("\t", 2)
            doc = int(base)
            first = True
            for gap, tf in json.loads(enc):
                doc = doc + gap if not first else int(base) + gap
                first = False
                out.append({"term": term, "doc_id": doc, "tf": tf})
    return out


def lookup_postings(spark, manifest: DataFrame, term: str) -> DataFrame:
    """Distributed single-term lookup: the manifest range predicate prunes
    shards (the secondary-index binary-search role), then ONE Arrow stage
    scans only surviving shards for the term."""
    hits = manifest.where(
        (F.col("first_term") <= F.lit(term)) & (F.col("last_term") >= F.lit(term))
    ).select("path")

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for path in pdf["path"]:
                rows.extend(r for r in read_postings(path) if r["term"] == term)
            yield pd.DataFrame(rows, columns=["term", "doc_id", "tf"])

    return hits.mapInPandas(gen, schema="term string, doc_id long, tf int")
