"""JSONL.gz training export — the Dolma-shaped handoff format.

LLM training stacks ingest corpora as gzipped JSON-Lines shards with one
document object per line (AI2 Dolma, RedPajama, FineWeb all ship this
shape): ``{"id", "text", "source", "added", "metadata": {...}}``. This
sink closes the pipeline: extracted table in, training-ready shards out,
readable back with ``spark.read.json`` (Spark decompresses ``.gz``
natively — the round-trip needs no custom reader).

Same determinism contract as the WET/WAT sinks: ONE mapInPandas pass,
files written FROM the executors (no collect), canonical JSON
(sort_keys + tight separators), ``sortWithinPartitions(url)`` line
order, fixed gzip mtime, content-addressed shard names so re-runs are
idempotent. ``id`` is the sha256 of the url — stable across crawls, the
natural join key back to lineage/CDX.

Returns the manifest (path, n_records, n_bytes); writing happens as the
action runs.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import hashlib
import json
import os

from pyspark.sql import DataFrame

JSONL_MANIFEST_SCHEMA = "path string, n_records long, n_bytes long"


def jsonl_line(url: str, ts, text: str, lang, *, source: str) -> bytes:
    if ts is None or ts != ts:  # None or NaT
        ts = _dt.datetime(2026, 1, 1)
    obj = {
        "added": ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
        "id": hashlib.sha256(url.encode()).hexdigest(),
        "metadata": {"lang": (lang if lang else None), "url": url},
        "source": source,
        "text": text,
    }
    return json.dumps(obj, sort_keys=True, separators=(",", ":"), ensure_ascii=False).encode(
        "utf-8"
    ) + b"\n"


def export_jsonl(df: DataFrame, out_dir: str, *, source: str = "ocr_spark") -> DataFrame:
    """(url, warc_ts, text[, lang]) -> .jsonl.gz shards under ``out_dir``;
    returns the manifest. One python stage; empty partitions write
    nothing."""
    os.makedirs(out_dir, exist_ok=True)
    cols = ["url", "warc_ts", "text"] + (["lang"] if "lang" in df.columns else [])

    def gen(batches):
        import pandas as pd

        os.makedirs(out_dir, exist_ok=True)
        lines = bytearray()
        n = 0
        for pdf in batches:
            langs = pdf["lang"] if "lang" in pdf.columns else [None] * len(pdf)
            for url, ts, text, lang in zip(pdf["url"], pdf["warc_ts"], pdf["text"], langs):
                lines += jsonl_line(str(url), ts, str(text), lang, source=source)
                n += 1
        if n:
            import io

            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(bytes(lines))
            blob = buf.getvalue()
            name = f"part-{hashlib.sha256(blob).hexdigest()[:16]}.jsonl.gz"
            path = os.path.join(out_dir, name)
            with open(path, "wb") as f:
                f.write(blob)
            yield pd.DataFrame(
                {"path": [path], "n_records": [n], "n_bytes": [len(blob)]}
            )

    return (
        df.select(*cols)
        .sortWithinPartitions("url")
        .mapInPandas(gen, schema=JSONL_MANIFEST_SCHEMA)
    )
