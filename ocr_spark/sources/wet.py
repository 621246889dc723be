"""WET export — Common Crawl's standard extracted-text derivative.

``export_wet`` turns an extracted table (url, warc_ts, text) into
``*.warc.wet.gz`` files: WARC/1.0 ``conversion`` records, per-partition
files written FROM THE EXECUTORS (one mapInPandas pass, no collect),
content-addressed filenames (sha256 of the member bytes) so re-runs are
idempotent and the export is byte-deterministic (fixed gzip mtime,
sortWithinPartitions(url) record order). The returned manifest DataFrame
(path, n_records, n_bytes) is what the caller commits/inspects — writing
happens as the action runs.

Round-trip guarantee: our own reader (sources/warc.read_warc_pages)
parses ``conversion`` records, so export -> read returns the identical
(url, text) set — pinned by tests/test_warc.py.

Sandbox note: files land on the executor-visible filesystem (local/NFS);
an object-store deployment would swap the `open()` for its client in the
same generator.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import hashlib
import io
import os

from pyspark.sql import DataFrame


def wet_record(url: str, ts, text: str, seq: int = 0) -> bytes:
    body = text.encode("utf-8")
    # NaT is truthy and strftime-hostile; treat it like None
    if ts is None or ts != ts:
        ts = _dt.datetime(2026, 1, 1)
    ts_s = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
    # Globally unique AND deterministic: a name-based (v5-shaped) UUID from
    # the record identity (url, date, body) — partition-local counters would
    # collide across files and break WARC's unique-record-ID requirement.
    d = hashlib.sha256(url.encode() + b"\x00" + ts_s.encode() + b"\x00" + body)
    h = bytearray(d.digest()[:16])
    h[6] = (h[6] & 0x0F) | 0x50
    h[8] = (h[8] & 0x3F) | 0x80
    x = h.hex()
    rid = f"{x[:8]}-{x[8:12]}-{x[12:16]}-{x[16:20]}-{x[20:32]}"
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        + b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">\r\n"
        + b"WARC-Target-URI: " + url.encode() + b"\r\n"
        + b"WARC-Date: " + ts_s.encode() + b"\r\n"
        + b"Content-Type: text/plain\r\n"
        + b"Content-Length: %d\r\n\r\n" % len(body)
    )
    return head + body + b"\r\n\r\n"


def export_wet(df: DataFrame, out_dir: str) -> DataFrame:
    """(url, warc_ts, text) -> .wet.gz files under ``out_dir``; returns
    the manifest (path, n_records, n_bytes). One python stage; empty
    partitions write nothing."""
    os.makedirs(out_dir, exist_ok=True)

    def gen(batches):
        import pandas as pd

        # executors don't share the driver's filesystem view on a real
        # cluster — create the target dir where the write happens
        os.makedirs(out_dir, exist_ok=True)
        members = bytearray()
        n = 0
        for pdf in batches:
            for url, ts, text in zip(pdf["url"], pdf["warc_ts"], pdf["text"]):
                rec = wet_record(str(url), ts, str(text), n)
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                    gz.write(rec)
                members += buf.getvalue()
                n += 1
        if n:
            blob = bytes(members)
            name = f"part-{hashlib.sha256(blob).hexdigest()[:16]}.warc.wet.gz"
            path = os.path.join(out_dir, name)
            with open(path, "wb") as f:
                f.write(blob)
            yield pd.DataFrame(
                {"path": [path], "n_records": [n], "n_bytes": [len(blob)]}
            )

    return (
        df.select("url", "warc_ts", "text")
        .sortWithinPartitions("url")
        .mapInPandas(gen, schema="path string, n_records long, n_bytes long")
    )
