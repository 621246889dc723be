"""HTTP response-header parsing + conditional-revalidation strategy.

A recrawl scheduler needs more than the adaptive interval
(:mod:`ocr_spark.operators.crawl_history` refresh_schedule): HTTP itself
tells the crawler HOW to refetch cheaply. ``ETag`` enables
``If-None-Match`` (byte-exact revalidation), ``Last-Modified`` enables
``If-Modified-Since``, ``Cache-Control: max-age`` bounds how long the
stored copy is trustworthy, and ``no-store`` forbids reuse outright.
This operator turns the raw header block archived with each WARC
response record into those typed columns plus a ``strategy`` decision,
so the frontier can be ranked by (next_due, cheapest-revalidation).

Parsing contract (pinned by unit tests + the closed-form oracle):

- input is the raw header block (status line + CRLF/LF header lines);
  scanning stops at the first blank line (never reads the body),
  header names are case-insensitive, FIRST occurrence wins, lines
  without a colon are ignored — malformed input degrades to NULL
  fields, never a task failure (the repo-wide byte-parser policy).
- ``last_modified_ms`` reuses :func:`ocr_spark.operators.feeds.
  parse_date_ms` — one tested RFC 822 implementation in the repo.
- ``max_age_s`` is the ``max-age`` directive (non-negative int;
  ``s-maxage`` is deliberately ignored: this is a private crawl cache).
- ``strategy``: ``refetch`` when ``no-store`` is present, else ``etag``
  when an ETag exists (weak or strong — If-None-Match allows weak),
  else ``last-modified``, else ``none``.

One Arrow-batched python stage, zero exchanges (plan-asserted) — the
same shape as the sitemap/feed/page-meta parsers, so it pipelines with
them per partition.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from .feeds import parse_date_ms

_STATUS_RE = re.compile(r"^HTTP/\d(?:\.\d)?\s+(\d{3})")
_MAX_AGE_RE = re.compile(r"(?:^|[,\s])max-age\s*=\s*\"?(\d+)\"?", re.IGNORECASE)
_CHARSET_RE = re.compile(r";\s*charset\s*=\s*\"?([A-Za-z0-9_.:+-]+)\"?", re.IGNORECASE)

HEADER_SCHEMA = (
    "struct<status:int,content_type:string,charset:string,etag:string,"
    "last_modified_ms:bigint,max_age_s:bigint,no_store:boolean,"
    "location:string,strategy:string>"
)

_NULL_ROW = {
    "status": None,
    "content_type": None,
    "charset": None,
    "etag": None,
    "last_modified_ms": None,
    "max_age_s": None,
    "no_store": False,
    "location": None,
    "strategy": "none",
}


def parse_http_headers(block: bytes | str) -> dict:
    """One raw response-header block -> typed dict (see module doc)."""
    out = dict(_NULL_ROW)
    if block is None:
        return out
    if isinstance(block, bytes):
        block = block.decode("latin-1", "replace")
    lines = block.splitlines()
    if not lines:
        return out
    m = _STATUS_RE.match(lines[0].strip())
    if m:
        out["status"] = int(m.group(1))
    headers: dict[str, str] = {}
    start = 1 if m else 0
    for line in lines[start:]:
        if not line.strip():
            break  # end of header section; never read into the body
        name, sep, value = line.partition(":")
        if not sep:
            continue
        key = name.strip().lower()
        if key and key not in headers:
            headers[key] = value.strip()
    ct = headers.get("content-type")
    if ct:
        out["content_type"] = ct.split(";", 1)[0].strip().lower() or None
        cm = _CHARSET_RE.search(ct)
        if cm:
            out["charset"] = cm.group(1).lower()
    etag = headers.get("etag")
    out["etag"] = etag if etag else None
    out["last_modified_ms"] = parse_date_ms(headers.get("last-modified"))
    out["location"] = headers.get("location") or None
    cc = headers.get("cache-control", "")
    if cc:
        out["no_store"] = bool(
            re.search(r"(?:^|[,\s])no-store(?:$|[,\s])", cc, re.IGNORECASE)
        )
        am = _MAX_AGE_RE.search(cc)
        if am:
            try:
                out["max_age_s"] = int(am.group(1))
            except (ValueError, OverflowError):
                pass
    if out["no_store"]:
        out["strategy"] = "refetch"
    elif out["etag"] is not None:
        out["strategy"] = "etag"
    elif out["last_modified_ms"] is not None:
        out["strategy"] = "last-modified"
    return out


def http_header_fields(
    responses: DataFrame, *, headers_col: str = "http_headers"
) -> DataFrame:
    """(url, http_headers) -> one typed row per response
    (url, status, content_type, charset, etag, last_modified_ms,
    max_age_s, no_store, location, strategy)."""

    @pandas_udf(HEADER_SCHEMA)
    def parse(blocks: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [
                parse_http_headers(
                    b if isinstance(b, (bytes, str)) or b is None else str(b)
                )
                for b in blocks
            ]
        )

    # alias the struct once, then expand: guarantees ONE udf evaluation
    return responses.select(
        "url", parse(headers_col).alias("h")
    ).select("url", "h.*")
