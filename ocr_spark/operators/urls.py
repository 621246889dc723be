"""URL canonicalization + URL-level dedup — crawl-pipeline staples.

Common-Crawl corpora carry the same page under many URL spellings; URL
canonicalization collapses them before any content work. Semantics
(documented, pinned by tests and the fixture oracle):

- scheme and host lowercased; default ports (:80 http, :443 https) dropped;
- fragment removed; tracking parameters (utm_*, fbclid, gclid, msclkid,
  ref, mc_cid, mc_eid) removed;
- remaining query parameters SORTED by (key, value) for order-insensitive
  equality; empty query drops the '?';
- path '.'/'..' segments resolved, duplicate slashes collapsed (a POSIX
  leading '//' is preserved by normpath), and a bare-root '' path
  becomes '/'.

Pure stdlib urllib parsing inside an Arrow-batched mapInPandas (string in,
string out — one narrow python stage, no shuffle).
"""

from __future__ import annotations

import posixpath
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

from pyspark.sql import DataFrame

_TRACKING = ("fbclid", "gclid", "msclkid", "ref", "mc_cid", "mc_eid")


def canonical_url(url: str) -> str:
    url = url.strip()
    if not url:
        return ""
    try:
        parts = urlsplit(url)
        # .hostname/.port validate lazily and can ALSO raise (e.g. port
        # 99999 or 'abc' — routine in crawl data), so they stay inside the
        # guard: one malformed URL must never fail the task
        host = parts.hostname.lower() if parts.hostname else ""
        port = parts.port
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    if port and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        host = f"{host}:{port}"
    userinfo = ""
    if parts.username:
        userinfo = parts.username
        if parts.password:
            userinfo += f":{parts.password}"
        userinfo += "@"

    path = parts.path or "/"
    # resolve ./.. and collapse duplicate slashes
    path = posixpath.normpath(path)
    if parts.path.endswith("/") and not path.endswith("/"):
        path += "/"
    if path == ".":
        path = "/"

    params = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if not (k.lower().startswith("utm_") or k.lower() in _TRACKING)
    ]
    query = urlencode(sorted(params))
    return urlunsplit((scheme, userinfo + host, path, query, ""))


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out = pdf[[c for c in pdf.columns]].copy()
            out["canonical_url"] = [canonical_url(str(u)) for u in pdf[url_col]]
            yield out

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(gen, schema=schema + ", canonical_url string")
