"""Page-head metadata extraction: title, rel=canonical, description,
html lang, hreflang alternates.

These five fields drive curation decisions the body text cannot:
``rel=canonical`` is the site's OWN dedup key (fold parameterized /
mirrored urls before any content hashing), ``hreflang`` alternates are
publisher-declared bitext pairs (stronger than URL-pattern mining),
``html lang`` seeds language routing before model-based langid, and
title/description feed search snippets and quality features.

Parsing contract (pinned by the closed-form oracle and unit tests):
only the first ``HEAD_BYTES`` of the document are scanned (the head
region; bounds per-row cost at crawl scale), attributes match in any
order with any quoting, the FIRST occurrence of title/canonical/
description wins, canonical hrefs resolve RFC-3986-relative against the
page url, and malformed bytes yield NULL fields, never a task failure —
the same degradation policy as every byte parser in this repo.

One Arrow-batched python stage, zero exchanges (plan-asserted), so it
pipelines with the flagship extractor per partition.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from pyspark.sql import DataFrame

HEAD_BYTES = 65536

META_SCHEMA = (
    "url string, title string, canonical_url string, description string,"
    " html_lang string, n_hreflang int"
)

_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)
_HTML_TAG_RE = re.compile(r"<html\b[^>]*>", re.IGNORECASE)
_LINK_RE = re.compile(r"<link\b[^>]*>", re.IGNORECASE)
_META_RE = re.compile(r"<meta\b[^>]*>", re.IGNORECASE)
_ATTR_RE = re.compile(
    r"([a-zA-Z-]+)\s*=\s*(\"([^\"]*)\"|'([^']*)'|([^\s>]+))"
)
_WS_RE = re.compile(r"\s+")


def _attrs(tag: str) -> dict[str, str]:
    return {
        m.group(1).lower(): (
            m.group(3) if m.group(3) is not None
            else m.group(4) if m.group(4) is not None
            else m.group(5)
        )
        for m in _ATTR_RE.finditer(tag)
    }


def _page_meta(url: str, blob: bytes) -> dict:
    """Head-region metadata of one page; all-NULL row for non-HTML."""
    from ..kernels.encoding import decode_bytes
    from ..kernels.md_extract import looks_like_html

    out = {
        "title": None,
        "canonical_url": None,
        "description": None,
        "html_lang": None,
        "n_hreflang": 0,
    }
    if not blob or not looks_like_html(blob[:HEAD_BYTES]):
        return out
    text = decode_bytes(blob[:HEAD_BYTES])[0]
    m = _TITLE_RE.search(text)
    if m:
        title = _WS_RE.sub(" ", m.group(1)).strip()
        out["title"] = title or None
    m = _HTML_TAG_RE.search(text)
    if m:
        lang = _attrs(m.group(0)).get("lang")
        out["html_lang"] = lang.strip().lower() if lang and lang.strip() else None
    n_alt = 0
    for m in _LINK_RE.finditer(text):
        a = _attrs(m.group(0))
        rel = (a.get("rel") or "").strip().lower()
        href = (a.get("href") or "").strip()
        if rel == "canonical" and href and out["canonical_url"] is None:
            try:
                out["canonical_url"] = urljoin(url, href)
            except ValueError:
                pass
        elif rel == "alternate" and a.get("hreflang") and href:
            n_alt += 1
    out["n_hreflang"] = n_alt
    for m in _META_RE.finditer(text):
        a = _attrs(m.group(0))
        if (a.get("name") or "").strip().lower() == "description":
            content = _WS_RE.sub(" ", a.get("content") or "").strip()
            if content:
                out["description"] = content
                break
    return out


def extract_page_meta(pages_df: DataFrame) -> DataFrame:
    """pages (url, html) -> one metadata row per page (all pages kept;
    non-HTML payloads carry NULL fields). Single narrow python stage."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                try:
                    meta = _page_meta(
                        url, bytes(html) if html is not None else b""
                    )
                except Exception:
                    meta = {
                        "title": None,
                        "canonical_url": None,
                        "description": None,
                        "html_lang": None,
                        "n_hreflang": 0,
                    }
                rows.append({"url": url, **meta})
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "title", "canonical_url", "description",
                    "html_lang", "n_hreflang",
                ],
            )

    return pages_df.select("url", "html").mapInPandas(gen, schema=META_SCHEMA)
