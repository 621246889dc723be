"""RSS 2.0 / Atom feed parsing — the second crawl-discovery channel next
to :mod:`ocr_spark.operators.crawl_edge` sitemaps.

Feeds matter to a crawler for a different reason than sitemaps: a sitemap
enumerates a site, a feed announces *what changed recently* with a
publisher-supplied timestamp, so the frontier can prioritize fresh URLs
without re-fetching the whole site. The parser therefore normalizes the
two wire date formats (RFC 822 ``pubDate`` for RSS, ISO 8601 ``updated``
for Atom) into one integer ``published_ms`` epoch column — integer so
downstream recency comparisons are exact and the DuckDB oracle can
re-derive every value with ``epoch_ms(make_timestamp(...))``.

- :func:`parse_feed` — tolerant block-scan parser for one feed body:
  ``<item>`` blocks of RSS 2.0 (title/link/guid/pubDate) and ``<entry>``
  blocks of Atom (title/id/link@href/updated). Regex scan, not a strict
  XML parser: crawl payloads are routinely truncated/malformed and a
  parse error must yield fewer rows, never a task failure (same policy
  as the sitemap/WARC/HTML byte parsers).

- :func:`feed_entries` — Arrow-batched parse of a (host, feed_xml) table
  into an exploded entry table; ZERO exchanges (scan -> one python stage
  -> explode, asserted in tests/test_plan_shapes.py).

Date handling contract (pinned by unit tests + the closed-form oracle):
RFC 822 accepts an optional weekday, 1-2 digit day, English month
abbreviation, optional seconds, and zone ``GMT|UT|UTC|Z|+HHMM|-HHMM``;
ISO 8601 accepts ``YYYY-MM-DDTHH:MM:SS`` with optional fractional
seconds (kept to millisecond precision) and zone ``Z|+HH:MM|+HHMM``.
Anything else -> NULL ``published_ms`` (the row is kept; a feed entry
without a date is still a discovered URL).

Reference analog: the reference's stream sources hand frames to the
pipeline in arrival order (/root/reference/models/ocr/base_ocr.py
stream loop); a crawl frontier gets the same "new work arrives with a
timestamp" semantics from feed polling, computed here as data.
"""

from __future__ import annotations

import calendar
import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

_ITEM_RE = re.compile(rb"<item[\s>].*?</item\s*>", re.DOTALL | re.IGNORECASE)
_ENTRY_RE = re.compile(rb"<entry[\s>].*?</entry\s*>", re.DOTALL | re.IGNORECASE)
_FEED_TAG_RE = re.compile(rb"<feed[\s>]", re.IGNORECASE)
_TEXT_FIELD_RES = {
    name: re.compile(
        rb"<" + name.encode() + rb"[^>]*>\s*(.*?)\s*</" + name.encode() + rb"\s*>",
        re.DOTALL | re.IGNORECASE,
    )
    for name in ("title", "link", "guid", "pubDate", "id", "updated")
}
_LINK_TAG_RE = re.compile(rb"<link\b[^>]*>", re.IGNORECASE)
_ATTR_RE = re.compile(rb"([a-zA-Z-]+)\s*=\s*(\"([^\"]*)\"|'([^']*)'|([^\s>]+))")
_CDATA_RE = re.compile(rb"^<!\[CDATA\[(.*)\]\]>$", re.DOTALL)
_WS_RE = re.compile(r"\s+")

_MONTHS = {
    m: i + 1
    for i, m in enumerate(
        ("jan", "feb", "mar", "apr", "may", "jun",
         "jul", "aug", "sep", "oct", "nov", "dec")
    )
}

_RFC822_RE = re.compile(
    r"^(?:[A-Za-z]{3},\s*)?(\d{1,2})\s+([A-Za-z]{3})\s+(\d{4})\s+"
    r"(\d{2}):(\d{2})(?::(\d{2}))?\s*(GMT|UTC?|Z|[+-]\d{4})?\s*$"
)
_ISO8601_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})[T ](\d{2}):(\d{2}):(\d{2})(?:\.(\d+))?"
    r"\s*(Z|[+-]\d{2}:?\d{2})?\s*$"
)

_ENTITIES = (
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
)


def _unescape(s: str) -> str:
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return s


def _text(raw: bytes | None) -> str | None:
    """Decode one field value: CDATA content is literal (no entity
    decode, per XML semantics), everything else gets the five named
    entities unescaped; whitespace collapses; empty -> None."""
    if raw is None:
        return None
    m = _CDATA_RE.match(raw.strip())
    if m:
        s = m.group(1).decode("utf-8", "replace")
    else:
        s = _unescape(raw.decode("utf-8", "replace"))
    s = _WS_RE.sub(" ", s).strip()
    return s or None


def _zone_offset_s(zone: str | None) -> int | None:
    """Zone token -> seconds east of UTC; None for an unparsable zone."""
    if zone is None or zone.upper() in ("GMT", "UT", "UTC", "Z"):
        return 0
    z = zone.replace(":", "")
    if len(z) != 5 or z[0] not in "+-" or not z[1:].isdigit():
        return None
    hh, mm = int(z[1:3]), int(z[3:5])
    if hh > 23 or mm > 59:
        return None
    sign = 1 if z[0] == "+" else -1
    return sign * (hh * 3600 + mm * 60)


def parse_date_ms(s: str | None) -> int | None:
    """RFC 822 or ISO 8601 date string -> epoch milliseconds, else None.

    Deterministic pure-integer path (regex + calendar.timegm), no locale
    and no platform strptime quirks — byte-identical across executors.
    """
    if not s:
        return None
    s = s.strip()
    m = _RFC822_RE.match(s)
    if m:
        day, mon, year, hh, mi, ss, zone = m.groups()
        mon_n = _MONTHS.get(mon.lower())
        off = _zone_offset_s(zone)
        if mon_n is None or off is None:
            return None
        try:
            epoch = calendar.timegm(
                (int(year), mon_n, int(day), int(hh), int(mi), int(ss or 0))
            )
        except (ValueError, OverflowError):
            return None
        if not (1 <= int(day) <= 31 and int(hh) < 24 and int(mi) < 60
                and int(ss or 0) < 61):
            return None
        return (epoch - off) * 1000
    m = _ISO8601_RE.match(s)
    if m:
        year, mon, day, hh, mi, ss, frac, zone = m.groups()
        off = _zone_offset_s(zone)
        if off is None or not (1 <= int(mon) <= 12):
            return None
        if not (1 <= int(day) <= 31 and int(hh) < 24 and int(mi) < 60
                and int(ss) < 61):
            return None
        try:
            epoch = calendar.timegm(
                (int(year), int(mon), int(day), int(hh), int(mi), int(ss))
            )
        except (ValueError, OverflowError):
            return None
        ms = int((frac or "0").ljust(3, "0")[:3]) if frac else 0
        return (epoch - off) * 1000 + ms
    return None


def _block_link(block: bytes, fmt: str) -> str | None:
    """Entry link: RSS uses <link>text</link>; Atom uses <link href=...>
    attribute tags, preferring rel="alternate", then rel-less, then any."""
    if fmt == "rss":
        m = _TEXT_FIELD_RES["link"].search(block)
        return _text(m.group(1)) if m else None
    first_norel = first_any = None
    for m in _LINK_TAG_RE.finditer(block):
        attrs = {
            am.group(1).decode().lower(): (
                am.group(3) if am.group(3) is not None
                else am.group(4) if am.group(4) is not None
                else am.group(5)
            )
            for am in _ATTR_RE.finditer(m.group(0))
        }
        href = attrs.get("href")
        if href is None:
            continue
        href_s = _unescape(href.decode("utf-8", "replace").strip()) or None
        if href_s is None:
            continue
        rel = (attrs.get("rel") or b"").decode().strip().lower()
        if rel == "alternate":
            return href_s
        if not rel and first_norel is None:
            first_norel = href_s
        if first_any is None:
            first_any = href_s
    return first_norel or first_any


def parse_feed(body: bytes | str) -> list[dict]:
    """One feed body -> entry dicts
    ``{fmt, entry_id, link, title, published_ms}``.

    ``fmt`` is ``'atom'`` when a ``<feed>`` tag is present, else
    ``'rss'``. ``entry_id`` is Atom ``<id>`` / RSS ``<guid>``, falling
    back to the link. Entries with neither a link nor an id are dropped
    (nothing to fetch). Channel/feed-level ``<title>`` never leaks into
    entries because fields are only read inside item/entry blocks."""
    if isinstance(body, str):
        body = body.encode("utf-8", "replace")
    if body[:3] == b"\xef\xbb\xbf":
        body = body[3:]
    is_atom = _FEED_TAG_RE.search(body) is not None
    fmt = "atom" if is_atom else "rss"
    block_re = _ENTRY_RE if is_atom else _ITEM_RE
    id_field = "id" if is_atom else "guid"
    date_field = "updated" if is_atom else "pubDate"
    out: list[dict] = []
    for m in block_re.finditer(body):
        block = m.group(0)
        link = _block_link(block, fmt)
        idm = _TEXT_FIELD_RES[id_field].search(block)
        entry_id = _text(idm.group(1)) if idm else None
        if link is None and entry_id is None:
            continue
        tm = _TEXT_FIELD_RES["title"].search(block)
        dm = _TEXT_FIELD_RES[date_field].search(block)
        out.append(
            {
                "fmt": fmt,
                "entry_id": entry_id or link,
                "link": link,
                "title": _text(tm.group(1)) if tm else None,
                "published_ms": parse_date_ms(
                    _text(dm.group(1)) if dm else None
                ),
            }
        )
    return out


_FEED_SCHEMA = (
    "array<struct<fmt:string,entry_id:string,link:string,"
    "title:string,published_ms:bigint>>"
)


def feed_entries(feeds: DataFrame, *, body_col: str = "feed_xml") -> DataFrame:
    """(host, feed_xml) -> exploded
    (host, fmt, entry_id, link, title, published_ms)."""

    @pandas_udf(_FEED_SCHEMA)
    def parse(bodies: pd.Series) -> pd.Series:
        return pd.Series(
            [
                parse_feed(b if isinstance(b, (bytes, str)) else str(b))
                for b in bodies
            ]
        )

    return feeds.select("host", F.explode(parse(body_col)).alias("e")).select(
        "host",
        F.col("e.fmt").alias("fmt"),
        F.col("e.entry_id").alias("entry_id"),
        F.col("e.link").alias("link"),
        F.col("e.title").alias("title"),
        F.col("e.published_ms").alias("published_ms"),
    )
