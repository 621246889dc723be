"""Sitemap XML parsing — the push half of crawl discovery.

robots.txt (operators/robots.py) gates what MAY be crawled; sitemaps
declare what the site WANTS crawled, with freshness hints. This operator
parses sitemap XML (sitemaps.org protocol: ``<urlset><url><loc>...``)
into frontier rows, and ``sitemap_gap`` in contract.py joins them
against the crawled table to surface the two actionable sets: urls the
crawl has never fetched, and urls whose ``<lastmod>`` post-dates the
stored snapshot (re-crawl candidates). Completes the crawl loop next to
robots_filter / politeness / refresh_schedule / frontier_plan.

Shape: a pure Column program — ``regexp_extract_all`` pulls the
``<url>`` records, one explode lands them at scan parallelism, per-field
``regexp_extract`` + casts stay in whole-stage codegen. No python, no
shuffle. Sitemap *index* files (``<sitemapindex><sitemap><loc>``) yield
``kind='index'`` rows so the caller can fetch-and-recurse; plain url
records yield ``kind='url'``.

Field rules (sitemaps.org): only ``<loc>`` is required — missing
``lastmod``/``changefreq``/``priority`` come back NULL; priority is
parsed as decimal and scaled to integer milli-units (priority_milli) so
downstream ordering is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_URL_BLOCK = r"(?s)<url\s*>(.*?)</url\s*>"
_INDEX_BLOCK = r"(?s)<sitemap\s*>(.*?)</sitemap\s*>"
_FIELD = r"(?s)<{tag}\s*>\s*(.*?)\s*</{tag}\s*>"


def _field(entry, tag):
    got = F.regexp_extract(entry, _FIELD.format(tag=tag), 1)
    return F.when(got != "", got)


def parse_sitemaps(
    df: DataFrame, *, xml_col: str = "xml", host_col: str = "host"
) -> DataFrame:
    """(host, xml) -> one row per sitemap record:
    (host, kind, loc, lastmod:date, changefreq, priority_milli:int).

    ``kind`` is 'url' for ``<urlset>`` entries, 'index' for
    ``<sitemapindex>`` children (their loc is a child sitemap to fetch,
    and the freshness fields are NULL-or-lastmod per the protocol)."""
    blocks = F.array_union(
        F.transform(
            F.expr(f"regexp_extract_all({xml_col}, '{_URL_BLOCK}', 1)"),
            lambda b: F.struct(F.lit("url").alias("kind"), b.alias("body")),
        ),
        F.transform(
            F.expr(f"regexp_extract_all({xml_col}, '{_INDEX_BLOCK}', 1)"),
            lambda b: F.struct(F.lit("index").alias("kind"), b.alias("body")),
        ),
    )
    e = df.select(F.col(host_col).alias("host"), F.explode(blocks).alias("rec"))
    body = F.col("rec.body")
    return e.select(
        "host",
        F.col("rec.kind").alias("kind"),
        _field(body, "loc").alias("loc"),
        F.to_date(_field(body, "lastmod")).alias("lastmod"),
        _field(body, "changefreq").alias("changefreq"),
        # exact milli-units: DECIMAL(5,3) * 1000 is integral by construction
        (_field(body, "priority").cast("decimal(5,3)") * 1000)
        .cast("int")
        .alias("priority_milli"),
    ).where(F.col("loc").isNotNull())
