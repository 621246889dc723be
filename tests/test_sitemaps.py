"""Sitemap XML parsing (operators/sitemaps.py) + the crawl-gap query."""

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.sitemaps import parse_sitemaps

pytestmark = pytest.mark.usefixtures("spark")


def _parse(spark, xml, host="h.example"):
    df = spark.createDataFrame([(host, xml)], "host string, xml string")
    return [r.asDict() for r in parse_sitemaps(df).orderBy("loc").collect()]


def test_urlset_all_fields(spark):
    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>https://a.example/1</loc><lastmod>2026-02-03</lastmod>"
        "<changefreq>weekly</changefreq><priority>0.8</priority></url>"
        "<url><loc>https://a.example/2</loc></url>"
        "</urlset>"
    )
    rows = _parse(spark, xml)
    assert len(rows) == 2
    r1, r2 = rows
    assert r1["kind"] == "url" and r1["loc"] == "https://a.example/1"
    assert str(r1["lastmod"]) == "2026-02-03"
    assert r1["changefreq"] == "weekly" and r1["priority_milli"] == 800
    # loc-only record: optional fields are NULL per the protocol
    assert r2["lastmod"] is None and r2["changefreq"] is None
    assert r2["priority_milli"] is None


def test_sitemapindex_children(spark):
    xml = (
        "<sitemapindex>"
        "<sitemap><loc>https://a.example/s1.xml</loc>"
        "<lastmod>2026-01-05</lastmod></sitemap>"
        "<sitemap><loc>https://a.example/s2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    rows = _parse(spark, xml)
    assert [r["kind"] for r in rows] == ["index", "index"]
    assert rows[0]["loc"].endswith("s1.xml")
    assert str(rows[0]["lastmod"]) == "2026-01-05"


def test_whitespace_newlines_and_missing_loc(spark):
    # pretty-printed XML (newlines inside records) and a loc-less record
    xml = (
        "<urlset>\n  <url>\n    <loc>\n      https://a.example/x\n    </loc>\n"
        "    <priority>1.0</priority>\n  </url>\n"
        "  <url><lastmod>2026-01-01</lastmod></url>\n</urlset>"
    )
    rows = _parse(spark, xml)
    assert len(rows) == 1  # the loc-less record is dropped
    assert rows[0]["loc"] == "https://a.example/x"
    assert rows[0]["priority_milli"] == 1000


def test_non_sitemap_bytes_yield_nothing(spark):
    assert _parse(spark, "<html><body>not a sitemap</body></html>") == []
    assert _parse(spark, "") == []


def test_gap_query_flags(spark):
    from ocr_spark.contract import QUERIES

    out = QUERIES["sitemap_gap"](spark, "/root/testdata/sf0.001")
    rows = [r.asDict() for r in out.collect()]
    assert rows
    kinds = {r["kind"] for r in rows}
    assert kinds == {"url", "index"}
    # index locs are never crawled urls; stale implies crawled
    for r in rows:
        if r["kind"] == "index":
            assert not r["crawled"] and not r["stale"]
        if r["stale"]:
            assert r["crawled"]
    # both crawl outcomes occur (targets land in and out of the corpus)
    urls = [r for r in rows if r["kind"] == "url"]
    assert any(r["crawled"] for r in urls) and any(not r["crawled"] for r in urls)
    assert any(r["stale"] for r in urls)
