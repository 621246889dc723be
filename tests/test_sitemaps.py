"""The sitemap crawl-gap query (sitemap entries joined vs the crawled
corpus). Parser edge cases live in tests/test_properties.py
(parse_sitemap fuzz + entity tests) and test_crawl_edge coverage; this
file pins the gap semantics."""

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def test_gap_query_flags(spark):
    from ocr_spark.contract import QUERIES

    out = QUERIES["sitemap_gap"](spark, "/root/testdata/sf0.001")
    rows = [r.asDict() for r in out.collect()]
    assert rows
    kinds = {r["kind"] for r in rows}
    assert kinds == {"url", "sitemap"}
    for r in rows:
        # child-sitemap locs are never crawled page urls
        if r["kind"] == "sitemap":
            assert not r["crawled"] and not r["stale"]
            assert r["changefreq"] is None and r["priority_milli"] is None
            assert r["lastmod"] is not None
        else:
            assert r["lastmod"] is not None
            assert r["priority_milli"] in set(range(100, 1001, 100))
        # stale is only meaningful for crawled urls
        if r["stale"]:
            assert r["crawled"]
    # both crawl outcomes occur (targets land in and out of the corpus),
    # and some crawled urls are stale (lastmod after the snapshot)
    urls = [r for r in rows if r["kind"] == "url"]
    assert any(r["crawled"] for r in urls) and any(not r["crawled"] for r in urls)
    assert any(r["stale"] for r in urls)


def test_gap_query_partition_invariance(spark):
    from ocr_spark.contract import QUERIES

    a = QUERIES["sitemap_gap"](spark, "/root/testdata/sf0.001").collect()
    b = QUERIES["sitemap_gap"](spark, "/root/testdata/sf0.001").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
