"""Crawl-edge pair: sitemap parsing (operators/crawl_edge.py) and
politeness scheduling, plus the robots.txt directive extraction
(Crawl-delay, Sitemap) that feeds it.

Parser tests cover urlset/sitemapindex blocks, entity unescape in loc,
priority milli-quantization, malformed-body tolerance, and BOM strip.
Spark tests check the schedule arithmetic and the zero-exchange plan of
the sitemap parse stage.
"""

import pandas as pd

from ocr_spark.operators.crawl_edge import parse_sitemap, politeness_schedule, sitemap_entries
from ocr_spark.operators.robots import parse_robots_directives, robots_directives

URLSET = """\
\xef\xbb\xbf<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://e.com/a?x=1&amp;y=2</loc>
    <lastmod>2026-01-02</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://e.com/b</loc></url>
  <url><priority>0.3</priority></url>
</urlset>
"""

INDEX = """\
<sitemapindex>
  <sitemap><loc>https://e.com/sm1.xml.gz</loc><lastmod>2026-02-03</lastmod></sitemap>
  <sitemap><loc>https://e.com/sm2.xml.gz</loc></sitemap>
</sitemapindex>
"""


def test_parse_urlset():
    es = parse_sitemap(URLSET)
    # the loc-less entry is dropped
    assert [e["loc"] for e in es] == ["https://e.com/a?x=1&y=2", "https://e.com/b"]
    assert es[0]["kind"] == "url"
    assert es[0]["lastmod"] == "2026-01-02"
    assert es[0]["changefreq"] == "daily"
    assert es[0]["priority_milli"] == 800
    assert es[1]["lastmod"] is None
    assert es[1]["priority_milli"] is None


def test_parse_sitemapindex():
    es = parse_sitemap(INDEX.encode())
    assert [(e["kind"], e["loc"], e["lastmod"]) for e in es] == [
        ("sitemap", "https://e.com/sm1.xml.gz", "2026-02-03"),
        ("sitemap", "https://e.com/sm2.xml.gz", None),
    ]


def test_parse_malformed_never_raises():
    for blob in (b"", b"<urlset><url><loc>x", b"\x00\xff garbage", b"<url></url>"):
        assert isinstance(parse_sitemap(blob), list)
    # truncated entry yields no row, valid sibling survives
    es = parse_sitemap(b"<url><loc>https://e.com/ok</loc></url><url><loc>https://e.com/cut")
    assert [e["loc"] for e in es] == ["https://e.com/ok"]
    # unparsable priority -> None, entry kept
    es = parse_sitemap(b"<url><loc>https://e.com/p</loc><priority>high</priority></url>")
    assert es[0]["priority_milli"] is None


def test_robots_directives_parse():
    body = (
        "User-agent: *\nCrawl-delay: 2\nDisallow: /a\n"
        "Sitemap: https://e.com/sm.xml\n"
        "\nUser-agent: fastbot\nCrawl-delay: 0.25\nDisallow:\n"
        "Sitemap: https://e.com/sm2.xml\n"
    )
    rules, delay, sitemaps = parse_robots_directives(body, agent="randombot")
    assert delay == 2000
    assert rules == [(False, "/a", False)]
    # sitemap directives are file-global regardless of the selected group
    assert sitemaps == ["https://e.com/sm.xml", "https://e.com/sm2.xml"]
    # fractional crawl-delay, specific group
    _, delay, _ = parse_robots_directives(body, agent="fastbot/2.0")
    assert delay == 250
    # unparsable delay ignored
    _, delay, _ = parse_robots_directives("User-agent: *\nCrawl-delay: soon\n", agent="x")
    assert delay is None


def test_robots_directives_spark(spark):
    robots = spark.createDataFrame(
        pd.DataFrame(
            {
                "host": ["h1", "h2"],
                "robots_txt": [
                    "User-agent: *\nCrawl-delay: 1.5\nSitemap: https://h1/sm.xml\n",
                    "User-agent: *\nDisallow: /x\n",
                ],
            }
        )
    )
    rows = {r.host: r for r in robots_directives(robots).collect()}
    assert rows["h1"].crawl_delay_ms == 1500
    assert list(rows["h1"].sitemaps) == ["https://h1/sm.xml"]
    assert rows["h2"].crawl_delay_ms is None
    assert list(rows["h2"].sitemaps) == []


def test_politeness_schedule(spark):
    urls = spark.createDataFrame(
        pd.DataFrame(
            {
                "host": ["h1", "h1", "h1", "h2"],
                "url": ["/c", "/a", "/b", "/z"],
                "priority": [5, 5, 9, 1],
            }
        )
    )
    delays = spark.createDataFrame(
        pd.DataFrame({"host": ["h1"], "crawl_delay_ms": [2000]})
    )
    out = {
        r.url: (r.slot, r.fetch_offset_ms)
        for r in politeness_schedule(
            urls, delays, priority_col="priority", order_col="url"
        ).collect()
    }
    # h1: /b (prio 9) first, then /a, /c by url; h2 defaults to 1000 ms
    assert out == {
        "/b": (0, 0),
        "/a": (1, 2000),
        "/c": (2, 4000),
        "/z": (0, 0),
    }


def test_sitemap_entries_zero_exchange(spark):
    sm = spark.createDataFrame(
        pd.DataFrame({"host": ["h"], "sitemap_xml": [URLSET]})
    )
    df = sitemap_entries(sm)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert df.count() == 2


def test_sitemap_priority_overflow_degrades():
    es = parse_sitemap(
        b"<url><loc>https://e.com/p</loc><priority>1e400</priority></url>"
    )
    assert es[0]["priority_milli"] is None


# ---------------------------------------------------------------------------
# redirect-chain resolution (pointer doubling)
# ---------------------------------------------------------------------------

def _redir(spark, pairs):
    return spark.createDataFrame(pairs, "url string, redirect_to string")


def test_resolve_redirects_chain_and_terminal(spark):
    """a->b->c (c terminal): every node resolves to c with its own hop
    count; pure targets appear with n_hops=0."""
    from ocr_spark.operators.crawl_edge import resolve_redirects

    out = {
        r.url: (r.final_url, r.n_hops, r.resolved)
        for r in resolve_redirects(
            _redir(spark, [("a", "b"), ("b", "c")]), max_hops=8
        ).collect()
    }
    assert out == {
        "a": ("c", 2, True),
        "b": ("c", 1, True),
        "c": ("c", 0, True),
    }


def test_resolve_redirects_cycle_and_cap(spark):
    """A 2-cycle never terminates: exactly max_hops unit steps are
    simulated (even cycle -> back at the start), resolved=False. A chain
    longer than max_hops stops mid-chain, also unresolved."""
    from ocr_spark.operators.crawl_edge import resolve_redirects

    cyc = {
        r.url: (r.final_url, r.n_hops, r.resolved)
        for r in resolve_redirects(
            _redir(spark, [("x", "y"), ("y", "x")]), max_hops=4
        ).collect()
    }
    assert cyc == {"x": ("x", 4, False), "y": ("y", 4, False)}

    chain = [(f"n{i}", f"n{i + 1}") for i in range(6)]  # n0..n6, dist(n0)=6
    got = {
        r.url: (r.final_url, r.n_hops, r.resolved)
        for r in resolve_redirects(_redir(spark, chain), max_hops=4).collect()
    }
    assert got["n0"] == ("n4", 4, False)  # capped mid-chain
    assert got["n2"] == ("n6", 4, True)  # exactly at the cap, terminal
    assert got["n3"] == ("n6", 3, True)
    assert got["n6"] == ("n6", 0, True)


def test_resolve_redirects_rejects_non_power_of_two(spark):
    import pytest as _pytest

    from ocr_spark.operators.crawl_edge import resolve_redirects

    with _pytest.raises(ValueError):
        resolve_redirects(_redir(spark, [("a", "b")]), max_hops=6)


def test_resolve_redirects_partition_invariance(spark):
    from ocr_spark.operators.crawl_edge import resolve_redirects

    pairs = [(f"u{i}", f"u{i - 1}") for i in range(1, 40) if i % 7]
    a = sorted(
        map(tuple, resolve_redirects(_redir(spark, pairs), max_hops=8).collect())
    )
    b = sorted(
        map(
            tuple,
            resolve_redirects(
                _redir(spark, pairs).repartition(13), max_hops=8
            ).collect(),
        )
    )
    assert a == b


def test_resolve_redirects_conflicting_targets_deterministic(spark):
    """One url seen with two different targets (cross-snapshot conflict)
    must deterministically keep the SMALLEST target, independent of
    partitioning — dropDuplicates semantics would keep an arbitrary row."""
    from ocr_spark.operators.crawl_edge import resolve_redirects

    pairs = [("a", "c"), ("a", "b")]
    for parts in (1, 7):
        out = {
            r.url: (r.final_url, r.n_hops)
            for r in resolve_redirects(
                _redir(spark, pairs).repartition(parts), max_hops=4
            ).collect()
        }
        assert out["a"] == ("b", 1)


def test_resolve_redirects_rejects_zero_hops(spark):
    import pytest as _pytest

    from ocr_spark.operators.crawl_edge import resolve_redirects

    with _pytest.raises(ValueError):
        resolve_redirects(_redir(spark, [("a", "b")]), max_hops=0)


# ---------------------------------------------------------------------------
# frontier_plan (crawl-loop composition)
# ---------------------------------------------------------------------------

def test_frontier_plan_composition(spark):
    from ocr_spark.operators.crawl_edge import frontier_plan

    discovered = spark.createDataFrame(
        [
            # /a seen by both channels: feed sighting is fresher -> wins
            ("h1", "/a", "https://h1/a", "sitemap", 1000),
            ("h1", "/a", "https://h1/a", "feed", 2000),
            ("h1", "/b", "https://h1/b", "sitemap", 3000),
            ("h1", "/priv/x", "https://h1/priv/x", "feed", 9000),  # robots
            ("h1", "/c", "https://h1/c", "feed", 500),  # already crawled
            ("h2", "/z", "https://h2/z", "feed", 100),
        ],
        "host string, path string, url string, src string, recency_ms long",
    )
    crawled = spark.createDataFrame([("https://h1/c",)], "url string")
    robots = spark.createDataFrame(
        [
            ("h1", "User-agent: *\nCrawl-delay: 2\nDisallow: /priv\n"),
            ("h2", "User-agent: *\nDisallow:\n"),
        ],
        "host string, robots_txt string",
    )
    rows = {
        r.url: r for r in frontier_plan(discovered, crawled, robots).collect()
    }
    assert set(rows) == {"https://h1/a", "https://h1/b", "https://h2/z"}
    # fresher cross-channel sighting won the dedup
    assert rows["https://h1/a"].src == "feed"
    assert rows["https://h1/a"].recency_ms == 2000
    # slots: h1 ordered by recency desc -> /b first, then /a; delay 2000 ms
    assert rows["https://h1/b"].slot == 0
    assert rows["https://h1/a"].slot == 1
    assert rows["https://h1/a"].fetch_offset_ms == 2000
    # h2 has no Crawl-delay -> default 1000 ms, slot 0
    assert rows["https://h2/z"].fetch_offset_ms == 0
