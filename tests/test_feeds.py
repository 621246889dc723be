"""RSS/Atom feed parsing (operators/feeds.py): wire-format coverage of
both feed dialects, the two date grammars, and the zero-exchange plan."""

import pandas as pd
import pytest

from ocr_spark.operators.feeds import feed_entries, parse_date_ms, parse_feed

RSS = b"""<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>Channel title must not leak</title>
  <link>https://h.example.com/</link>
  <item>
    <title><![CDATA[Post 0 & <raw>]]></title>
    <link>https://h.example.com/post0?a=1&amp;b=2</link>
    <guid isPermaLink="false">tag:h,2026:0</guid>
    <pubDate>Sat, 06 Jun 2026 08:15:30 GMT</pubDate>
  </item>
  <item>
    <title>Post   1</title>
    <link>https://h.example.com/post1</link>
    <pubDate>7 Jun 2026 08:15 +0200</pubDate>
  </item>
  <item><description>no loc, no id: dropped</description></item>
</channel></rss>
"""

ATOM = b"""<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Feed title must not leak</title>
  <link rel="self" href="https://h.example.com/feed.xml"/>
  <entry>
    <title>Entry 0</title>
    <id>urn:h:0</id>
    <link rel="self" href="https://h.example.com/e0.meta"/>
    <link rel="alternate" href="https://h.example.com/e0"/>
    <updated>2026-07-06T08:15:30Z</updated>
  </entry>
  <entry>
    <title>Entry 1</title>
    <id>urn:h:1</id>
    <link href="https://h.example.com/e1"/>
    <updated>2026-07-06T08:15:30.250+02:00</updated>
  </entry>
</feed>
"""


def test_rss_items():
    es = parse_feed(RSS)
    assert [e["fmt"] for e in es] == ["rss", "rss"]
    e0, e1 = es
    # CDATA content is literal: entities inside stay escaped, tags survive
    assert e0["title"] == "Post 0 & <raw>"
    assert e0["link"] == "https://h.example.com/post0?a=1&b=2"
    assert e0["entry_id"] == "tag:h,2026:0"
    assert e0["published_ms"] == 1780733730000
    # whitespace collapse; guid falls back to link; +0200 and no-seconds
    assert e1["title"] == "Post 1"
    assert e1["entry_id"] == "https://h.example.com/post1"
    assert e1["published_ms"] == (1780733730000 + 86400000
                                  - 30000 - 7200000)


def test_atom_entries():
    es = parse_feed(ATOM)
    assert [e["fmt"] for e in es] == ["atom", "atom"]
    e0, e1 = es
    # rel=alternate beats rel=self regardless of order
    assert e0["link"] == "https://h.example.com/e0"
    assert e0["entry_id"] == "urn:h:0"
    assert e0["published_ms"] == 1783325730000
    # rel-less link; fractional seconds kept to ms; +02:00 offset applied
    assert e1["link"] == "https://h.example.com/e1"
    assert e1["published_ms"] == 1783325730250 - 7200000


@pytest.mark.parametrize(
    "s,ms",
    [
        ("Mon, 01 Jan 2026 00:00:00 GMT", 1767225600000),
        ("1 Jan 2026 00:00:00 UTC", 1767225600000),
        ("Mon, 01 Jan 2026 00:00:00 -0130", 1767225600000 + 5400000),
        ("2026-01-01T00:00:00Z", 1767225600000),
        ("2026-01-01 00:00:00", 1767225600000),  # naive -> UTC
        ("2026-01-01T00:00:00.5Z", 1767225600500),
        ("2026-01-01T00:00:00+0130", 1767225600000 - 5400000),
        (None, None),
        ("yesterday", None),
        ("Mon, 01 Foo 2026 00:00:00 GMT", None),
        ("Mon, 32 Jan 2026 00:00:00 GMT", None),
        ("2026-13-01T00:00:00Z", None),
        ("2026-01-01T25:00:00Z", None),
        ("Mon, 01 Jan 2026 00:00:00 +9999", None),
    ],
)
def test_parse_date_ms(s, ms):
    assert parse_date_ms(s) == ms


def test_truncated_body_degrades_not_fails():
    # truncation mid-item yields fewer rows, never an exception
    assert parse_feed(RSS[: RSS.find(b"</item>") - 3]) == []
    assert len(parse_feed(RSS[: RSS.rfind(b"<item>")])) == 2
    assert parse_feed(b"\xff\xfe not xml at all") == []
    assert parse_feed("") == []


def test_feed_entries_zero_exchange(spark):
    feeds = spark.createDataFrame(
        pd.DataFrame(
            {"host": ["h1", "h2"], "feed_xml": [RSS.decode(), ATOM.decode()]}
        )
    )
    df = feed_entries(feeds)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = {(r.host, r.entry_id): r for r in df.collect()}
    assert len(rows) == 4
    assert rows[("h2", "urn:h:1")].published_ms == 1783325730250 - 7200000
