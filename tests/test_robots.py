"""robots.txt compliance gate (operators/robots.py) — RFC 9309 semantics.

Parser unit tests cover group selection (most-specific agent wins, `*`
fallback, specific group REPLACES `*`), empty-Disallow drop, `$` anchors,
comments, and multi-agent groups. The Spark test checks distributed
longest-match evaluation end-to-end.
"""

import pandas as pd

from ocr_spark.operators.robots import parse_robots, robots_filter

BODY = """\
# global rules
User-agent: *
Disallow: /private
Allow: /private/ok
Disallow: /exact$
Disallow:

User-agent: ocrbot
User-agent: otherbot
Disallow: /
"""


def test_parse_star_group():
    rules = parse_robots(BODY, agent="randombot")
    assert (False, "/private", False) in rules
    assert (True, "/private/ok", False) in rules
    assert (False, "/exact", True) in rules
    # empty Disallow dropped
    assert all(p for (_, p, _) in rules)


def test_parse_specific_group_overrides_star():
    # ocrbot matches the specific group; its rules REPLACE the * group's
    rules = parse_robots(BODY, agent="ocrbot/1.0")
    assert rules == [(False, "/", False)]
    # multi-agent group applies to every listed agent
    assert parse_robots(BODY, agent="otherbot") == [(False, "/", False)]


def test_parse_longest_agent_token_wins():
    body = (
        "User-agent: bot\nDisallow: /a\n\n"
        "User-agent: ocrbot\nDisallow: /b\n"
    )
    assert parse_robots(body, agent="ocrbot") == [(False, "/b", False)]
    # both token groups match 'myocrbot'; 'ocrbot' is longer
    assert parse_robots(body, agent="myocrbot") == [(False, "/b", False)]


def test_parse_no_groups():
    assert parse_robots("", agent="x") == []
    assert parse_robots("Sitemap: https://e.com/s.xml", agent="x") == []


def test_parse_second_user_agent_line_starts_new_group():
    body = (
        "User-agent: a\nDisallow: /a\n"
        "User-agent: b\nDisallow: /b\n"
    )
    assert parse_robots(body, agent="a") == [(False, "/a", False)]
    assert parse_robots(body, agent="b") == [(False, "/b", False)]


def test_robots_filter_longest_match(spark):
    urls = spark.createDataFrame(
        pd.DataFrame(
            {
                "host": ["h1", "h1", "h1", "h1", "h1", "h2", "h3"],
                "path": [
                    "/private/x",      # blocked by /private
                    "/private/ok/y",   # re-allowed: longer Allow wins
                    "/exact",          # blocked: $-anchor exact match
                    "/exactly",        # allowed: anchor does not prefix-match
                    "/public",         # no matching rule -> allowed
                    "/anything",       # host with no robots row -> allowed
                    "/tie",            # equal-length Allow/Disallow -> Allow
                ],
            }
        )
    )
    robots = spark.createDataFrame(
        pd.DataFrame(
            {
                "host": ["h1", "h3"],
                "robots_txt": [BODY, "User-agent: *\nAllow: /tie\nDisallow: /tie\n"],
            }
        )
    )
    out = {
        (r.host, r.path): r.allowed
        for r in robots_filter(urls, robots).collect()
    }
    assert out == {
        ("h1", "/private/x"): False,
        ("h1", "/private/ok/y"): True,
        ("h1", "/exact"): False,
        ("h1", "/exactly"): True,
        ("h1", "/public"): True,
        ("h2", "/anything"): True,
        ("h3", "/tie"): True,
    }


def test_gate_pages(spark):
    from ocr_spark.operators.robots import gate_pages

    pages = spark.createDataFrame(
        [
            ("https://h1.example/private/a", b"<p>x</p>"),
            ("https://h1.example/pub/b", b"<p>y</p>"),
            ("https://h1.example", b"<p>root no path</p>"),
            ("https://h2.example/private/c", b"<p>no robots host</p>"),
        ],
        "url string, html binary",
    )
    robots = spark.createDataFrame(
        [("h1.example", "User-agent: *\nDisallow: /private\n")],
        "host string, robots_txt string",
    )
    out = gate_pages(pages, robots)
    assert sorted(r.url for r in out.collect()) == [
        "https://h1.example",
        "https://h1.example/pub/b",
        "https://h2.example/private/c",
    ]
    # payload columns survive the gate untouched
    assert out.columns == pages.columns


def test_parse_meta_robots_cases():
    from ocr_spark.operators.robots import parse_meta_robots

    f = parse_meta_robots(b'<meta name="robots" content="noindex, NOFOLLOW">')
    assert f["noindex"] and f["nofollow"] and not f["noai"]
    # 'none' alias, unquoted name, multiple tags union
    f = parse_meta_robots(
        b"<meta name=robots content='none'><meta name=\"robots\" content=\"noai\">"
    )
    assert f["noindex"] and f["nofollow"] and f["noai"]
    # non-robots meta and robots mention in body text are ignored
    f = parse_meta_robots(b'<meta name="viewport" content="noindex"><p>noai robots</p>')
    assert not any(f.values())
    # malformed / binary junk never raises
    assert isinstance(parse_meta_robots(b"\x00\xff<meta name=robots"), dict)


def test_meta_robots_flags_zero_exchange(spark):
    from ocr_spark.operators.robots import meta_robots_flags

    pages = spark.createDataFrame(
        [("u1", b'<head><meta name="robots" content="noai"></head>'), ("u2", None)],
        "url string, html binary",
    )
    df = meta_robots_flags(pages)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = {r.url: r.noai for r in df.collect()}
    assert rows == {"u1": True, "u2": False}


def test_review_fixes_parser_edges():
    from ocr_spark.operators.robots import (
        parse_meta_robots,
        parse_robots,
        parse_robots_directives,
    )

    # OverflowError path: infinite crawl-delay degrades, never raises
    _, delay, _ = parse_robots_directives(
        "User-agent: *\nCrawl-delay: 1e400\n", agent="x"
    )
    assert delay is None
    # RFC 9309 §2.2.1: repeated 'User-agent: *' groups merge their rules
    rules = parse_robots(
        "User-agent: *\nDisallow: /a\n\nUser-agent: *\nDisallow: /b\n", agent="x"
    )
    assert (False, "/a", False) in rules and (False, "/b", False) in rules
    # meta name must be exactly 'robots'; unquoted content values parse
    f = parse_meta_robots(b'<meta name="robots-verification" content="noindex">')
    assert not f["noindex"]
    f = parse_meta_robots(b"<meta name=robots content=noindex>")
    assert f["noindex"]


def test_robots_filter_wildcards_and_duplicates(spark):
    import pandas as pd

    from ocr_spark.operators.robots import robots_filter

    urls = spark.createDataFrame(
        pd.DataFrame(
            {
                "host": ["h", "h", "h", "h", "h"],
                "path": [
                    "/private/x.php",  # blocked by /*.php$ via wildcard
                    "/page.php/more",  # NOT blocked: $ anchors the end
                    "/private/doc",    # blocked by /private/*
                    "/dup",            # duplicated row below
                    "/dup",
                ],
            }
        )
    )
    robots = spark.createDataFrame(
        pd.DataFrame(
            {
                "host": ["h"],
                "robots_txt": [
                    "User-agent: *\nDisallow: /*.php$\nDisallow: /private/*\n"
                ],
            }
        )
    )
    out = robots_filter(urls, robots).collect()
    # duplicate input rows are preserved (verdict joins back per host+path)
    assert len(out) == 5
    verdicts = {}
    for r in out:
        verdicts.setdefault(r.path, []).append(r.allowed)
    assert verdicts["/private/x.php"] == [False]
    assert verdicts["/page.php/more"] == [True]
    assert verdicts["/private/doc"] == [False]
    assert verdicts["/dup"] == [True, True]


def test_gate_pages_normalizes_host(spark):
    from ocr_spark.operators.robots import gate_pages

    pages = spark.createDataFrame(
        [
            ("https://Example.COM/private/a", b"x"),
            ("https://user:pw@example.com:443/private/b", b"y"),
            ("https://example.com/pub", b"z"),
        ],
        "url string, html binary",
    )
    robots = spark.createDataFrame(
        [("example.com", "User-agent: *\nDisallow: /private\n")],
        "host string, robots_txt string",
    )
    assert sorted(r.url for r in gate_pages(pages, robots).collect()) == [
        "https://example.com/pub"
    ]


def test_robots_filter_plan_join_only(spark):
    import pandas as pd

    from ocr_spark.operators.robots import robots_filter

    urls = spark.createDataFrame(
        pd.DataFrame({"host": ["h"], "path": ["/x"]})
    )
    robots = spark.createDataFrame(
        pd.DataFrame({"host": ["h"], "robots_txt": ["User-agent: *\nDisallow: /a\n"]})
    )
    plan = (
        robots_filter(urls, robots)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the winner fold is an aggregate lambda, not a window: no Window/Sort
    assert "Window" not in plan
    assert "Sort" not in plan


def test_robots_filter_merges_multiple_robots_rows(spark):
    import pandas as pd

    from ocr_spark.operators.robots import robots_filter

    urls = spark.createDataFrame(
        pd.DataFrame({"host": ["h"], "path": ["/private/deep/x"]})
    )
    # two robots rows for one host: the longest rule (row B) must win and
    # the output must stay one row per input url
    robots = spark.createDataFrame(
        pd.DataFrame(
            {
                "host": ["h", "h"],
                "robots_txt": [
                    "User-agent: *\nAllow: /private\n",
                    "User-agent: *\nDisallow: /private/deep\n",
                ],
            }
        )
    )
    out = robots_filter(urls, robots).collect()
    assert len(out) == 1
    assert out[0].allowed is False
