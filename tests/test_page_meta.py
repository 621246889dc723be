"""Page-head metadata parser: quoting/order variants, first-wins,
relative canonical resolution, non-HTML degradation, plan shape."""

from ocr_spark.operators.page_meta import _page_meta, extract_page_meta


def test_page_meta_full_head():
    html = (
        b'<!DOCTYPE html><html lang="en-US"><head>'
        b"<title>  A\n  Title </title>"
        b'<link href="/canon/1" rel="canonical">'
        b'<meta content="Hello  world" name="description">'
        b"<link rel='alternate' hreflang='fr' href='https://fr.x/p'>"
        b"</head><body></body></html>"
    )
    m = _page_meta("https://a.example/p/1?q=2", html)
    assert m == {
        "title": "A Title",
        "canonical_url": "https://a.example/canon/1",
        "description": "Hello world",
        "html_lang": "en-us",
        "n_hreflang": 1,
    }


def test_page_meta_first_occurrence_wins_and_missing_fields():
    html = (
        b"<html><head><title>first</title><title>second</title>"
        b'<link rel="canonical" href="https://c.x/1">'
        b'<link rel="canonical" href="https://c.x/2">'
        b"</head></html>"
    )
    m = _page_meta("https://a.example/", html)
    assert m["title"] == "first"
    assert m["canonical_url"] == "https://c.x/1"
    assert m["description"] is None and m["html_lang"] is None
    assert m["n_hreflang"] == 0


def test_page_meta_non_html_and_empty():
    assert _page_meta("https://a.example/x", b"%PDF-1.7 junk")["title"] is None
    assert _page_meta("https://a.example/x", b"")["n_hreflang"] == 0


def test_page_meta_bare_attr_quoting():
    html = b"<html lang=fr><head><link rel=canonical href=https://c.x/b></head></html>"
    m = _page_meta("https://a.example/", html)
    assert m["html_lang"] == "fr"
    assert m["canonical_url"] == "https://c.x/b"


def test_page_meta_plan_single_python_stage(spark):
    pages = spark.createDataFrame(
        [("u", b"<html><head><title>t</title></head></html>")],
        "url string, html binary",
    )
    plan = (
        extract_page_meta(pages)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# OpenGraph + JSON-LD (extract_og_meta)
# ---------------------------------------------------------------------------

from ocr_spark.operators.page_meta import _og_meta, extract_og_meta


def test_og_meta_first_wins_and_quoting():
    html = (
        b"<html><head>"
        b"<meta content='T1' property='og:title'>"  # single quotes, attr order
        b'<meta property="og:title" content="T2-loses">'
        b'<meta property="og:image" content="  https://i.x/a.jpg ">'
        b"</head></html>"
    )
    m = _og_meta(html)
    assert m["og_title"] == "T1"
    assert m["og_image"] == "https://i.x/a.jpg"
    assert m["og_type"] is None and m["og_url"] is None


def test_og_meta_jsonld_variants():
    html = (
        b"<html><head>"
        b'<script type="application/ld+json">{"@type": broken</script>'
        b'<script type="application/ld+json">'
        b'{"@graph":[{"@type":["NewsArticle","Article"]},{"@type":"x"}]}'
        b"</script>"
        b'<script type="application/ld+json">{"@type":"WebSite"}</script>'
        b"</head></html>"
    )
    m = _og_meta(html)
    # malformed block skipped; first parseable wins; list @type -> first
    assert m["n_ld"] == 2
    assert m["ld_type"] == "NewsArticle"


def test_og_meta_non_html():
    m = _og_meta(b"%PDF-1.7 junk")
    assert m["og_title"] is None and m["n_ld"] == 0


def test_og_meta_plan_single_python_stage(spark):
    pages = spark.createDataFrame(
        [("u", b'<html><head><meta property="og:type" content="article">'
               b"</head></html>")],
        "url string, html binary",
    )
    df = extract_og_meta(pages)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan
    assert df.collect()[0].og_type == "article"


# ---------------------------------------------------------------------------
# pagination (extract_pagination)
# ---------------------------------------------------------------------------

from ocr_spark.operators.page_meta import _pagination, extract_pagination


def test_pagination_link_and_anchor_forms():
    html = (
        b"<html><head>"
        b'<link rel="next" href="/part-2">'
        b"</head><body>"
        b"<a href='/part-0' rel='nofollow previous'>back</a>"
        b'<a rel="next" href="/part-9-loses">decoy second next</a>'
        b"</body></html>"
    )
    p = _pagination("https://s.example/art/part-1", html)
    # relative hrefs resolve against the page url; FIRST next wins
    assert p["next_url"] == "https://s.example/part-2"
    assert p["prev_url"] == "https://s.example/part-0"


def test_pagination_rel_token_list_and_prev_alias():
    p = _pagination(
        "https://s.example/a",
        b'<html><a href="/p" rel="prev">x</a><a href="/n" rel="NEXT">y</a></html>',
    )
    assert p["prev_url"] == "https://s.example/p"
    assert p["next_url"] == "https://s.example/n"
    # rel-less anchors and non-html are ignored
    assert _pagination("u", b'<html><a href="/x">y</a></html>')["next_url"] is None
    assert _pagination("u", b"%PDF-junk")["next_url"] is None


def test_pagination_plan_zero_exchange(spark):
    pages = spark.createDataFrame(
        [("https://s.example/1",
          b'<html><link rel="next" href="/2"></html>')],
        "url string, html binary",
    )
    df = extract_pagination(pages)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1 and "Exchange" not in plan
    assert df.collect()[0].next_url == "https://s.example/2"


# ---------------------------------------------------------------------------
# provenance (extract_provenance)
# ---------------------------------------------------------------------------

from ocr_spark.operators.page_meta import _provenance


def test_provenance_cc_license_link():
    html = (
        b"<html><body><a rel='license' "
        b"href='https://creativecommons.org/licenses/by-nc-sa/3.0/'>cc</a>"
        b"</body></html>"
    )
    p = _provenance("https://s.example/a", html)
    assert p["license_url"].endswith("/by-nc-sa/3.0/")
    assert p["cc_variant"] == "by-nc-sa" and p["cc_version"] == "3.0"


def test_provenance_relative_license_and_body_cc0():
    p = _provenance(
        "https://s.example/a",
        b'<html><link rel="license" href="/LICENSE"></html>',
    )
    assert p["license_url"] == "https://s.example/LICENSE"
    assert p["cc_variant"] is None
    # CC0 url in the body without rel=license still yields the variant
    p = _provenance(
        "https://s.example/a",
        b'<html><a href="https://creativecommons.org/publicdomain/zero/1.0/">'
        b"CC0</a></html>",
    )
    assert p["license_url"] is None
    assert p["cc_variant"] == "zero" and p["cc_version"] == "1.0"


def test_provenance_published_time_fallback_chain():
    # meta wins over time tag
    html = (
        b'<html><head><meta property="article:published_time" '
        b'content="2026-01-02T03:04:05Z"></head>'
        b'<body><time datetime="2020-01-01T00:00:00Z">old</time></body></html>'
    )
    p = _provenance("u", html)
    assert p["published_ms"] == 1767323045000
    # invalid meta falls through to the time tag
    html = (
        b'<html><meta property="article:published_time" content="yesterday">'
        b'<time datetime="2026-01-02T03:04:05Z">t</time></html>'
    )
    assert _provenance("u", html)["published_ms"] == 1767323045000
    # neither -> None; non-html -> all None
    assert _provenance("u", b"<html><p>x</p></html>")["published_ms"] is None
    assert _provenance("u", b"%PDF-junk")["license_url"] is None


def test_meta_sidecar_fused_single_stage(spark):
    from ocr_spark.operators.page_meta import extract_meta_sidecar

    pages = spark.createDataFrame(
        [
            ("https://s.example/1",
             b'<html lang="fr"><head><title>T1</title>'
             b'<meta property="og:title" content="OT">'
             b'<link rel="next" href="/2">'
             b'<meta property="article:published_time" '
             b'content="2026-01-02T03:04:05Z"></head><body>'
             b'<a rel="license" '
             b'href="https://creativecommons.org/licenses/by/4.0/">c</a>'
             b"</body></html>"),
            ("https://s.example/bin", b"%PDF-1.7 not html"),
        ],
        "url string, html binary",
    )
    df = extract_meta_sidecar(pages)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # ONE fused python stage, no shuffle: the scan is shared by all four
    # metadata families
    assert plan.count("MapInPandas") == 1 and "Exchange" not in plan
    rows = {r.url: r for r in df.collect()}
    r = rows["https://s.example/1"]
    assert (r.title, r.og_title, r.html_lang) == ("T1", "OT", "fr")
    assert r.next_url == "https://s.example/2"
    assert r.cc_variant == "by" and r.published_ms == 1767323045000
    b = rows["https://s.example/bin"]
    assert b.title is None and b.n_ld == 0 and b.license_url is None
