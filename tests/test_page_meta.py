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
