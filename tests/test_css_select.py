"""CSS selector engine: grammar, combinators, pseudo-classes, document
order, and the Spark operator's behavior on the synthetic corpus."""

import pytest

from ocr_spark.kernels.css_select import SelectorError, css_select, parse_selector
from ocr_spark.kernels.html_extract import parse_dom

DOC = """
<!DOCTYPE html><html><body>
<div id="main" class="wrap outer">
  <h1>Title</h1>
  <p class="lead big">first</p>
  <p>second</p>
  <span><p class="lead">nested</p></span>
  <ul>
    <li><a href="/nav/0" rel="x">zero</a></li>
    <li><a href="/nav/1">one</a></li>
    <li><a href="https://other/2">two</a></li>
  </ul>
</div>
<div class="wrap"><p>outside</p></div>
</body></html>
"""


def sel(selector, html=DOC):
    return [
        (n.name, "".join(c for c in n.children if isinstance(c, str)).strip())
        for n in css_select(parse_dom(html), selector)
    ]


def test_tag_and_universal():
    assert sel("h1") == [("h1", "Title")]
    assert len(sel("p")) == 4
    names = [t for t, _ in sel("ul *")]
    assert names == ["li", "a", "li", "a", "li", "a"]


def test_id_class_compound():
    assert [t for t, _ in sel("#main")] == ["div"]
    assert len(sel("div.wrap")) == 2
    assert len(sel("div.wrap.outer")) == 1
    assert sel("p.lead.big") == [("p", "first")]


def test_child_vs_descendant():
    # child: only p elements directly under #main (nested one excluded)
    assert [x for _, x in sel("#main > p")] == ["first", "second"]
    # descendant: includes the span-nested p
    assert [x for _, x in sel("#main p")] == ["first", "second", "nested"]


def test_sibling_combinators():
    assert sel("h1 + p") == [("p", "first")]
    assert [x for _, x in sel("h1 ~ p")] == ["first", "second"]
    assert sel("p + p") == [("p", "second")]


def test_attribute_tests():
    assert len(sel("a[href]")) == 3
    assert sel('a[href="/nav/0"]') == [("a", "zero")]
    assert [x for _, x in sel('a[href^="/nav/"]')] == ["zero", "one"]
    assert sel('a[href$="/2"]') == [("a", "two")]
    assert [x for _, x in sel('a[href*="nav"]')] == ["zero", "one"]
    assert sel("a[rel~=x]") == [("a", "zero")]


def test_pseudo_classes():
    assert sel("li:first-child a") == [("a", "zero")]
    assert sel("li:last-child a") == [("a", "two")]
    assert sel("p:nth-of-type(2)") == [("p", "second")]
    assert [x for _, x in sel("#main p:first-of-type")] == ["first", "nested"]
    assert sel("#main > p:last-of-type") == [("p", "second")]


def test_groups_dedup_and_order():
    # groups union in document order, no duplicates when both match
    got = [x for _, x in sel("p.lead, #main > p")]
    assert got == ["first", "second", "nested"]


def test_errors():
    for bad in ("", "p >", "p !!", ":hover", ":nth-of-type(0)", "p..x"):
        with pytest.raises(SelectorError):
            parse_selector(bad)


def test_operator_on_synth_corpus(spark):
    from ocr_spark.operators.dom_query import css_select_table
    from ocr_spark.sources.pages import pages_df

    out = css_select_table(
        pages_df(spark, "/root/testdata/sf0.001"),
        ["nav li > a", "#content > h2", "h1"],
    )
    rows = out.collect()
    by_sel = {}
    for r in rows:
        by_sel.setdefault(r.selector, []).append(r)
    # every HTML-flavor page has exactly 4 nav links and 2 h1s
    navs = by_sel["nav li > a"]
    assert navs and all(r.text == f"Nav {r.match_idx}" for r in navs)
    h1s = by_sel["h1"]
    assert h1s and all(
        (r.match_idx == 0) == r.text.startswith("Site ") for r in h1s
    )
    assert all(r.text.endswith(" heading") for r in h1s if r.match_idx == 1)
    # non-HTML flavors (pdf/image/docx/payload/code/md) contribute nothing
    assert all(r.url for r in rows)


def test_operator_survives_junk(spark):
    rows = [("u1", b"\x00\xffgarbage"), ("u2", b""), ("u3", b"<p>ok</p>")]
    df = spark.createDataFrame(rows, "url string, html binary")
    from ocr_spark.operators.dom_query import css_select_table

    got = css_select_table(df, ["p"]).collect()
    assert [(r.url, r.text) for r in got] == [("u3", "ok")]


def test_css_select_plan_single_python_stage(spark):
    """N selectors cost ONE DOM parse per page inside ONE MapInPandas; the
    only exchange is the pre-synthesis doc repartition (local test shim)."""
    from ocr_spark.contract import QUERIES
    from tests.conftest import SF_SMOKE

    df = QUERIES["css_select"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 2  # pages synthesis + selector stage
    assert plan.count("Exchange") == 1  # the documented pages_df repartition


def test_selector_fuzz_never_crashes_unexpectedly():
    """Arbitrary selector strings either parse or raise SelectorError —
    never any other exception; parsed ones evaluate without error."""
    from hypothesis import given, settings, strategies as st

    from ocr_spark.kernels.css_select import SelectorError, css_select, parse_selector
    from ocr_spark.kernels.html_extract import parse_dom

    root = parse_dom(DOC)
    alphabet = "abp #.>+~*[]=\"'h1:(),-_x"

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=alphabet, min_size=1, max_size=24))
    def run(sel):
        try:
            groups = parse_selector(sel)
        except SelectorError:
            return
        css_select(root, groups)  # must not raise on any parsed selector

    run()
