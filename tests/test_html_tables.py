"""html_tables: cell-grid extraction from raw page bytes — kernel edge
cases (pure python) + the Spark operator's plan shape."""

from ocr_spark.operators.html_tables import _html_tables


def test_cells_grid_and_tag_stripping():
    html = (
        b"<html><body><table>"
        b"<tr><td>key</td><th> val </th></tr>"
        b"<tr><td><b>row0</b> x</td><td>7</td></tr>"
        b"</table></body></html>"
    )
    cells = _html_tables("https://h.example/", html)
    assert cells == [
        (0, 0, 0, "key"),
        (0, 0, 1, "val"),
        (0, 1, 0, "row0 x"),
        (0, 1, 1, "7"),
    ]


def test_multiple_tables_indexed_in_order():
    html = (
        b"<html><body>"
        b"<table><tr><td>a</td></tr></table>"
        b"<p>between</p>"
        b"<TABLE><TR><TD>b</TD></TR></TABLE>"
        b"</body></html>"
    )
    cells = _html_tables("u", html)
    assert [(c[0], c[3]) for c in cells] == [(0, "a"), (1, "b")]


def test_non_html_and_malformed_yield_nothing():
    assert _html_tables("u", b"") == []
    assert _html_tables("u", b"plain text, no tags at all") == []
    assert _html_tables("u", b"%PDF-1.4 binary junk \x00\x01") == []
    # unclosed table: non-greedy span never completes -> no rows, no crash
    assert _html_tables("u", b"<html><table><tr><td>x</td></tr>") == []


def test_charset_variants_decode_before_scan():
    inner = "<html><head><meta charset=windows-1252></head><body><table><tr><td>café</td></tr></table></body></html>"
    cells = _html_tables("u", inner.encode("cp1252"))
    assert cells == [(0, 0, 0, "café")]
    utf16 = b"\xff\xfe" + inner.replace("meta charset=windows-1252", "x").encode(
        "utf-16-le"
    )
    assert _html_tables("u", utf16) == [(0, 0, 0, "café")]


def test_operator_single_python_stage(spark):
    from ocr_spark.operators.html_tables import extract_html_tables

    df = spark.createDataFrame(
        [("https://h.example/1", b"<html><table><tr><td>z</td></tr></table></html>")],
        "url string, html binary",
    )
    out = extract_html_tables(df)
    assert [tuple(r) for r in out.collect()] == [("https://h.example/1", 0, 0, 0, "z")]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow map: scan parallelism end to end
