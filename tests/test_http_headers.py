"""HTTP response-header parsing (operators/http_headers.py)."""

import pandas as pd

from ocr_spark.operators.http_headers import (
    http_header_fields,
    parse_http_headers,
)

BLOCK = (
    b"HTTP/1.1 200 OK\r\n"
    b"Content-Type: text/html; charset=ISO-8859-1\r\n"
    b"ETag: \"abc123\"\r\n"
    b"etag: \"dup-loses\"\r\n"
    b"Last-Modified: Sat, 06 Jun 2026 08:15:30 GMT\r\n"
    b"Cache-Control: private, max-age=600\r\n"
    b"garbage line without colon\r\n"
    b"\r\n"
    b"ETag: \"body-noise\"\r\n"
)


def test_full_block():
    h = parse_http_headers(BLOCK)
    assert h["status"] == 200
    assert h["content_type"] == "text/html"
    assert h["charset"] == "iso-8859-1"
    assert h["etag"] == '"abc123"'  # first occurrence wins; body not read
    assert h["last_modified_ms"] == 1780733730000
    assert h["max_age_s"] == 600
    assert h["no_store"] is False
    assert h["strategy"] == "etag"


def test_strategy_ladder():
    assert parse_http_headers(
        b"HTTP/1.1 200 OK\r\nCache-Control: no-store\r\nETag: \"x\"\r\n"
    )["strategy"] == "refetch"
    assert parse_http_headers(
        b"HTTP/1.1 200 OK\r\nLast-Modified: 1 Jan 2026 00:00:00 GMT\r\n"
    )["strategy"] == "last-modified"
    assert parse_http_headers(b"HTTP/1.1 200 OK\r\n")["strategy"] == "none"
    # weak etag still enables If-None-Match
    assert parse_http_headers(
        b"HTTP/1.1 200 OK\r\nETag: W/\"y\"\r\n"
    )["strategy"] == "etag"


def test_redirect_and_malformed():
    h = parse_http_headers(
        b"HTTP/1.0 301 Moved\r\nLocation: https://b.example/\r\n"
    )
    assert h["status"] == 301 and h["location"] == "https://b.example/"
    # malformed input degrades to NULLs, never raises
    for junk in (b"", b"\xff\xfebinary", b"not a status line\r\nX: y", None):
        h = parse_http_headers(junk)
        assert h["status"] is None and h["strategy"] in ("none",)
    # no-colon-only lines, bad max-age value
    h = parse_http_headers(b"HTTP/1.1 200 OK\r\nCache-Control: max-age=abc\r\n")
    assert h["max_age_s"] is None


def test_http_header_fields_zero_exchange(spark):
    resp = spark.createDataFrame(
        pd.DataFrame({"url": ["u1"], "http_headers": [BLOCK.decode("latin-1")]})
    )
    df = http_header_fields(resp)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # the struct udf must be evaluated once, not once per field
    assert plan.count("ArrowEvalPython") == 1
    r = df.collect()[0]
    assert r.status == 200 and r.strategy == "etag" and r.max_age_s == 600
