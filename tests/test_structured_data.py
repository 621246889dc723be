"""JSON-LD structured-data extraction (operators/structured_data.py)."""

import pytest

from ocr_spark.operators.structured_data import _jsonld_rows, extract_jsonld

URL = "https://h.example/p/1"


def _page(*scripts):
    body = "".join(scripts)
    return f"<html><head>{body}</head><body><p>x</p></body></html>".encode()


def _ld(payload):
    return f'<script type="application/ld+json">{payload}</script>'


def test_scalar_fields_types_and_rendering():
    rows = _jsonld_rows(
        URL,
        _page(_ld('{"@context":"c","@type":"Product","name":"N","price":7,'
                  '"ratio":0.5,"ok":true,"bad":null,"nested":{"a":1},"arr":[1]}')),
    )
    got = {(r[4], r[5]) for r in rows}
    # scalars kept with deterministic rendering; null/nested/array skipped
    assert got == {("name", "N"), ("price", "7"), ("ratio", "0.5"), ("ok", "true")}
    assert all(r[3] == "Product" and r[1] == 0 and r[2] == 0 for r in rows)


def test_graph_envelope_and_top_level_array():
    rows = _jsonld_rows(
        URL,
        _page(_ld('{"@graph":[{"@type":"A","x":"1"},{"@type":"B","y":"2"}]}'),
              _ld('[{"@type":"C","z":"3"}]')),
    )
    assert {(r[1], r[2], r[3], r[4]) for r in rows} == {
        (0, 0, "A", "x"), (0, 1, "B", "y"), (1, 0, "C", "z"),
    }


def test_malformed_block_skipped_later_blocks_survive():
    rows = _jsonld_rows(
        URL,
        _page(_ld('{"@type":"P","name":'),  # malformed
              "<script>var decoy = 1;</script>",
              _ld('{"@type":"Event","name":"E"}')),
    )
    # the Event block keeps its DOCUMENT block index (1), decoys don't count
    assert rows == [(URL, 1, 0, "Event", "name", "E")]


def test_attribute_order_and_quoting_tolerated():
    blob = _page(
        "<script async type='application/ld+json' id=\"a\">"
        '{"@type":"T","k":"v"}</script>'
    )
    assert _jsonld_rows(URL, blob) == [(URL, 0, 0, "T", "k", "v")]


def test_non_html_and_missing_type():
    assert _jsonld_rows(URL, b"\x00\x01binary") == []
    rows = _jsonld_rows(URL, _page(_ld('{"k":"v"}')))
    assert rows == [(URL, 0, 0, None, "k", "v")]


def test_spark_stage_schema_and_resilience(spark):
    pages = spark.createDataFrame(
        [
            ("u1", bytes(_page(_ld('{"@type":"P","n":"1"}')))),
            ("u2", None),
            ("u3", b"not html at all"),
        ],
        "url string, html binary",
    )
    out = extract_jsonld(pages)
    assert [tuple(r) for r in out.collect()] == [("u1", 0, 0, "P", "n", "1")]
    assert out.schema.simpleString() == (
        "struct<url:string,block_idx:int,entity_idx:int,"
        "jtype:string,key:string,value:string>"
    )
