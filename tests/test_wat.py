"""WAT export: round-trip through our own reader, envelope agreement with
the queryable page_meta/page_links tables, idempotent content-addressed
shards, NaT-timestamp handling."""

import gzip
import json
import re

import pandas as pd

from ocr_spark.sources.wat import export_wat, read_wat, wat_record


def _pages(spark, n=12):
    rows = []
    for i in range(n):
        html = (
            f"<html lang='en'><head><title>Page {i}</title>"
            f"<link rel=canonical href='/canon/{i}'>"
            f"<meta name=description content='desc {i}'></head>"
            f"<body><p>body</p>"
            f"<a href='https://other.example/t/{i}'>anchor {i}</a>"
            f"<a href='/rel/{i}'>rel {i}</a></body></html>"
        ).encode()
        rows.append((f"https://h.example/p/{i}", None, html, "", ""))
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).repartition(3)


def test_wat_export_roundtrip_and_idempotence(spark, tmp_path):
    df = _pages(spark)
    out = str(tmp_path / "wat")
    m1 = sorted((r.path, r.n_records) for r in export_wat(df, out).collect())
    assert sum(n for _, n in m1) == 12

    back = read_wat(spark, out + "/*.warc.wat.gz").collect()
    assert {r.url for r in back} == {f"https://h.example/p/{i}" for i in range(12)}
    env = {r.url: json.loads(r.envelope) for r in back}
    e0 = env["https://h.example/p/0"]["Envelope"]
    head = e0["Payload-Metadata"]["HTML-Metadata"]["Head"]
    assert head["Title"] == "Page 0"
    assert head["Canonical"] == "https://h.example/canon/0"
    assert head["Description"] == "desc 0"
    assert head["Lang"] == "en"
    links = e0["Payload-Metadata"]["HTML-Metadata"]["Links"]
    assert [(l["url"], l["text"]) for l in links] == [
        ("https://other.example/t/0", "anchor 0"),
        ("https://h.example/rel/0", "rel 0"),
    ]
    assert e0["WARC-Header-Metadata"]["WARC-Target-URI"] == "https://h.example/p/0"

    # idempotent: re-export writes the same content-addressed files
    m2 = sorted((r.path, r.n_records) for r in export_wat(df, out).collect())
    assert m1 == m2

    # record IDs globally unique + valid urn:uuid form
    ids = []
    for path, _ in m1:
        raw = gzip.decompress(open(path, "rb").read())
        ids += re.findall(rb"WARC-Record-ID: <urn:uuid:([0-9a-f-]{36})>", raw)
    assert len(ids) == 12 and len(set(ids)) == 12


def test_wat_envelope_agrees_with_query_tables(spark, tmp_path):
    """The sidecar must never drift from the queryable tables built by the
    same kernels: titles and anchor lists match extract_page_links /
    extract_page_meta output for the same pages."""
    from ocr_spark.operators.link_graph import extract_page_links
    from ocr_spark.operators.page_meta import extract_page_meta

    df = _pages(spark, n=6)
    out = str(tmp_path / "wat")
    export_wat(df, out).collect()
    env = {
        r.url: json.loads(r.envelope)
        for r in read_wat(spark, out + "/*.warc.wat.gz").collect()
    }

    meta = {r.url: r for r in extract_page_meta(df).collect()}
    links = {}
    for r in extract_page_links(df).orderBy("url", "pos").collect():
        links.setdefault(r.url, []).append((r.dst_url, r.anchor))

    for url, e in env.items():
        h = e["Envelope"]["Payload-Metadata"]["HTML-Metadata"]["Head"]
        assert h["Title"] == meta[url].title
        assert h["Canonical"] == meta[url].canonical_url
        got = [
            (l["url"], l["text"])
            for l in e["Envelope"]["Payload-Metadata"]["HTML-Metadata"]["Links"]
        ]
        assert got == links.get(url, [])


def test_wat_record_deterministic_and_nat_safe():
    rec1 = wat_record("https://x.example/", pd.NaT, b"<html><title>t</title></html>")
    rec2 = wat_record("https://x.example/", None, b"<html><title>t</title></html>")
    assert rec1 == rec2  # NaT == None == pinned epoch; fully deterministic
    assert b"WARC-Type: metadata" in rec1
    assert b"Content-Type: application/json" in rec1
    body = rec1.split(b"\r\n\r\n", 1)[1]
    n = int(re.search(rb"Content-Length: (\d+)", rec1).group(1))
    assert len(body[:n]) == n and json.loads(body[:n].decode())


def test_jsonl_export_roundtrip_native_reader(spark, tmp_path):
    """export_jsonl -> spark.read.json returns the identical documents;
    shards are content-addressed (idempotent re-export); ids are the
    sha256(url) join key."""
    import hashlib

    from ocr_spark.sources.jsonl import export_jsonl

    df = spark.createDataFrame(
        [
            (f"https://h.example/p/{i}", None, f"doc text {i}\nline two {i}", "en")
            for i in range(15)
        ],
        "url string, warc_ts timestamp, text string, lang string",
    ).repartition(3)
    out = str(tmp_path / "jsonl")
    m1 = sorted((r.path, r.n_records) for r in export_jsonl(df, out).collect())
    assert sum(n for _, n in m1) == 15

    back = spark.read.json(out + "/*.jsonl.gz").collect()
    assert len(back) == 15
    by_url = {r.metadata.url: r for r in back}
    for i in range(15):
        u = f"https://h.example/p/{i}"
        assert by_url[u].text == f"doc text {i}\nline two {i}"
        assert by_url[u].id == hashlib.sha256(u.encode()).hexdigest()
        assert by_url[u].source == "ocr_spark"
        assert by_url[u].metadata.lang == "en"

    m2 = sorted((r.path, r.n_records) for r in export_jsonl(df, out).collect())
    assert m1 == m2
