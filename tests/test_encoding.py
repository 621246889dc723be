"""Charset sniff/decode (kernels/encoding.py) + the non-UTF-8 corpus
flavors + WARC Content-Encoding / Transfer-Encoding wire shapes."""

import gzip
import io
import zlib

import pytest

from ocr_spark.kernels.encoding import (
    decode_bytes,
    detect_bom,
    normalize_label,
    sniff_charset,
)
from ocr_spark.sources.warc import parse_warc, write_warc


# ---------------------------------------------------------------- sniffing

def test_bom_priority_and_lengths():
    assert detect_bom(b"\xef\xbb\xbfhi") == ("utf-8", 3)
    assert detect_bom(b"\xff\xfeh\x00") == ("utf-16-le", 2)
    assert detect_bom(b"\xfe\xff\x00h") == ("utf-16-be", 2)
    # UTF-32-LE BOM starts with the UTF-16-LE one: longer match must win
    assert detect_bom(b"\xff\xfe\x00\x00h\x00\x00\x00") == ("utf-32-le", 4)
    assert detect_bom(b"\x00\x00\xfe\xff\x00\x00\x00h") == ("utf-32-be", 4)
    assert detect_bom(b"plain") is None


def test_meta_charset_declaration_both_forms():
    a = b'<html><head><meta charset="windows-1252"></head><body>x</body>'
    b = (
        b'<html><head><meta http-equiv="Content-Type" '
        b'content="text/html; charset=iso-8859-1"></head>'
    )
    assert sniff_charset(a) == ("cp1252", "meta")
    # the web's latin-1 IS windows-1252 (WHATWG label aliasing)
    assert sniff_charset(b) == ("cp1252", "meta")


def test_meta_utf16_without_bom_is_treated_as_utf8():
    # WHATWG: a readable utf-16 declaration proves the doc is not UTF-16
    blob = b'<meta charset="utf-16le"><p>ascii</p>'
    assert sniff_charset(blob) == ("utf-8", "meta")


def test_unknown_label_falls_through_to_utf8_probe():
    blob = '<meta charset="x-nonexistent-enc"><p>café</p>'.encode("utf-8")
    assert sniff_charset(blob) == ("utf-8", "utf8")


def test_invalid_utf8_without_declaration_falls_back_cp1252():
    blob = b"<p>caf\xe9</p>"  # 0xE9 = e-acute in cp1252, invalid UTF-8 here
    codec, source = sniff_charset(blob)
    assert (codec, source) == ("cp1252", "fallback")
    text, _, _ = decode_bytes(blob)
    assert "café" in text


@pytest.mark.parametrize(
    "label,codec",
    [
        ("UTF-8", "utf-8"),
        ("Shift_JIS", "cp932"),  # WHATWG: shift_jis -> windows-31j
        ("gb2312", "gbk"),       # WHATWG: gb2312 -> GBK
        ("EUC-KR", "cp949"),     # WHATWG: euc-kr -> windows-949
        ("latin1", "cp1252"),
        ("no-such-charset", None),
    ],
)
def test_label_normalization(label, codec):
    assert normalize_label(label) == codec


def test_decode_bytes_roundtrips_declared_charsets():
    text = "déjà vu «détail» naïve"
    page = f'<meta charset="windows-1252"><p>{text}</p>'.encode("cp1252")
    got, codec, source = decode_bytes(page)
    assert (codec, source) == ("cp1252", "meta")
    assert text in got

    sj = f'<meta charset="Shift_JIS"><p>日本語のページ</p>'.encode("cp932")
    got, codec, source = decode_bytes(sj)
    assert (codec, source) == ("cp932", "meta")
    assert "日本語のページ" in got


def test_decode_bytes_utf16_bom():
    text = "Ωmega Δelta 网页"
    page = b"\xff\xfe" + f"<html><body><p>{text}</p></body></html>".encode("utf-16-le")
    got, codec, source = decode_bytes(page)
    assert (codec, source) == ("utf-16-le", "bom")
    assert text in got and "�" not in got


def test_decode_never_raises_on_junk():
    for blob in (b"", b"\x00\xff" * 100, b"\xff\xfe", b"\xef\xbb\xbf", bytes(range(256))):
        text, codec, source = decode_bytes(blob)
        assert isinstance(text, str) and isinstance(codec, str)


# ------------------------------------------------- corpus flavor -> extract

def _mk_pages(doc_ids):
    import pandas as pd

    from ocr_spark.sources.pages import synth_page

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    return pd.DataFrame([synth_page(i, words.strip(), "en") for i in doc_ids])


def test_cp1252_and_utf16_flavors_extract_byte_identical():
    from ocr_spark.operators.extract import extract_batch
    from ocr_spark.sources.pages import charset_of

    assert charset_of(2) == "cp1252" and charset_of(14) == "utf-16"
    pdf = _mk_pages([2, 14, 22, 34])
    out = extract_batch(pdf[["url", "warc_ts", "html", "text", "lang"]])
    for exp, got in zip(pdf["expected_text"], out["text"]):
        assert got == exp
    # the non-ASCII content actually survived (not replaced/dropped)
    assert "café" in out["text"][0] and "网页" in out["text"][1]


def test_cp1252_flavor_bytes_are_not_valid_utf8():
    # guards the fixture from silently degenerating to ASCII-only pages
    pdf = _mk_pages([2])
    blob = bytes(pdf["html"][0])
    with pytest.raises(UnicodeDecodeError):
        blob.decode("utf-8")


def test_utf16_page_routes_through_html_not_junk():
    from ocr_spark.operators.extract import extract_batch

    pdf = _mk_pages([14])
    out = extract_batch(pdf[["url", "warc_ts", "html", "text", "lang"]])
    assert out["n_spans"][0] > 0


# -------------------------------------------------------- WARC wire shapes

_HTML = b"<html><body><p>hello compressed world</p></body></html>"


def _one(url=b"https://h.example/x", **kw):
    recs = parse_warc(write_warc([(url.decode(), None, _HTML)], **kw))
    assert len(recs) == 1
    return recs[0]["html"]


def test_warc_gzip_content_encoding_decoded():
    assert _one(body_encoding="gzip") == _HTML


def test_warc_chunked_transfer_decoded():
    assert _one(chunked=True) == _HTML


def test_warc_gzip_plus_chunked_decoded():
    # wire order: gzip'd entity, then chunk framing; reader must undo
    # chunking first, then decompress
    assert _one(body_encoding="gzip", chunked=True) == _HTML


def test_warc_plain_body_unchanged():
    assert _one() == _HTML


def test_warc_deflate_both_wrappings():
    from ocr_spark.sources.warc import _decode_http_body

    zl = zlib.compress(_HTML)
    raw = zlib.compressobj(wbits=-zlib.MAX_WBITS)
    rawb = raw.compress(_HTML) + raw.flush()
    assert _decode_http_body(zl, {"content-encoding": "deflate"}) == _HTML
    assert _decode_http_body(rawb, {"content-encoding": "deflate"}) == _HTML


def test_warc_corrupt_gzip_degrades_to_raw():
    from ocr_spark.sources.warc import _decode_http_body

    junk = b"\x1f\x8b-not-really-gzip"
    assert _decode_http_body(junk, {"content-encoding": "gzip"}) == junk


def test_warc_malformed_chunked_degrades():
    from ocr_spark.sources.warc import _dechunk

    assert _dechunk(b"nonsense with no framing") == b""
    assert _dechunk(b"5\r\nhello\r\n0\r\n\r\n") == b"hello"
    assert _dechunk(b"5;ext=1\r\nhello\r\nZZ\r\n") == b"hello"  # bad size stops


def test_warc_gzip_body_extraction_end_to_end(tmp_path):
    """gzip-encoded HTML body -> pages -> extraction: text is identical to
    the uncompressed page's extraction."""
    from ocr_spark.operators.extract import extract_batch
    import pandas as pd

    page = (
        b"<!DOCTYPE html><html><head><title>t</title></head>"
        b"<body><p>the real content line</p></body></html>"
    )
    recs = parse_warc(write_warc([("https://h/x", None, page)], body_encoding="gzip"))
    pdf = pd.DataFrame(
        {
            "url": ["https://h/x"],
            "warc_ts": [None],
            "html": [recs[0]["html"]],
            "text": [""],
            "lang": [""],
        }
    )
    out = extract_batch(pdf)
    assert out["text"][0] == "the real content line"
