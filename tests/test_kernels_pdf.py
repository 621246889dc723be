"""Tests for PDF layout grouping (W8-W10), cases per FIXTURES.md §4.

Semantics mirror /root/reference/utils/text/parsers/pdf_parser.py:140-369.
"""

from ocr_spark.kernels.pdf_layout import (
    group_blocks_in_lines,
    group_lines_in_paragraphs,
    order_weight,
    process_page,
)


def _block(text, x0, y0, x1, y1, fs=10.0):
    return {"text": text, "box": [x0, y0, x1, y1], "font_size": fs}


def test_line_grouping_with_space_insertion():
    # two runs on one visual line, x-gap > h * 0.35 -> space inserted
    blocks = [
        _block("Hello", 0.10, 0.20, 0.20, 0.24),
        _block("world", 0.25, 0.20, 0.35, 0.24),  # gap 0.05 > 0.04*0.35
    ]
    lines = group_blocks_in_lines(blocks)
    assert len(lines) == 1
    assert lines[0]["text"] == "Hello world"


def test_line_grouping_no_space_when_adjacent():
    blocks = [
        _block("Hel", 0.10, 0.20, 0.20, 0.24),
        _block("lo", 0.201, 0.20, 0.25, 0.24),  # tight gap -> glued
    ]
    lines = group_blocks_in_lines(blocks)
    assert lines[0]["text"] == "Hello"


def test_subscript_and_superscript():
    # c_i : index box starts below the line middle; e^x : exponent box ends above
    blocks = [
        _block("c", 0.10, 0.20, 0.12, 0.26),
        _block("i", 0.121, 0.245, 0.13, 0.262),  # subscript
        _block("plus", 0.16, 0.20, 0.22, 0.26),
        _block("e", 0.25, 0.20, 0.27, 0.26),
        _block("x", 0.271, 0.175, 0.28, 0.215),  # superscript
    ]
    lines = group_blocks_in_lines(blocks)
    assert len(lines) == 1
    assert "_i" in lines[0]["text"]
    assert "^x" in lines[0]["text"]


def test_paragraph_break_on_font_size():
    lines = [
        {"text": "Title line", "box": [0.1, 0.10, 0.5, 0.14], "font_size": 16.0},
        {"text": "body text one", "box": [0.1, 0.16, 0.5, 0.19], "font_size": 10.0},
        {"text": "body text two", "box": [0.1, 0.20, 0.5, 0.23], "font_size": 10.0},
    ]
    paras = group_lines_in_paragraphs(lines)
    assert len(paras) == 2
    assert paras[0]["text"] == "Title line"
    assert paras[1]["text"] == "body text one \nbody text two"


def test_paragraph_break_on_indent_uppercase():
    lines = [
        {"text": "first paragraph line", "box": [0.10, 0.10, 0.5, 0.13], "font_size": 10.0},
        {"text": "continuation line", "box": [0.10, 0.14, 0.5, 0.17], "font_size": 10.0},
        {"text": "New indented paragraph", "box": [0.12, 0.18, 0.5, 0.21], "font_size": 10.0},
    ]
    paras = group_lines_in_paragraphs(lines)
    assert len(paras) == 2
    assert paras[1]["text"] == "New indented paragraph"


def test_soft_hyphen_joins_lines():
    lines = [
        {"text": "hyphen\x02", "box": [0.1, 0.10, 0.5, 0.13], "font_size": 10.0},
        {"text": "ated", "box": [0.1, 0.14, 0.5, 0.17], "font_size": 10.0},
    ]
    paras = group_lines_in_paragraphs(lines)
    assert paras[0]["text"] == "hyphenated"


def test_page_order_weights():
    blocks = [
        _block("Header Line", 0.1, 0.05, 0.5, 0.08, fs=9.0),
        _block("Body paragraph text", 0.1, 0.30, 0.6, 0.34, fs=10.0),
        _block("42", 0.48, 0.96, 0.52, 0.98, fs=9.0),
    ]
    page = process_page(blocks)
    weights = [order_weight(p) for p in page]
    assert weights == sorted(weights)
    assert page[0].get("is_header") is True
    assert page[-1].get("is_page_number") is True


def test_footnote_detection():
    # footnote: small font (median - fs > 1.5) AND last-or-below-successor
    # (pdf_parser.py:146-152)
    blocks = [
        _block("Header Line", 0.1, 0.05, 0.5, 0.08, fs=9.0),
        _block("Body paragraph text", 0.1, 0.30, 0.6, 0.34, fs=10.0),
        _block("tiny footnote text", 0.1, 0.90, 0.4, 0.92, fs=6.0),
    ]
    page = process_page(blocks)
    assert any(p.get("is_footnote") for p in page)
    weights = [order_weight(p) for p in page]
    assert weights == sorted(weights)
