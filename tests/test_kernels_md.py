"""Markdown/plain-text kernel (S5 dispatch fallback)."""

from ocr_spark.kernels.md_extract import (
    looks_like_html,
    mostly_text,
    parse_markdown,
    render_md_document,
)


def test_parse_markdown_structure():
    md = "\n".join([
        "# Title",
        "",
        "first   paragraph",
        "continues here",
        "",
        "## Sub",
        "second paragraph",
        "",
        "- item one",
        "- item two",
        "",
        "```",
        "code {block}",
        "```",
    ])
    paras = parse_markdown(md)
    kinds = [p["type"] for p in paras]
    assert kinds == ["text", "text", "list", "code"]
    assert paras[0]["section"] == ["Title"]
    assert paras[0]["text"] == "first paragraph continues here"  # collapsed
    assert paras[1]["section"] == ["Title", "Sub"]
    assert paras[2]["items"] == ["item one", "item two"]
    assert paras[3]["text"] == "code {block}"
    assert render_md_document(paras).startswith("first paragraph")


def test_plain_text_degenerate():
    paras = parse_markdown("para one\n\npara two line a\nline b\n")
    assert [p["text"] for p in paras] == ["para one", "para two line a line b"]
    assert all(p["section"] == [] for p in paras)


def test_sniffers():
    assert looks_like_html(b"<!DOCTYPE html><html>")
    assert looks_like_html(b"  <p>hi</p>")
    assert not looks_like_html(b"# heading\n2 < 3 is true")
    assert mostly_text(b"plain words here")
    assert not mostly_text(bytes(range(256)) * 4)
    assert not mostly_text(b"")


def test_unterminated_fence_kept():
    paras = parse_markdown("```\ncode only")
    assert paras == [{"type": "code", "section": [], "text": "code only"}]


def test_sniffer_prose_and_code_not_html():
    assert not looks_like_html(b"# Notes\n\nif x < a then stop")
    assert not looks_like_html(b"for (i=0; i<a.length; i++) {}")
    assert looks_like_html(b'<a href="x">l</a>')
    assert looks_like_html(b"<p>t</p>")


def test_mostly_text_unicode():
    assert mostly_text(("这是一个测试页面。" * 50).encode("utf-8"))
    assert mostly_text("café résumé naïve über " .encode("utf-8") * 40)
    assert not mostly_text(bytes(range(256)) * 16)


def test_h6_and_skipped_levels():
    paras = parse_markdown("###### deep\n\npara text\n")
    assert paras[0]["text"] == "para text"
    assert paras[0]["section"][-1] == "deep"
