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
