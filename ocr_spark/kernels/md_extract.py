"""Markdown / plain-text extraction — the S5 parser-dispatch analog for
non-HTML text pages (reference: extension-dispatched parsers at
/root/reference/utils/text/parsers/__init__.py:53-201, markdown variant
parsers/md_parser.py; behavior re-specified here, not ported).

Paragraph dicts share the html_extract shape: ``type`` in
{text, code, list}, ``section`` = current heading stack, ``text``/
``items``. Plain text is the degenerate case (no markers): blank-line
paragraphs with an empty section stack.
"""

from __future__ import annotations

import re

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_LIST_ITEM_RE = re.compile(r"^\s*[-*+]\s+(.*)$")
_FENCE_RE = re.compile(r"^\s*(```|~~~)")
_WHITESPACE_RE = re.compile(r"\s+")


def parse_markdown(text: str) -> list[dict]:
    """Line-sweep markdown parse: headings drive the section stack; fenced
    blocks become ``code`` paragraphs verbatim; contiguous list items
    become one ``list`` paragraph; everything else groups into blank-line
    separated ``text`` paragraphs with whitespace collapsed."""
    paragraphs: list[dict] = []
    titles: list[str] = []
    buf: list[str] = []
    items: list[str] = []
    fence: list[str] | None = None

    def flush_text():
        nonlocal buf
        if buf:
            body = _WHITESPACE_RE.sub(" ", " ".join(buf)).strip()
            if body:
                paragraphs.append(
                    {"type": "text", "section": list(titles), "text": body}
                )
        buf = []

    def flush_list():
        nonlocal items
        if items:
            paragraphs.append(
                {"type": "list", "section": list(titles), "items": list(items)}
            )
        items = []

    for line in text.splitlines():
        if fence is not None:
            if _FENCE_RE.match(line):
                code = "\n".join(fence)
                if code.strip():
                    paragraphs.append(
                        {"type": "code", "section": list(titles), "text": code}
                    )
                fence = None
            else:
                fence.append(line)
            continue

        if _FENCE_RE.match(line):
            flush_text()
            flush_list()
            fence = []
            continue

        m = _HEADING_RE.match(line)
        if m:
            flush_text()
            flush_list()
            level = len(m.group(1)) - 1
            titles = titles[:level]
            if len(titles) != level:
                titles.extend([""] * (level - len(titles)))
            titles.append(m.group(2))
            continue

        m = _LIST_ITEM_RE.match(line)
        if m:
            flush_text()
            items.append(_WHITESPACE_RE.sub(" ", m.group(1)).strip())
            continue

        if not line.strip():
            flush_text()
            flush_list()
            continue

        flush_list()
        buf.append(line)

    if fence is not None and fence:
        code = "\n".join(fence)
        if code.strip():  # unterminated fence: keep the code (best effort)
            paragraphs.append({"type": "code", "section": list(titles), "text": code})
    flush_text()
    flush_list()
    return paragraphs


def render_md_paragraph(para: dict) -> str:
    """Deterministic text rendering, mirroring html_extract.render_paragraph."""
    if para["type"] in ("text", "code"):
        return para["text"]
    if para["type"] == "list":
        return "\n".join("- " + item for item in para["items"])
    raise ValueError(f"unknown paragraph type: {para['type']}")


def render_md_document(paragraphs) -> str:
    return "\n\n".join(render_md_paragraph(p) for p in paragraphs)


# a COMPLETE tag: '<' immediately followed by the name, then '>' or
# whitespace+attrs+'>' — prose like 'x < a' or code like 'i<a.length'
# must not match (they have a space after '<' / no closing '>').
# The named-open-tag list alone was too narrow (ADVICE r01: a page built
# from <span>/<li>/<td>/<strong>/<article> only slipped through to the
# markdown route); any CLOSE tag '</name>' is an unambiguous HTML marker
# that neither prose nor Java generics (List<String>) can produce.
_TAG_SNIFF_RE = re.compile(
    rb"<(?:!doctype|html|head|body|p|div|h[1-6]|br|a|ul|table)(?:\s[^>]{0,256})?/?>"
    rb"|</[a-zA-Z][a-zA-Z0-9]*\s*>",
    re.I,
)


def looks_like_html(blob: bytes) -> bool:
    """Content sniff for the S5 dispatch: any complete common open tag OR
    any close tag in the head of the page."""
    return _TAG_SNIFF_RE.search(blob[:4096]) is not None


def mostly_text(blob: bytes, *, threshold: float = 0.85) -> bool:
    """True when the byte stream is plausibly text — the gate that keeps
    binary junk out of the plain-text fallback path. Unicode-aware: the
    prefix is UTF-8 decoded with replacement and the PRINTABLE-CHARACTER
    ratio is tested, so CJK/Cyrillic/accented pages pass while random
    bytes (mostly replacement chars / controls) fail."""
    if not blob:
        return False
    head = blob[:4096].decode("utf-8", errors="replace")
    if not head:
        return False
    ok = sum(1 for ch in head if (ch.isprintable() and ch != "\ufffd") or ch in "\t\n\r ")
    return ok / len(head) >= threshold
