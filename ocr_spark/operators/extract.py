"""The flagship extraction operator: pages -> (url, title, text, spans).

Architecture (SURVEY.md §3.1 "Spark lifecycle equivalent"): the whole
detect -> recognize -> order -> assemble chain for one document is a pure
function of one input row, so it runs in a SINGLE ``mapInPandas`` stage —
one Arrow batch in, one batch of extracted documents out, **zero shuffles**.
Per-document kernels (combine_boxes, CTC decode) are numpy inside the batch;
CTC decoding is batched across every line of every document in the Arrow
chunk (the analog of the reference's pad_batch at base_ocr.py:210-211).

Reference path reproduced (behavior only):
- HTML pages: prepare_html + extract_paragraphs
  (/root/reference/utils/text/parsers/html_parser.py:26-227) — kernel D8.
- payload pages (embedded PDF/image analog): word boxes -> combine_boxes
  (/root/reference/utils/image/bounding_box/combination.py:339-361) ->
  per-line CTC decode (/root/reference/utils/text/ctc_decoder.py:14-36) ->
  reading-order sort (processing.py:20-96 'top') -> ' \\n'-joined paragraphs
  (/root/reference/models/ocr/base_ocr.py:229-236).

The char vocab is broadcast-once-per-executor via a module-level lazy
singleton inside the UDF closure (north_rule: "broadcasts decoder tables /
model weights once per executor — no per-row Python").
"""

from __future__ import annotations

import json

import numpy as np

from ..kernels import ctc as ctc_kernel
from ..kernels.boxes import convert_boxes
from ..kernels.combine import combine_boxes
from ..kernels.html_extract import extract_page
from ..kernels.md_extract import (
    looks_like_html,
    mostly_text,
    parse_markdown,
    render_md_document,
    render_md_paragraph,
)
from ..kernels.doc_parsers import looks_like_docx, sniff_code_lang
from ..kernels.encoding import decode_bytes, detect_bom
from ..kernels.sort import sort_boxes_xywh
from ..sources.pages import PAYLOAD_MAGIC

SPAN_STRUCT = (
    "struct<seq:int,kind:string,section:string,text:string,"
    "x0:double,y0:double,x1:double,y1:double,score:double>"
)
EXTRACT_SCHEMA = (
    "url string, warc_ts timestamp, lang string, title string, "
    f"text string, spans array<{SPAN_STRUCT}>, n_spans int"
)

# lazy per-worker decoder table (ship once per executor, not per row)
_VOCAB: list[str] | None = None
_VOCAB_INDEX: dict | None = None


def _get_vocab():
    global _VOCAB, _VOCAB_INDEX
    if _VOCAB is None:
        _VOCAB = ctc_kernel.make_vocab()
        _VOCAB_INDEX = {c: i for i, c in enumerate(_VOCAB)}
    return _VOCAB, _VOCAB_INDEX


def _sanitize(text: str, index: dict) -> str:
    return ctc_kernel.sanitize_for_vocab(text, index)


def _extract_html_doc(html: bytes):
    from ..kernels.html_extract import render_paragraph

    title, paragraphs, text = extract_page(html)
    spans = _banded_spans(
        [
            (para["type"], " > ".join(para.get("section", [])), render_paragraph(para))
            for para in paragraphs
        ]
    )
    return title or "", text, spans


def _extract_md_doc(blob: bytes):
    """Markdown / plain-text page (S5 dispatch fallback): same span shape
    as the HTML path; title = first heading if any."""
    text_in = decode_bytes(blob)[0]
    paragraphs = parse_markdown(text_in)
    spans = _banded_spans(
        [
            (
                para["type"],
                # skipped heading levels pad the stack with "" — drop them
                # from the breadcrumb
                " > ".join(s for s in para.get("section", []) if s),
                render_md_paragraph(para),
            )
            for para in paragraphs
        ]
    )
    title = next(
        (s for para in paragraphs for s in para.get("section", []) if s), ""
    )
    return title, render_md_document(paragraphs), spans


def _banded_spans(items):
    """Document-order pseudo-box spans (FIXTURES.md §1): items of
    (kind, section, text) -> span dicts."""
    spans = []
    n = max(len(items), 1)
    for i, (kind, section, text) in enumerate(items):
        spans.append(
            {
                "seq": i,
                "kind": kind,
                "section": section,
                "text": text,
                "x0": 0.05,
                "y0": i / n,
                "x1": 0.95,
                "y1": (i + 1) / n,
                "score": 1.0,
            }
        )
    return spans


def _extract_docx_doc(blob: bytes):
    """S5 docx route: one paragraph per w:p (reference docx_parser.py:14-21),
    empty paragraphs dropped at assembly."""
    from ..kernels.doc_parsers import parse_docx

    paragraphs = [p for p in parse_docx(blob) if p["text"].strip()]
    spans = _banded_spans([("text", "", p["text"]) for p in paragraphs])
    return "", "\n\n".join(p["text"] for p in paragraphs), spans


def _extract_code_doc(text_in: str, lang: str):
    """S5 py/java routes: 'type: code' paragraphs (reference
    py_parser.py:15-25 split / java_parser.py:13-18 whole-file)."""
    from ..kernels.doc_parsers import parse_java_source, parse_python_source

    if lang == "python":
        paragraphs = parse_python_source(text_in)
    else:
        paragraphs = parse_java_source(text_in)
    paragraphs = [p for p in paragraphs if p["text"].strip()]
    spans = _banded_spans([("code", p["language"], p["text"]) for p in paragraphs])
    return "", "\n\n".join(p["text"] for p in paragraphs), spans


def _extract_image_doc(blob: bytes):
    """REAL image page (PNG/JPEG of rendered text): decode the codec
    (kernels/imagecodec.py), detect word boxes from ink projections and
    recognize glyph cells by template matching (kernels/pixel_ocr.py) —
    the detect->recognize path on actual pixels, no fixture logits."""
    from ..kernels.imagecodec import jpeg_decode, png_decode
    from ..kernels.pixel_ocr import ocr_page

    img = png_decode(blob) if blob[:4] == b"\x89PNG" else jpeg_decode(blob)
    if img.ndim == 3:
        img = img.mean(axis=2).astype("uint8")

    # group detected words into lines by their band top (the detector
    # emits reading order: bands top-to-bottom, words left-to-right)
    lines: list[dict] = []
    for (x0, y0, x1, y1), word in ocr_page(img):
        if not lines or abs(y0 - lines[-1]["y0"]) > 1e-9:
            lines.append({"y0": y0, "y1": y1, "x0": x0, "x1": x1, "words": []})
        cur = lines[-1]
        cur["words"].append(word)
        cur["x0"] = min(cur["x0"], x0)
        cur["x1"] = max(cur["x1"], x1)
        cur["y1"] = max(cur["y1"], y1)

    spans = []
    texts = []
    for i, line in enumerate(lines):
        text = " ".join(line["words"])
        texts.append(text)
        spans.append(
            {
                "seq": i,
                "kind": "ocr",
                "section": "",
                "text": text,
                "x0": line["x0"],
                "y0": line["y0"],
                "x1": line["x1"],
                "y1": line["y1"],
                "score": 1.0,
            }
        )
    return "", "\n".join(texts), spans


def _extract_pdf_doc(blob: bytes):
    """Real PDF bytes -> (title, text, spans).

    Byte-level scan via kernels/pdf_parse.py (xref/ObjStm/Flate/content
    interpreter), then the W8/W9 layout kernels (kernels/pdf_layout.py,
    reference pdf_parser.py:180-346 semantics). Running headers and page
    numbers are dropped (reference process_paragraphs behavior); footnotes
    are kept, tagged kind='footnote'. Title = first largest-font paragraph.
    """
    from ..kernels.pdf_layout import process_page
    from ..kernels.pdf_parse import parse_pdf_pages

    paragraphs = []
    for page in parse_pdf_pages(blob):
        for para in process_page(page["blocks"]):
            para["page"] = page["page"]
            paragraphs.append(para)

    kept = [
        p for p in paragraphs
        if p.get("text") and not p.get("is_header") and not p.get("is_page_number")
    ]
    title = ""
    if kept:
        best = max(p["font_size"] for p in kept)
        title = next(p["text"] for p in kept if p["font_size"] == best)

    spans = []
    for i, para in enumerate(kept):
        box = [float(v) for v in para["box"]]
        spans.append(
            {
                "seq": i,
                "kind": "footnote" if para.get("is_footnote") else "pdf",
                "section": f"page {para['page']}",
                "text": para["text"],
                "x0": box[0],
                "y0": box[1],
                "x1": box[2],
                "y1": box[3],
                "score": 1.0,
            }
        )
    return title, "\n\n".join(p["text"] for p in kept), spans


def _plan_payload_doc(html: bytes):
    """Parse payload; run detect/order kernels; return per-line decode jobs.

    Returns (paragraph plan, line_jobs) where line_jobs are (T,V) logits to
    decode; the final assembly happens after batched CTC decode.
    """
    vocab, index = _get_vocab()
    payload = json.loads(html[len(PAYLOAD_MAGIC) :].decode("utf-8"))

    word_boxes, word_texts = [], []
    for line in payload["lines"]:
        for box, word in zip(line["boxes"], line["words"]):
            word_boxes.append(box)
            word_texts.append(word)

    if not word_boxes:
        return [], []

    word_boxes = np.asarray(word_boxes, dtype=np.float64)
    para_boxes, para_indices, para_rows = combine_boxes(word_boxes)

    # reading order over paragraph boxes ('top' banding)
    order = sort_boxes_xywh(
        convert_boxes(para_boxes, "xyxy", "xywh"), method="top"
    )

    paragraphs, jobs = [], []
    for p in order:
        rows = para_rows[p]
        idx_groups = para_indices[p]
        if not isinstance(idx_groups, list):
            idx_groups = [idx_groups]
        if idx_groups and not isinstance(idx_groups[0], list):
            idx_groups = [idx_groups]
        # row order: top-to-bottom by y0 (stable)
        row_order = np.argsort(np.asarray(rows)[:, 1], kind="stable")
        line_job_ids = []
        for r in row_order:
            members = idx_groups[r] if r < len(idx_groups) else []
            members = sorted(members, key=lambda i: word_boxes[i, 0])
            line_text = _sanitize(" ".join(word_texts[i] for i in members), index)
            jobs.append(ctc_kernel.synth_logits_for_text(line_text, vocab))
            line_job_ids.append(len(jobs) - 1)
        paragraphs.append(
            {"box": para_boxes[int(p)], "line_job_ids": line_job_ids, "rows": rows}
        )
    return paragraphs, jobs


def _decode_jobs(all_jobs, method: str = "greedy", num_beams: int = 10):
    """Batched CTC decode over every line in the Arrow chunk.

    greedy (default) is the vectorized hot path; beam reproduces the
    reference's flagship callsite (beam_search, num_beams=10 at
    base_ocr.py:113-115) with a per-sequence prefix beam — same outputs on
    peaked logits, kept off the default path per SURVEY.md §7 risk 7.
    """
    vocab, _ = _get_vocab()
    if not all_jobs:
        return [], np.zeros((0,))
    batch, lengths = ctc_kernel.pad_batch(all_jobs, len(vocab))
    if method == "beam":
        # numpy-batched prefix beam over the whole chunk (VERDICT r01
        # item 9); exact-equal to the per-sequence reference-shaped decoder
        tokens, scores = ctc_kernel.ctc_beam_decode_batch(
            batch, lengths, beam_width=num_beams
        )
    else:
        tokens, scores = ctc_kernel.ctc_greedy_decode_batch(batch, lengths)
    texts = [ctc_kernel.decode_tokens(t, vocab) for t in tokens]
    return texts, scores


def extract_batch(pdf, decode_method: str = "greedy"):
    """pandas chunk of pages -> pandas chunk of extracted documents."""
    import pandas as pd

    html_col = pdf["html"]
    # phase 1: plan every doc; collect all payload line-decode jobs
    plans = []
    all_jobs: list = []
    for html in html_col:
        # per-document guard: at 10^12-doc scale a single malformed page must
        # degrade to an empty extraction, never fail the task (the lineage
        # row still commits, so the url is not retried forever)
        try:
            blob = bytes(html) if html is not None else b""
            # BOM-marked text (UTF-16/32 crawl pages): the byte-level tag
            # sniffers below can't see through NUL-interleaved encodings,
            # so decode first and dispatch on the UTF-8 re-encoding
            if detect_bom(blob) is not None:
                blob = decode_bytes(blob)[0].encode("utf-8")
            if blob.startswith(b"%PDF-"):
                plans.append(("html", _extract_pdf_doc(blob)))
            elif blob[:4] == b"\x89PNG" or blob[:2] == b"\xff\xd8":
                plans.append(("html", _extract_image_doc(blob)))
            elif looks_like_docx(blob):
                plans.append(("html", _extract_docx_doc(blob)))
            elif blob.startswith(PAYLOAD_MAGIC):
                paragraphs, jobs = _plan_payload_doc(blob)
                base = len(all_jobs)
                for para in paragraphs:
                    para["line_job_ids"] = [base + j for j in para["line_job_ids"]]
                all_jobs.extend(jobs)
                plans.append(("payload", paragraphs))
            elif looks_like_html(blob):
                plans.append(("html", _extract_html_doc(blob)))
            elif mostly_text(blob):
                # S5 dispatch: code / markdown / plain-text page (the
                # reference's py/java/md/txt parser routes,
                # parsers/__init__.py:53-201)
                text_in = decode_bytes(blob)[0]
                lang = sniff_code_lang(text_in)
                if lang:
                    plans.append(("html", _extract_code_doc(text_in, lang)))
                else:
                    plans.append(("html", _extract_md_doc(blob)))
            else:
                plans.append(("html", ("", "", [])))  # binary junk -> empty
        except Exception:
            plans.append(("html", ("", "", [])))

    # phase 2: one batched CTC decode for the whole chunk
    line_texts, line_scores = _decode_jobs(all_jobs, method=decode_method)

    # phase 3: assemble
    out = {
        "url": pdf["url"].tolist(),
        "warc_ts": pdf["warc_ts"].tolist(),
        "lang": pdf["lang"].tolist(),
        "title": [],
        "text": [],
        "spans": [],
        "n_spans": [],
    }
    for kind, plan in plans:
        if kind == "html":
            title, text, spans = plan
        else:
            title, spans, para_texts = "", [], []
            for i, para in enumerate(plan):
                texts = [line_texts[j] for j in para["line_job_ids"]]
                scores = [float(line_scores[j]) for j in para["line_job_ids"]]
                para_text = " \n".join(texts)  # base_ocr.py:232
                para_texts.append(para_text)
                box = para["box"]
                spans.append(
                    {
                        "seq": i,
                        "kind": "ocr",
                        "section": "",
                        "text": para_text,
                        "x0": float(box[0]),
                        "y0": float(box[1]),
                        "x1": float(box[2]),
                        "y1": float(box[3]),
                        "score": float(np.mean(scores)) if scores else 0.0,
                    }
                )
            text = "\n\n".join(para_texts)
        out["title"].append(title)
        out["text"].append(text)
        out["spans"].append(spans)
        out["n_spans"].append(len(spans))

    return pd.DataFrame(out)


CHARSET_SCHEMA = "url string, encoding string, source string, n_chars int"


def sniff_charsets(pages_df):
    """Per-page charset detection report: (url, encoding, source, n_chars).

    ``source`` is bom|meta|utf8|fallback (kernels/encoding.py order);
    ``n_chars`` is the decoded-character count. One narrow mapInPandas
    stage, zero shuffles — the same single-python-stage shape as the
    flagship, so it composes into ingest audits at crawl scale."""

    def gen(batches):
        import pandas as pd

        from ..kernels.encoding import decode_bytes

        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                blob = bytes(html) if html is not None else b""
                text, codec, source = decode_bytes(blob)
                rows.append(
                    {
                        "url": url,
                        "encoding": codec,
                        "source": source,
                        "n_chars": len(text),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["url", "encoding", "source", "n_chars"]
            )

    return pages_df.select("url", "html").mapInPandas(gen, schema=CHARSET_SCHEMA)


def extract_pages(pages_df, *, decode_method: str = "greedy"):
    """pages DataFrame -> extracted documents DataFrame (single mapInPandas,
    no shuffle; Catalyst prunes unused page columns from the scan)."""

    def gen(batches):
        for pdf in batches:
            yield extract_batch(pdf, decode_method)

    return pages_df.mapInPandas(gen, schema=EXTRACT_SCHEMA)
