"""Deterministic synthetic Common-Crawl-style pages (FIXTURES.md §1).

Builds the flagship input table with schema exactly per BASELINE.json
``input_hint``: (url string, warc_ts timestamp, html binary, text string,
lang string) — synthesized as a pure deterministic function of each
``documents`` row (doc_id, text, lang), so it scales with the sf directory
and the expected main content is known **by construction** (the golden is
not derived by running the extractor).

Page flavors (by doc_id % 20):
- HTML pages (70%): seeded-grammar page with title, nav/header/footer/aside/
  script boilerplate, content paragraphs, a list, a table; expected text =
  the content parts (already whitespace-collapsed by construction).
- payload pages (5%, % 20 == 0): the html column carries a ``%OCRPAYLOAD%``
  JSON blob of per-word boxes + texts — the analog of the reference's
  detect->recognize path over embedded image payloads
  (/root/reference/models/ocr/base_ocr.py:98-255): combine_boxes ->
  per-line CTC decode (deterministic fixture logits) -> reading order.
- REAL PDF pages (5%, % 20 == 5): genuine PDF bytes from sources/pdf_synth
  (xref table or xref-stream/ObjStm variants, Flate/AHx filters) parsed by
  kernels/pdf_parse -> pdf_layout grouping.
- REAL image pages (5%, % 20 == 8): PNG (75%) or baseline-JPEG (25%)
  bytes of rendered 5x7-font text; extraction decodes the codec, detects
  word boxes from ink projections and template-matches glyphs
  (kernels/pixel_ocr.py) — the detect->recognize path on actual pixels.
- markdown/plain-text pages (5%, % 20 == 10), python/java source pages
  (5%, % 20 == 12), real .docx pages (5%, % 20 == 15) — the remaining S5
  parser-dispatch routes.
- non-UTF-8 HTML (10%): windows-1252 with a ``<meta charset>`` declaration
  (% 20 == 2) and UTF-16-LE with BOM (% 20 == 14) — the charset-sniff
  path (kernels/encoding.py) that real crawls hit on 10-20% of pages.

Skew by design: 30% of urls land on one mega-host (``host0``) to exercise
the salt-based skew mitigation required by the north_rule.
"""

from __future__ import annotations

import datetime as _dt
import json

N_HOSTS = 37
MEGA_HOST_SHARE = 10  # doc_id % 10 < 3 -> host0
_BASE_TS = _dt.datetime(2026, 1, 1, 0, 0, 0)

WORDS_PER_PARA = 12
PARAS_PER_DOC = 4

# payload grid geometry: decisive gaps so combine_boxes grouping is stable
_LINE_H = 0.03
_LINE_GAP = 0.005       # << median(h)/4 -> same paragraph
_PARA_GAP = 0.04        # >> median(h)/4 -> paragraph break
_WORD_W = 0.055
_WORD_GAP = 0.01        # < median(h)*1.5 -> same line
_LINES_PER_PARA = 3
_WORDS_PER_LINE = 3

PAYLOAD_MAGIC = b"%OCRPAYLOAD%"

from ..kernels import ctc as _ctc  # noqa: E402  (vocab = the OCR channel contract)

_VOCAB_INDEX = {c: i for i, c in enumerate(_ctc.make_vocab())}


def host_of(doc_id: int) -> str:
    if doc_id % MEGA_HOST_SHARE < 3:
        return "host0"
    return f"host{1 + doc_id % N_HOSTS}"


def url_of(doc_id: int) -> str:
    return f"https://{host_of(doc_id)}.example/p/{doc_id}"


def warc_ts_of(doc_id: int) -> _dt.datetime:
    return _BASE_TS + _dt.timedelta(seconds=int(doc_id))


def is_payload_doc(doc_id: int) -> bool:
    return doc_id % 20 == 0


#: flavor residues (doc_id % 20) that are NOT routed through _html_doc —
#: only HTML pages carry nav + related-footer anchors
NON_HTML_RESIDUES = (0, 5, 8, 10, 12, 15)

#: modulus of the outlink-target id space. Fixed (sf-independent) so the
#: builder needs no corpus count; targets may be un-crawled urls, exactly
#: like a real link graph's frontier edges.
LINK_TARGET_MOD = 4096


def n_outlinks(doc_id: int) -> int:
    return 1 + doc_id % 3


def link_target(doc_id: int, j: int) -> int:
    return (doc_id * 31 + 97 * j) % LINK_TARGET_MOD


def is_md_doc(doc_id: int) -> bool:
    return doc_id % 20 == 10


def is_pdf_doc(doc_id: int) -> bool:
    return doc_id % 20 == 5


def is_docx_doc(doc_id: int) -> bool:
    return doc_id % 20 == 15


def is_code_doc(doc_id: int) -> bool:
    return doc_id % 20 == 12


def is_image_doc(doc_id: int) -> bool:
    return doc_id % 20 == 8


def code_lang_of(doc_id: int) -> str:
    return "python" if (doc_id // 20) % 2 == 0 else "java"


def _chunk(words: list[str], n: int) -> list[list[str]]:
    return [words[i : i + n] for i in range(0, len(words), n)] or [["empty"]]


# fixed non-ASCII content for the charset flavors: accented Western text
# (cp1252-encodable) and beyond-Latin-1 text (Greek/CJK, UTF-16 territory)
_CP1252_EXTRA = "café naïve déjà vu résumé «détail»"
_UTF16_EXTRA = "Ωmega Δelta 网页 données"


def charset_of(doc_id: int) -> str | None:
    """Charset flavor for HTML pages: windows-1252 + meta declaration
    (doc_id % 20 == 2), UTF-16-LE + BOM (doc_id % 20 == 14), else UTF-8.
    Real crawls are ~10-20% non-UTF-8; these two flavors keep the
    BOM/meta sniff (kernels/encoding.py) on the flagship path."""
    if doc_id % 20 == 2:
        return "cp1252"
    if doc_id % 20 == 14:
        return "utf-16"
    return None


def _html_doc(doc_id: int, words: list[str], lang: str):
    """Build one HTML page + its expected extracted text (by construction)."""
    charset = charset_of(doc_id)
    if charset == "cp1252":
        # every word must survive the single-byte encode; '?' replacements
        # flow identically into the page AND the expected golden
        words = [w.encode("cp1252", "replace").decode("cp1252") for w in words]
    paras = _chunk(words, WORDS_PER_PARA)[:PARAS_PER_DOC]
    para_texts = [" ".join(p) for p in paras]
    title = f"Document {doc_id}"
    section = f"Section {doc_id % 7}"

    list_items = [f"{w} entry {i}" for i, w in enumerate(words[:3])] or ["empty entry 0"]
    table_rows = [(f"row{r}", str((doc_id + r) % 100)) for r in range(2)]

    boiler_nav = "".join(f'<li><a href="/nav/{i}">Nav {i}</a></li>' for i in range(4))
    # deterministic cross-host outlinks (boilerplate footer, so the golden
    # extracted text is unchanged): 1-3 absolute links whose targets are a
    # pure residue function of doc_id — the link-graph oracle re-derives
    # them arithmetically in SQL (contract.ORACLE_SQL['page_links'])
    related = " ".join(
        f'<a href="{url_of(link_target(doc_id, j))}">related {j}</a>'
        for j in range(n_outlinks(doc_id))
    )
    body_parts = [f"<h1>{title} heading</h1>"]
    expected_parts = []
    for i, pt in enumerate(para_texts):
        if i == 1:
            body_parts.append(f"<h2>{section}</h2>")
        # wrap the first word of the first paragraph in <b> to exercise
        # inline-tag text assembly (the ' </' space rule + cross-node
        # _raw_text concatenation); whitespace collapse restores the
        # single-spaced expected text
        if i == 0 and " " in pt:
            head, rest = pt.split(" ", 1)
            body_parts.append(f"<p><b>{head}</b> {rest}</p>")
        else:
            body_parts.append(f"<p>{pt}</p>")
        expected_parts.append(pt)
    body_parts.append("<ul>" + "".join(f"<li>{it}</li>" for it in list_items) + "</ul>")
    expected_parts.append("\n".join("- " + it for it in list_items))
    body_parts.append(
        "<table><tr><td>key</td><td>val</td></tr>"
        + "".join(f"<tr><td>{k}</td><td>{v}</td></tr>" for k, v in table_rows)
        + "</table>"
    )
    expected_parts.append(
        "\n".join(f"key: {k} | val: {v}" for k, v in table_rows)
    )
    if charset == "cp1252":
        body_parts.append(f"<p>{_CP1252_EXTRA}</p>")
        expected_parts.append(_CP1252_EXTRA)
    elif charset == "utf-16":
        body_parts.append(f"<p>{_UTF16_EXTRA}</p>")
        expected_parts.append(_UTF16_EXTRA)

    meta = '<meta charset="windows-1252">' if charset == "cp1252" else ""
    html = (
        "<!DOCTYPE html><html><head>"
        f"{meta}<title>{title}</title>"
        "<script>window.track && window.track();</script>"
        "<style>body{margin:0}</style>"
        "</head><body>"
        f"<header><h1>Site {host_of(doc_id)}</h1><p>site wide slogan</p></header>"
        f"<nav><ul>{boiler_nav}</ul></nav>"
        "<div id=\"content\">" + "".join(body_parts) + "</div>"
        f"<aside><p>promo {doc_id % 5} advert</p></aside>"
        f"<footer><p>footer legal text {doc_id % 3}</p><p>{related}</p></footer>"
        "</body></html>"
    )
    if charset == "cp1252":
        return html.encode("cp1252"), "\n\n".join(expected_parts)
    if charset == "utf-16":
        return b"\xff\xfe" + html.encode("utf-16-le"), "\n\n".join(expected_parts)
    return html.encode("utf-8"), "\n\n".join(expected_parts)


def _md_doc(doc_id: int, words: list[str]):
    """Markdown page + expected text by construction (S5 md/txt route)."""
    paras = _chunk(words, WORDS_PER_PARA)[:PARAS_PER_DOC]
    para_texts = [" ".join(p) for p in paras]
    title = f"Readme {doc_id}"
    items = [f"{w} point {i}" for i, w in enumerate(words[:2])] or ["empty point 0"]
    md_lines = [f"# {title}", ""]
    expected_parts = []
    for i, pt in enumerate(para_texts):
        if i == 1:
            md_lines += [f"## Part {doc_id % 5}", ""]
        md_lines += [pt, ""]
        expected_parts.append(pt)
    md_lines += [f"- {it}" for it in items] + [""]
    expected_parts.append("\n".join("- " + it for it in items))
    md_lines += ["```", f"code_block(doc_id={doc_id})", "```"]
    expected_parts.append(f"code_block(doc_id={doc_id})")
    return "\n".join(md_lines).encode("utf-8"), "\n\n".join(expected_parts)


def _docx_doc(doc_id: int, words: list[str]):
    """Real .docx page (zip of OOXML parts) + expected text by construction
    (S5 docx route, reference docx_parser.py:14-21 paragraph shape)."""
    from ..kernels.doc_parsers import build_docx

    paras = _chunk(words, WORDS_PER_PARA)[:PARAS_PER_DOC]
    texts = [f"Docx Document {doc_id}"] + [" ".join(p) for p in paras]
    # an empty w:p between paragraphs: kept by the parser, dropped at
    # assembly (parity with python-docx Document.paragraphs)
    stored = texts[:1] + [""] + texts[1:]
    return build_docx(stored), "\n\n".join(texts)


def _code_doc(doc_id: int, words: list[str], lang: str):
    """Python / Java source page + expected text (S5 py/java routes).

    Python separators are exactly '\\n\\n' before def/#/class/@ so the
    reference's split regex (py_parser.py:16) re-joins to the identical
    source; Java is one whole-file code paragraph (java_parser.py:13-18).
    """
    w = [x.replace('"', "").replace("\\", "") for x in (words + ["w"] * 6)[:6]]
    if lang == "python":
        src = (
            f"import os\n\n"
            f"# module for doc {doc_id}\n\n"
            f"def alpha_{doc_id % 7}():\n"
            f'    return "{w[0]} {w[1]} {w[2]}"\n\n'
            f"class Thing{doc_id % 5}:\n"
            f'    value = "{w[3]} {w[4]}"\n\n'
            f"@staticmethod\n"
            f"def beta():\n"
            f"    pass\n"
        )
    else:
        src = (
            f"package crawl.docs;\n\n"
            f"import java.util.List;\n\n"
            f"public class Doc{doc_id} {{\n"
            f'    String text = "{w[0]} {w[1]} {w[2]} {w[3]}";\n'
            f"}}\n"
        )
    return src.encode("utf-8"), src


def _image_doc(doc_id: int, words: list[str]):
    """REAL image page: the html column carries PNG (even doc_id//20) or
    baseline-JPEG q90 bytes of a rendered text page (5x7 dot-matrix font).
    The extractor must DECODE the codec, DETECT word boxes from ink
    projections and RECOGNIZE glyphs by template matching
    (kernels/pixel_ocr.py) — no fixture logits anywhere on this route.
    Expected text is the font-sanitized rendition by construction."""
    from ..kernels.imagecodec import jpeg_encode, jpeg_encode_progressive, png_encode
    from ..kernels.pixel_ocr import render_text_image, sanitize_for_font

    lines = []
    wi = 0
    for _ in range(3):
        lines.append(" ".join(words[(wi + k) % max(len(words), 1)] if words else "empty" for k in range(4)))
        wi += 4
    clean = [sanitize_for_font(l) for l in lines]
    # JPEG for 1 in 4 image docs (its pure-Python entropy decode costs
    # ~10 ms/page — measured floor; PNG is ~0.2 ms), fixed scale 2; PNG
    # varies scale 2/3 to keep exercising the detector's scale inference.
    # Half the JPEG docs are PROGRESSIVE (SOF2) — most real web JPEGs
    # are — and both encoders quantize to identical coefficients, so the
    # expected text (and the flagship byte-identity digest) is unchanged.
    if (doc_id // 20) % 4 == 1:
        img = render_text_image(lines, scale=2)
        if (doc_id // 20) % 8 == 1:
            blob = jpeg_encode_progressive(img, quality=90)
        else:
            blob = jpeg_encode(img, quality=90)
    else:
        img = render_text_image(lines, scale=2 + doc_id % 2)
        blob = png_encode(img)
    expected = "\n".join(l for l in clean if l.strip())
    return blob, expected


def _payload_doc(doc_id: int, words: list[str]):
    """Build one payload page: word boxes on a line/paragraph grid.

    Expected text: paragraphs of ' \\n'-joined line texts
    (base_ocr.py:229-236 assembly), '\\n\\n' between paragraphs.
    """
    n_paras = 2
    lines, expected_paras = [], []
    wi = 0
    y = 0.1
    for p in range(n_paras):
        line_texts = []
        for l in range(_LINES_PER_PARA):
            lw = []
            x = 0.1
            boxes = []
            for k in range(_WORDS_PER_LINE):
                w = words[wi % len(words)] if words else "empty"
                wi += 1
                lw.append(w)
                boxes.append([round(x, 4), round(y, 4), round(x + _WORD_W, 4), round(y + _LINE_H, 4)])
                x += _WORD_W + _WORD_GAP
            lines.append({"words": lw, "boxes": boxes})
            # the golden is what the recognition channel can represent:
            # same sanitize as the decode path, so non-lowercase corpora
            # still verify byte-identical
            line_texts.append(_ctc.sanitize_for_vocab(" ".join(lw), _VOCAB_INDEX))
            y += _LINE_H + _LINE_GAP
        y += _PARA_GAP - _LINE_GAP
        expected_paras.append(" \n".join(line_texts))

    payload = {"doc_id": doc_id, "lines": lines}
    blob = PAYLOAD_MAGIC + json.dumps(payload, sort_keys=True).encode("utf-8")
    return blob, "\n\n".join(expected_paras)


def synth_page(doc_id: int, text: str, lang: str):
    """Pure function: documents row -> pages row + expected extraction.

    Returns dict(url, warc_ts, html, text, lang, expected_text).
    ``expected_text`` is the by-construction golden (kept OUT of the pages
    table itself; used by tests and the golden companion table).
    """
    words = text.split()
    if is_payload_doc(doc_id):
        html, expected = _payload_doc(doc_id, words)
    elif is_pdf_doc(doc_id):
        from .pdf_synth import build_pdf

        html, expected = build_pdf(doc_id, text)
    elif is_image_doc(doc_id):
        html, expected = _image_doc(doc_id, words)
    elif is_docx_doc(doc_id):
        html, expected = _docx_doc(doc_id, words)
    elif is_code_doc(doc_id):
        html, expected = _code_doc(doc_id, words, code_lang_of(doc_id))
    elif is_md_doc(doc_id):
        html, expected = _md_doc(doc_id, words)
    else:
        html, expected = _html_doc(doc_id, words, lang)
    return {
        "url": url_of(doc_id),
        "warc_ts": warc_ts_of(doc_id),
        "html": html,
        "text": text,
        "lang": lang,
        "expected_text": expected,
    }


def synth_pages_pdf(pdf: "pandas.DataFrame", with_expected: bool = False):
    """Vectorized batch synthesis over a documents pandas chunk
    (columns doc_id, text, lang) — used inside mapInPandas."""
    import pandas as pd

    rows = [synth_page(int(r.doc_id), r.text, r.lang) for r in pdf.itertuples()]
    out = pd.DataFrame(
        rows,
        columns=["url", "warc_ts", "html", "text", "lang", "expected_text"],
    )
    if not with_expected:
        out = out.drop(columns=["expected_text"])
    return out


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
PAGES_GOLDEN_SCHEMA = PAGES_SCHEMA + ", expected_text string"


def pages_df(
    spark,
    sf_dir: str,
    with_expected: bool = False,
    *,
    replicate: int = 1,
    partitions: int | None = None,
):
    """documents.parquet -> pages DataFrame via mapInPandas.

    The local sf dirs are single parquet files (one scan split), so the
    small pre-synthesis documents relation is repartitioned to
    ``partitions`` (default: the session's shuffle parallelism) — this
    shuffles only (doc_id, text, lang), never the synthesized HTML. On a
    real crawl the input is already thousands of files and this repartition
    is unnecessary.

    ``replicate`` scales the corpus: each source doc becomes ``replicate``
    docs with distinct doc_ids (deterministic), used for CPU-bound
    throughput/scaling measurements.
    """
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text", "lang")
    if replicate > 1:
        reps = spark.range(replicate).select(F.col("id").alias("rep"))
        docs = docs.crossJoin(F.broadcast(reps)).select(
            (F.col("doc_id") * replicate + F.col("rep")).alias("doc_id"), "text", "lang"
        )
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    docs = docs.repartition(partitions, "doc_id")
    schema = PAGES_GOLDEN_SCHEMA if with_expected else PAGES_SCHEMA

    def gen(batches):
        for pdf in batches:
            yield synth_pages_pdf(pdf, with_expected=with_expected)

    return docs.mapInPandas(gen, schema=schema)
