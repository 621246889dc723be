"""S5 dispatch routes added in round 2 (docx / python / java) + the ADVICE
round-1 fixes (html sniff breadth, dice blank-frame parity, RepetitionGate
eviction parity, IVF empty-table guard)."""

import numpy as np
import pytest

from ocr_spark.kernels.doc_parsers import (
    build_docx,
    looks_like_docx,
    parse_docx,
    parse_java_source,
    parse_python_source,
    sniff_code_lang,
)
from ocr_spark.kernels.md_extract import looks_like_html


def test_parse_docx_paragraph_shape():
    blob = build_docx(["Title here", "", "body one", "body & <two>"])
    assert looks_like_docx(blob)
    paras = parse_docx(blob)
    # empties kept at kernel level (python-docx Document.paragraphs parity)
    assert [p["text"] for p in paras] == ["Title here", "", "body one", "body & <two>"]


def test_parse_docx_tabs_and_breaks():
    import io
    import zipfile

    # handcrafted document.xml with w:tab / w:br inside runs
    doc = (
        b'<?xml version="1.0"?><w:document xmlns:w="x"><w:body>'
        b"<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t></w:r></w:p>"
        b"</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    assert parse_docx(buf.getvalue())[0]["text"] == "a\tb\nc"


def test_python_split_rejoin_identity():
    src = (
        "import os\n\n# comment block\n\ndef f():\n    return 1\n\n"
        "class C:\n    pass\n\n@deco\ndef g():\n    pass\n"
    )
    parts = parse_python_source(src)
    assert all(p["type"] == "code" and p["language"] == "python" for p in parts)
    assert len(parts) == 5
    assert "\n\n".join(p["text"] for p in parts) == src
    # blank line NOT followed by def/#/class/@ does not split
    src2 = "def f():\n    x = 1\n\n    return x\n"
    assert len(parse_python_source(src2)) == 1


def test_java_single_paragraph():
    src = "package a.b;\n\npublic class X {}\n"
    parts = parse_java_source(src)
    assert len(parts) == 1 and parts[0]["language"] == "java"
    assert parts[0]["text"] == src


def test_code_sniff():
    assert sniff_code_lang("import os\n\ndef f():\n    pass\n") == "python"
    assert sniff_code_lang("package a.b;\nimport java.util.List;\nclass X {}") == "java"
    assert sniff_code_lang("# Notes\n\nplain markdown prose\n") is None
    # java import has the ';' that python lacks — ordering must not confuse
    assert sniff_code_lang("from x import y\n") == "python"
    assert sniff_code_lang("Just prose mentioning import taxes here") is None


def test_html_sniff_close_tag_breadth():
    # ADVICE r01: span/li/td-only pages must route to the HTML parser
    page = b"<span>alpha</span><li>beta</li><td>gamma</td>"
    assert looks_like_html(page)
    # prose and generics still do not match
    assert not looks_like_html(b"if x < a then stop")
    assert not looks_like_html(b"List<String> xs = new ArrayList<>();")
    assert not looks_like_html(b"i<a.length && j</b")  # '</b' has no '>'


def test_dice_blank_frames_not_duplicates():
    from ocr_spark.streaming.stream_ops import dice_coeff

    z = np.zeros(16)
    assert dice_coeff(z, z) == 0.0  # divide_no_nan parity: blank != dup
    a = np.ones(16)
    assert dice_coeff(a, a) == 1.0


def test_repetition_gate_eviction_parity():
    """A waiting box must survive exactly max_unseen consecutive misses and
    be evicted on the (max_unseen+1)-th (reference keeps unseen <= max)."""
    from ocr_spark.streaming.stream_ops import RepetitionGate

    gate = RepetitionGate(n_repeat=3, max_unseen=2)
    box = [0.1, 0.1, 0.4, 0.2]
    gate.step([box])              # enters waiting, count=1
    gate.step([])                 # unseen=1 (<=2: kept)
    gate.step([])                 # unseen=2 (<=2: kept)
    assert len(gate.waiting) == 1
    out = gate.step([box])        # still tracked: count=2
    assert len(gate.waiting) == 1 and gate.waiting[0][1] == 2 and out == []
    gate2 = RepetitionGate(n_repeat=3, max_unseen=2)
    gate2.step([box])
    gate2.step([])
    gate2.step([])
    gate2.step([])                # unseen=3 (>2): evicted
    assert len(gate2.waiting) == 0


def test_ivf_empty_and_tiny_tables(spark):
    from ocr_spark.operators import similarity as sim_ops

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        sim_ops.ivf_topk(empty, empty, k=3)
    # tiny table: centroids clamp to sample size, query still answers
    rows = [(i, [float(i), 1.0, 0.0]) for i in range(4)]
    tiny = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sim_ops.ivf_topk(tiny, tiny.where("vec_id = 0"), k=2, n_centroids=16, n_probe=16)
    got = out.collect()
    assert len(got) == 2 and all(r.query_id == 0 for r in got)


def test_docx_and_code_pages_byte_identical(spark):
    from ocr_spark.operators.extract import extract_pages
    from ocr_spark.sources.pages import synth_page

    rows = []
    for doc_id in (15, 12, 32):
        p = synth_page(doc_id, "alpha beta gamma delta epsilon zeta " * 10, "en")
        rows.append((p["url"], None, p["html"], "t", "en", p["expected_text"]))
    pages = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string, expected string",
    )
    out = extract_pages(pages.drop("expected"))
    j = out.join(pages.select("url", "expected"), "url")
    assert j.where("text = expected").count() == 3
    kinds = {s.kind for r in out.collect() for s in r.spans}
    assert "code" in kinds and "text" in kinds
