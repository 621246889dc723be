"""Deterministic synthetic REAL-PDF pages + by-construction expected text.

Round-1 used an invented ``%OCRPAYLOAD%`` JSON wrapper for the embedded-
document path; this module replaces that boundary for the PDF route with
genuine PDF 1.4/1.5 bytes: xref table or cross-reference stream + object
streams, Flate / ASCIIHex-chained content streams, a two-page page tree
with inherited MediaBox/Resources, Courier metrics, and the full text
operator family (Td/TD/Tm/T*/TL/Ts/Tj/TJ/'/" plus q/cm/Q).

The layout constants are chosen so the grouping performed by
``kernels/pdf_layout.py`` (reference semantics of
/root/reference/utils/text/parsers/pdf_parser.py:180-346) is *decisively*
determined — every threshold is cleared with wide margin — which makes the
expected extracted text computable at write time (the golden is by
construction, not by running the extractor):

- page 1: running header (font 8, top 3% -> ``is_header``), title (18),
  two 3-line body paragraphs (font 10, leading 12, paragraph step 24),
  a footnote (font 7, *below* the page number so the reference's footnote
  rule fires), a digits-only page number (font 9, last in content order
  -> ``is_page_number``);
- page 2: section heading (14), a body paragraph whose first line is two
  runs + a raised font-6 superscript marker (exercises the space-insertion
  and ^-marker rules), a TJ-with-kerning line, ' and " line operators,
  then a second paragraph and the page number.

Stream-encoding variant per doc: (doc_id // 20) % 4 ->
0 = uncompressed + classic xref; 1 = Flate + classic xref;
2 = Flate + xref STREAM + object stream; 3 = Flate|ASCIIHex chain + classic.
"""

from __future__ import annotations

import zlib

PAGE_W, PAGE_H = 612.0, 792.0
_COUR_W = 0.6          # Courier advance per unit font size
_ASC, _DESC = 0.629, -0.157

_BODY_SIZE, _LEAD, _PARA_STEP = 10, 12, 24
_WORDS_PER_LINE = 6


def _ascii_words(text: str) -> list[str]:
    out = []
    for w in text.split():
        w = w.encode("ascii", "ignore").decode()
        if w and w.isprintable():
            out.append(w)
    if len(out) < _WORDS_PER_LINE:
        out += [f"word{i}" for i in range(_WORDS_PER_LINE - len(out))]
    return out


def _esc(s: str) -> bytes:
    return (
        s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    ).encode("latin-1")


def _w(size: float, s: str) -> float:
    return _COUR_W * size * len(s)


class _Take:
    """Deterministic cyclic word supply."""

    def __init__(self, words):
        self.words, self.i = words, 0

    def line(self, n=_WORDS_PER_LINE, alnum_start=False):
        ws = []
        for _ in range(n):
            w = self.words[self.i % len(self.words)]
            self.i += 1
            ws.append(w)
        if alnum_start and not ws[0][:1].isalnum():
            ws[0] = "also"
        return " ".join(ws)


def _page1(doc_id: int, take: _Take):
    """Returns (content bytes, expected paragraph texts)."""
    host = f"host{doc_id % 37}"
    title = f"Pdf Document {doc_id}"
    p1 = [take.line() for _ in range(3)]
    p2 = [take.line() for _ in range(3)]
    footnote = f"1 See crawl appendix {doc_id % 10}"

    c = bytearray()
    c += b"BT /F1 8 Tf 72 762 Td (" + _esc(f"{host}.example crawl archive") + b") Tj ET\n"
    c += b"BT /F1 18 Tf 72 692 Td (" + _esc(title) + b") Tj ET\n"
    c += b"BT /F1 10 Tf 12 TL 72 660 Td\n"
    c += b"(" + _esc(p1[0]) + b") Tj\n"
    c += b"(" + _esc(p1[1]) + b") '\n"
    c += b"(" + _esc(p1[2]) + b") '\n"
    c += b"0 -24 Td (" + _esc(p2[0]) + b") Tj\n"
    c += b"(" + _esc(p2[1]) + b") '\n"
    c += b"(" + _esc(p2[2]) + b") '\nET\n"
    c += b"BT /F1 7 Tf 72 25 Td (" + _esc(footnote) + b") Tj ET\n"
    c += b"BT /F1 9 Tf 300 40 Td (1) Tj ET\n"
    expected = [title, " \n".join(p1), " \n".join(p2), footnote]
    return bytes(c), expected


def _page2(doc_id: int, take: _Take):
    heading = f"Part {doc_id % 5}"
    # both runs of the split line start alnum: the line-assembly space rule
    # (pdf_layout.py:89-91) inserts a leading ' ' before a punctuation-led
    # FIRST block, which the by-construction expected text does not model
    run1 = take.line(3, alnum_start=True)
    run2 = take.line(3, alnum_start=True)
    tj_words = [take.line(1, alnum_start=True) for _ in range(3)]
    line3 = take.line()
    q1 = take.line()
    q2 = take.line()

    x2 = 72 + _w(_BODY_SIZE, run1) + 6.0       # one space-width gap -> ' '
    x3 = x2 + _w(_BODY_SIZE, run2) + 0.5       # superscript marker site

    c = bytearray()
    c += b"q 1 0 0 1 0 0 cm\n"
    c += b"BT /F1 14 Tf 72 700 Td (" + _esc(heading) + b") Tj ET\n"
    c += b"BT /F1 10 Tf 12 TL\n"
    c += b"72 660 Td (" + _esc(run1) + b") Tj\n"
    c += f"1 0 0 1 {x2:.2f} 660 Tm ".encode() + b"(" + _esc(run2) + b") Tj\n"
    c += f"1 0 0 1 {x3:.2f} 660 Tm ".encode() + b"/F1 6 Tf 4 Ts (z) Tj 0 Ts /F1 10 Tf\n"
    # TJ with explicit spaces inside strings + kerning adjustments
    c += b"1 0 0 1 72 648 Tm [(" + _esc(tj_words[0] + " ") + b") -40 ("
    c += _esc(tj_words[1] + " ") + b") -40 (" + _esc(tj_words[2]) + b")] TJ\n"
    c += b"1 0 0 1 72 636 Tm (" + _esc(line3) + b") Tj\n"
    c += b"1 0 0 1 72 612 Tm (" + _esc(q1) + b") Tj\n"
    c += b'0 0 (' + _esc(q2) + b') "\nET\n'
    c += b"BT /F1 9 Tf 300 40 Td (2) Tj ET\nQ\n"

    line1 = f"{run1} {run2}^z"
    line2 = " ".join(tj_words)
    expected = [heading, " \n".join([line1, line2, line3]), " \n".join([q1, q2])]
    return bytes(c), expected


def _stream_obj(payload: bytes, variant: int) -> bytes:
    if variant == 0:
        return b"<< /Length %d >>\nstream\n%s\nendstream" % (len(payload), payload)
    if variant == 3:
        enc = zlib.compress(payload, 6).hex().encode("ascii") + b">"
        return (
            b"<< /Length %d /Filter [/ASCIIHexDecode /FlateDecode] >>\nstream\n%s\nendstream"
            % (len(enc), enc)
        )
    enc = zlib.compress(payload, 6)
    return b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream" % (len(enc), enc)


def build_pdf(doc_id: int, text: str):
    """documents row -> (real PDF bytes, expected extracted text).

    Expected text = title + body paragraphs + footnote (page 1), heading +
    body paragraphs (page 2); running header and page numbers are dropped
    by the extractor (reference process_paragraphs semantics).
    """
    take = _Take(_ascii_words(text))
    c1, exp1 = _page1(doc_id, take)
    c2, exp2 = _page2(doc_id, take)
    variant = (doc_id // 20) % 4

    bodies = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: (
            b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 "
            b"/MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 5 0 R >> >> >>"
        ),
        3: b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>",
        4: b"<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>",
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>",
        6: _stream_obj(c1, variant),
        7: _stream_obj(c2, variant),
    }

    if variant == 2:
        pdf = _emit_xref_stream_pdf(bodies)
    else:
        pdf = _emit_classic_pdf(bodies)
    expected = "\n\n".join(exp1 + exp2)
    return pdf, expected


def _emit_classic_pdf(bodies: dict[int, bytes]) -> bytes:
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(bodies):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + bodies[num] + b"\nendobj\n"
    xref_at = len(out)
    n = max(bodies) + 1
    out += b"xref\n0 %d\n" % n
    out += b"0000000000 65535 f \n"
    for num in range(1, n):
        out += b"%010d 00000 n \n" % offsets[num]
    out += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (n, xref_at)
    return bytes(out)


def _emit_xref_stream_pdf(bodies: dict[int, bytes]) -> bytes:
    """PDF 1.5 flavor: non-stream objects 1-5 packed into an object stream
    (obj 8), xref emitted as a /Type /XRef stream (obj 9) with the PNG Up
    predictor — exercising the ObjStm + predictor decode paths."""
    packed = [n for n in sorted(bodies) if not bodies[n].startswith(b"<< /Length")]
    toplevel = [n for n in sorted(bodies) if n not in packed]

    parts, header = [], []
    off = 0
    for n in packed:
        header.append(b"%d %d" % (n, off))
        parts.append(bodies[n])
        off += len(bodies[n]) + 1
    objstm_payload = b" ".join(header) + b"\n" + b"\n".join(parts) + b"\n"
    first = len(b" ".join(header)) + 1
    objstm_enc = zlib.compress(objstm_payload, 6)
    objstm_body = (
        b"<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
        % (len(packed), first, len(objstm_enc), objstm_enc)
    )

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in toplevel:
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + bodies[num] + b"\nendobj\n"
    offsets[8] = len(out)
    out += b"8 0 obj\n" + objstm_body + b"\nendobj\n"

    # xref stream rows: W = [1 4 2]; type2 entries point into objstm 8
    size = 10
    rows = [b"\x00" + (0).to_bytes(4, "big") + (0).to_bytes(2, "big")]
    for num in range(1, size):
        if num in packed:
            rows.append(b"\x02" + (8).to_bytes(4, "big") + packed.index(num).to_bytes(2, "big"))
        elif num in offsets or num == 9:
            o = offsets.get(num, 0)  # obj 9's own offset patched below
            rows.append(b"\x01" + o.to_bytes(4, "big") + (0).to_bytes(2, "big"))
        else:
            rows.append(b"\x00" + (0).to_bytes(4, "big") + (0).to_bytes(2, "big"))

    xref_at = len(out)
    rows[9] = b"\x01" + xref_at.to_bytes(4, "big") + (0).to_bytes(2, "big")
    # PNG Up predictor, columns = 7
    cols = 7
    pred_rows = bytearray()
    prev = bytes(cols)
    for r in rows:
        pred_rows += b"\x02" + bytes((r[i] - prev[i]) & 0xFF for i in range(cols))
        prev = r
    enc = zlib.compress(bytes(pred_rows), 6)
    out += (
        b"9 0 obj\n<< /Type /XRef /Size %d /W [1 4 2] /Index [0 %d] "
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 7 >> "
        b"/Root 1 0 R /Length %d >>\nstream\n" % (size, size, len(enc))
    )
    out += enc
    out += b"\nendstream\nendobj\n"
    out += b"startxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)
