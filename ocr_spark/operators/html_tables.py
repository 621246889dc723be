"""Relational lift of HTML tables: page bytes -> one row per cell.

Web tables are the densest structured data a crawl carries (entity/
attribute mining, table-QA training sets — WDC Web Table Corpus style);
this operator turns every ``<table>`` in ``html:binary`` into
``(url, table_idx, row_idx, col_idx, cell)`` rows so downstream work is
plain SQL instead of re-parsing page bytes.

Shape: ONE narrow MapInPandas stage (charset-aware decode + regex
cell scan), zero exchanges — the same execution contract as
link_graph.extract_page_links. Per-document guard degrades a malformed
page to zero rows, never a task failure.

The flagship extractor renders tables as text lines (kernels/
html_extract _parse_table — reference analog utils/text/parsers/
html_parser.py:201-206); this operator is the sibling that PRESERVES the
grid. Nested tables are flattened to the outer cell scan (the non-greedy
span ends at the first ``</table>``) — noted, not hidden: crawl-scale
table mining normally drops nested layout tables anyway.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_TABLE_RE = re.compile(r"<table\b[^>]*>(.*?)</table\s*>", re.I | re.S)
_TR_RE = re.compile(r"<tr\b[^>]*>(.*?)</tr\s*>", re.I | re.S)
_TD_RE = re.compile(r"<t[dh]\b[^>]*>(.*?)</t[dh]\s*>", re.I | re.S)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")

TABLE_CELLS_SCHEMA = (
    "url string, table_idx int, row_idx int, col_idx int, cell string"
)


def _html_tables(url: str, blob: bytes) -> list[tuple[int, int, int, str]]:
    """(table_idx, row_idx, col_idx, cell) cells of one page; [] for
    non-HTML bytes."""
    from ..kernels.encoding import decode_bytes, detect_bom
    from ..kernels.md_extract import looks_like_html

    if detect_bom(blob) is not None:
        blob = decode_bytes(blob)[0].encode("utf-8")
    if not looks_like_html(blob):
        return []
    text = decode_bytes(blob)[0]
    out = []
    for ti, t in enumerate(_TABLE_RE.finditer(text)):
        for ri, r in enumerate(_TR_RE.finditer(t.group(1))):
            for ci, c in enumerate(_TD_RE.finditer(r.group(1))):
                cell = _WS_RE.sub(" ", _TAG_RE.sub(" ", c.group(1))).strip()
                out.append((ti, ri, ci, cell))
    return out


def extract_html_tables(pages_df: DataFrame) -> DataFrame:
    """pages (url, html) -> one row per table cell. Single narrow python
    stage; no shuffle — the relational table corpus materializes at scan
    parallelism."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for url, blob in zip(pdf["url"], pdf["html"]):
                try:
                    cells = _html_tables(str(url), bytes(blob) if blob is not None else b"")
                except Exception:
                    cells = []
                for ti, ri, ci, cell in cells:
                    rows.append(
                        {
                            "url": str(url),
                            "table_idx": ti,
                            "row_idx": ri,
                            "col_idx": ci,
                            "cell": cell,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["url", "table_idx", "row_idx", "col_idx", "cell"]
            )

    return pages_df.select("url", "html").mapInPandas(gen, schema=TABLE_CELLS_SCHEMA)
