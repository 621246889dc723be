"""DOM query operator: CSS ``select()`` over raw crawl page bytes.

Reference parity: the reference parses HTML with BeautifulSoup
(/root/reference/utils/text/parsers/html_parser.py:119-159) and its users
reach for ``soup.select(...)`` for anything beyond the built-in paragraph
extraction. This operator is that capability as a Spark stage: charset-
aware decode of ``html:binary`` -> one DOM parse -> N selectors evaluated
against the same tree -> (url, selector, match_idx, tag, text) rows.

Plan shape: ONE narrow Arrow stage (mapInPandas), zero exchanges. Each
page's DOM is parsed once no matter how many selectors are evaluated;
selectors are parsed once per executor (closure), not per row. Non-HTML
payloads (PDF/image/docx/%OCRPAYLOAD%/plain text) yield no rows — the
same byte-magic dispatch order as the extraction job.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame

from ..sources.pages import PAYLOAD_MAGIC

SELECT_SCHEMA = "url string, selector string, match_idx int, tag string, text string"


def css_select_table(pages: DataFrame, selectors: Iterable[str]) -> DataFrame:
    """Evaluate ``selectors`` on every HTML page; matched elements come out
    as rows in document order (``match_idx`` counts per url x selector).
    ``text`` is the element's collapsed subtree text (the same
    ``_extract_text`` semantics the extraction pipeline uses)."""
    sels = list(selectors)

    def gen(batches):
        import pandas as pd

        from ..kernels.css_select import css_select, parse_selector
        from ..kernels.encoding import decode_bytes, detect_bom
        from ..kernels.html_extract import _extract_text, parse_dom
        from ..kernels.md_extract import looks_like_html

        parsed = [(s, parse_selector(s)) for s in sels]
        for pdf in batches:
            out = {"url": [], "selector": [], "match_idx": [], "tag": [], "text": []}
            for url, html in zip(pdf["url"], pdf["html"]):
                try:
                    blob = bytes(html) if html is not None else b""
                    if detect_bom(blob) is not None:
                        blob = decode_bytes(blob)[0].encode("utf-8")
                    if (
                        blob.startswith(b"%PDF-")
                        or blob[:4] == b"\x89PNG"
                        or blob[:2] == b"\xff\xd8"
                        or blob[:2] == b"PK"
                        or blob.startswith(PAYLOAD_MAGIC)
                        or not looks_like_html(blob)
                    ):
                        continue
                    root = parse_dom(decode_bytes(blob)[0])
                    for sel, groups in parsed:
                        for k, node in enumerate(css_select(root, groups)):
                            out["url"].append(url)
                            out["selector"].append(sel)
                            out["match_idx"].append(k)
                            out["tag"].append(node.name)
                            out["text"].append(_extract_text(node))
                except Exception:
                    continue  # malformed page -> no rows, never a task failure
            yield pd.DataFrame(out)

    return pages.select("url", "html").mapInPandas(gen, schema=SELECT_SCHEMA)
