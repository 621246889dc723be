"""JSON-LD structured-data extraction (schema.org entities in web pages).

Modern sites embed machine-readable entities as
``<script type="application/ld+json">`` blocks (schema.org Product /
Article / BreadcrumbList / ...); search engines and web-mining pipelines
treat these as the canonical structured payload of a page — richer and
better-typed than OpenGraph meta (operators/page_meta.py og_* sibling).

``extract_jsonld`` lifts every block into flat entity/field rows:
``(url, block_idx, entity_idx, jtype, key, value)``:

- blocks are located with a tolerant script-tag scan (attribute order /
  quoting / whitespace free), bodies parsed with strict ``json.loads``;
- a top-level ``@graph`` array is unwrapped (one entity_idx per member,
  the standard multi-entity envelope); a top-level array likewise; a
  single object is entity 0;
- only SCALAR fields are emitted (string / int / bool / float), with a
  deterministic string rendering (bools as 'true'/'false', numbers via
  repr) — nested objects/arrays are a different query's job;
- ``@type`` becomes the row's jtype (missing -> NULL), ``@context`` and
  other ``@``-keys are envelope, not data;
- a malformed block, a non-JSON-LD script, or non-HTML bytes degrade to
  zero rows for that block/page, never a task failure (codec-parser
  policy).

Shape: ONE narrow MapInPandas stage over the pages scan — zero
exchanges, the same execution contract as link_graph.extract_page_links
/ html_tables.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame

_LD_BLOCK_RE = re.compile(
    r"<script[^>]*type\s*=\s*[\"']application/ld\+json[\"'][^>]*>(.*?)</script\s*>",
    re.I | re.S,
)

JSONLD_SCHEMA = (
    "url string, block_idx int, entity_idx int, jtype string,"
    " key string, value string"
)


def _render(v) -> str | None:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return v
    if isinstance(v, (int, float)):
        return repr(v)
    return None  # nested object/array: skipped


def _entities(obj):
    if isinstance(obj, list):
        return [e for e in obj if isinstance(e, dict)]
    if isinstance(obj, dict):
        g = obj.get("@graph")
        if isinstance(g, list):
            return [e for e in g if isinstance(e, dict)]
        return [obj]
    return []


def _jsonld_rows(url: str, blob: bytes) -> list[tuple]:
    from ..kernels.encoding import decode_bytes
    from ..kernels.md_extract import looks_like_html

    if not blob or not looks_like_html(blob):
        return []
    text = decode_bytes(blob)[0]
    rows = []
    for bi, m in enumerate(_LD_BLOCK_RE.finditer(text)):
        try:
            obj = json.loads(m.group(1))
        except (ValueError, RecursionError):
            continue
        for ei, ent in enumerate(_entities(obj)):
            jtype = ent.get("@type")
            jtype = jtype if isinstance(jtype, str) else None
            for k in ent:
                if k.startswith("@"):
                    continue
                v = _render(ent[k])
                if v is not None:
                    rows.append((url, bi, ei, jtype, k, v))
    return rows


def extract_jsonld(pages_df: DataFrame, html_col: str = "html") -> DataFrame:
    """pages (url, html) -> one row per scalar JSON-LD entity field.
    Single narrow python stage; no shuffle."""

    def gen(batches):
        import pandas as pd

        cols = ["url", "block_idx", "entity_idx", "jtype", "key", "value"]
        for pdf in batches:
            rows = []
            for url, blob in zip(pdf["url"], pdf[html_col]):
                try:
                    rows.extend(
                        _jsonld_rows(str(url), bytes(blob) if blob is not None else b"")
                    )
                except Exception:
                    pass
            yield pd.DataFrame(rows, columns=cols)

    return pages_df.select("url", html_col).mapInPandas(gen, schema=JSONLD_SCHEMA)
