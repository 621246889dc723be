"""Markdown rendering of extracted documents — a PURE Column program over
the flagship extraction's own span output (url, title, spans), so the
structured export costs zero extra Python stages and zero exchanges: it
composes onto the single-MapInPandas extraction plan and stays inside
whole-stage codegen.

Rendering contract (deterministic, GFM-flavored):

- non-empty title -> ``# {title}`` as the first block
- a span whose section breadcrumb differs from the previous non-code
  span's emits a heading first: level = breadcrumb depth + 1 (capped at
  6), text = the deepest segment
- ``code`` spans render fenced (the span's section carries the language
  for code routes — see operators/extract._extract_code_doc); they never
  participate in heading tracking
- ``list`` spans already carry ``- item`` lines, ``table`` spans the
  flat ``col: val | col: val`` row rendering (kernels/html_extract.
  render_paragraph) — both pass through as their golden text, keeping
  the markdown line-for-line consistent with the byte-identical text
  contract
- blocks join with a blank line

Reference analog: the reference renders parsed documents back to text
only (utils/text/parsers — see SURVEY §3.4); structured markdown export
is part of the training-data surface this rebuild adds (markdown is the
de-facto pretraining format for extracted web documents)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _block(s: Column, prev: Column) -> Column:
    seg = F.element_at(F.split(s["section"], r" > "), -1)
    level = F.least(F.size(F.split(s["section"], r" > ")) + 1, F.lit(6))
    heading = F.concat(F.repeat(F.lit("#"), level), F.lit(" "), seg)
    is_code = s["kind"] == F.lit("code")
    body = F.when(
        is_code,
        F.concat(F.lit("```"), s["section"], F.lit("\n"), s["text"], F.lit("\n```")),
    ).otherwise(s["text"])
    need_heading = (~is_code) & (s["section"] != "") & (s["section"] != prev)
    return F.when(need_heading, F.concat(heading, F.lit("\n\n"), body)).otherwise(body)


def markdown_column(title: Column, spans: Column) -> Column:
    """(title, spans array) -> one markdown string Column."""
    acc0 = F.struct(
        F.lit("").alias("md"), F.lit("").alias("prev")
    )

    def step(acc, s):
        block = _block(s, acc["prev"])
        md = F.when(acc["md"] == "", block).otherwise(
            F.concat(acc["md"], F.lit("\n\n"), block)
        )
        prev = F.when(s["kind"] == "code", acc["prev"]).otherwise(s["section"])
        return F.struct(md.alias("md"), prev.alias("prev"))

    body = F.aggregate(spans, acc0, step, lambda acc: acc["md"])
    return F.when(
        title != "",
        F.when(body != "", F.concat(F.lit("# "), title, F.lit("\n\n"), body)).otherwise(
            F.concat(F.lit("# "), title)
        ),
    ).otherwise(body)


def markdown_export(extracted: DataFrame) -> DataFrame:
    """Flagship extraction output -> (url, markdown). Plan shape: the
    extraction's one python stage plus codegen'd expressions — no new
    exchange, no new python runner (plan-asserted in tests)."""
    return extracted.select(
        "url",
        markdown_column(
            F.coalesce(F.col("title"), F.lit("")), F.col("spans")
        ).alias("markdown"),
    )
