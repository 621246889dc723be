"""F8: chunks_from_paragraphs — the chunking driver over extracted span
structs (reference behavior: utils/text/paragraphs_processing.py:26-142).

Consumes the flagship extraction output (url, spans[...]) and produces
retrieval-ready chunks: consecutive spans of the same section are packed
greedily up to ``max_length`` characters; an over-long span is split with
the recursive splitter (kernels/textproc.split_text — paragraph → sentence
→ word descent); non-text spans (table/list renderings, OCR paragraphs)
interleave in document order, matching the reference's multimodal
interleave.  Pure 1-row→N-rows ``mapInPandas`` over the spans arrays —
narrow, zero shuffle, composes directly after extract_pages in one job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..kernels.textproc import split_text

CHUNK_SCHEMA = (
    "url string, chunk_id int, section string, n_spans int, "
    "n_chars int, text string"
)


def chunk_spans(spans, max_length: int = 400):
    """Pure-python core (unit-testable): list of span dicts/Rows ->
    list of chunk dicts."""
    chunks = []
    cur_texts: list[str] = []
    cur_section = None
    cur_spans = 0
    cur_len = 0  # running accumulated length (joined with 2-char separators)

    def flush():
        nonlocal cur_texts, cur_spans, cur_len
        if cur_texts:
            text = "\n\n".join(cur_texts)
            chunks.append(
                {
                    "section": cur_section or "",
                    "n_spans": cur_spans,
                    "text": text,
                }
            )
        cur_texts, cur_spans, cur_len = [], 0, 0

    for span in spans or []:
        section = span["section"] or ""
        text = span["text"] or ""
        if not text:
            continue
        if cur_texts and (
            section != cur_section or cur_len + len(text) > max_length
        ):
            flush()
        cur_section = section
        if len(text) > max_length:
            flush()
            # default (char) tokenizer: max_length is a character budget here.
            # split_text keeps its first sentence whole (reference semantics,
            # text_processing.py:34-145) so a single unbreakable run can come
            # back over budget — hard-wrap those.
            for part in split_text(text, max_length):
                if len(part) <= max_length:
                    chunks.append({"section": section, "n_spans": 1, "text": part})
                else:
                    for i in range(0, len(part), max_length):
                        chunks.append(
                            {
                                "section": section,
                                "n_spans": 1,
                                "text": part[i : i + max_length],
                            }
                        )
            continue
        cur_texts.append(text)
        cur_spans += 1
        cur_len += len(text) + 2
    flush()
    return chunks


def chunk_extracted(extracted: DataFrame, *, max_length: int = 400) -> DataFrame:
    """extracted (url, spans) -> (url, chunk_id, section, n_spans, n_chars,
    text) chunks in document order."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for url, spans in zip(pdf["url"], pdf["spans"]):
                if spans is None:
                    spans = []
                span_dicts = [
                    s if isinstance(s, dict) else s.asDict() for s in spans
                ]
                for i, ch in enumerate(chunk_spans(span_dicts, max_length)):
                    rows.append(
                        {
                            "url": url,
                            "chunk_id": i,
                            "section": ch["section"],
                            "n_spans": ch["n_spans"],
                            "n_chars": len(ch["text"]),
                            "text": ch["text"],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["url", "chunk_id", "section", "n_spans", "n_chars", "text"],
            )

    return extracted.select("url", "spans").mapInPandas(gen, schema=CHUNK_SCHEMA)
