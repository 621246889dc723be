"""Bitext sentence alignment: Gale-Church DP (kernels/align.py) over the
document pairs that operators/urls.bitext_candidates mines from URL
language segments — the step that turns "these two urls are probably
translations" into sentence-level training pairs (the ParaCrawl pipeline
shape: candidate mining -> alignment -> filtering).

Scale shape: ONE Arrow stage, zero exchanges (plan-asserted). Each
document pair's DP is independent; O(n*m) per pair is bounded by
max_sentences (overlong docs truncate — the guard real aligners use,
since a single mega-page would otherwise own the stage's tail latency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

ALIGN_SCHEMA = (
    "pair_id long, bead int, a_start int, a_end int, b_start int, b_end int,"
    " cost_centi long, a_text string, b_text string"
)


def align_bitext(
    pairs: DataFrame,
    *,
    max_sentences: int = 200,
    id_col: str = "pair_id",
    a_col: str = "text_a",
    b_col: str = "text_b",
) -> DataFrame:
    """(pair_id, text_a, text_b) -> one row per aligned bead with
    end-exclusive sentence ranges, the bead's own integer centi-cost, and
    the space-joined group texts (empty string for insertion/deletion
    sides)."""

    def gen(batches):
        import pandas as pd

        from ocr_spark.kernels.align import gale_church_align
        from ocr_spark.kernels.textproc import split_sentences

        for pdf in batches:
            rows = []
            for pid, ta, tb in zip(pdf[id_col], pdf[a_col], pdf[b_col]):
                sa = [
                    s.strip()
                    for s in split_sentences(str(ta or ""), strip_sents=True)
                    if s.strip()
                ][:max_sentences]
                sb = [
                    s.strip()
                    for s in split_sentences(str(tb or ""), strip_sents=True)
                    if s.strip()
                ][:max_sentences]
                beads = gale_church_align(
                    [len(s) for s in sa], [len(s) for s in sb]
                )
                for k, (a0, a1, b0, b1, cc) in enumerate(beads):
                    rows.append(
                        {
                            "pair_id": int(pid),
                            "bead": k,
                            "a_start": a0,
                            "a_end": a1,
                            "b_start": b0,
                            "b_end": b1,
                            "cost_centi": cc,
                            "a_text": " ".join(sa[a0:a1]),
                            "b_text": " ".join(sb[b0:b1]),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "pair_id", "bead", "a_start", "a_end", "b_start",
                    "b_end", "cost_centi", "a_text", "b_text",
                ],
            )

    return pairs.mapInPandas(gen, schema=ALIGN_SCHEMA)
