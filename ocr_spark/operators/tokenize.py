"""Distributed BPE tokenization over the documents table (F11 + the
token-budgeting staple of a training-data pipeline).

Shape at 100 TB:
- word counting is ONE codegen'd groupBy over exploded words with map-side
  partial aggregation (the only corpus-wide shuffle);
- merge training consumes only the bounded top-K word list on the driver
  (rank by (count desc, word) -> deterministic), exactly the bounded-sample
  pattern of the IVF coarse quantizer;
- encoding broadcasts the rank table once per executor inside an
  Arrow-batched mapInPandas (north_rule: decoder tables once per executor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..kernels import bpe as bpe_kernel


def corpus_word_counts(docs: DataFrame, *, lowercase: bool = True) -> DataFrame:
    text = F.lower(F.col("text")) if lowercase else F.col("text")
    words = F.split(F.trim(text), r"\s+")
    from ..plans.session import widen

    return (
        widen(docs).select(F.explode(words).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_bpe_merges(
    docs: DataFrame, *, n_merges: int = 200, top_k_words: int = 20000
) -> dict:
    """Distributed count -> bounded driver-side merge training."""
    top = (
        corpus_word_counts(docs)
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(top_k_words)
        .collect()
    )
    return bpe_kernel.train_bpe({r["word"]: int(r["cnt"]) for r in top}, n_merges)


def bpe_encode_table(docs: DataFrame, ranks: dict) -> DataFrame:
    """(doc_id, text) -> (doc_id, n_words, n_bpe_tokens, head_tokens_csv).

    The rank table ships in the UDF closure (one broadcast per executor);
    integer/string outputs only, so the fixture oracle hashes exactly.
    """

    def gen(batches):
        import pandas as pd

        cache: dict = {}  # word->tokens memo shared across the partition
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = bpe_kernel.encode_text_bpe(
                    str(text).lower(), ranks, cache=cache
                )
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_words": len(str(text).split()),
                        "n_bpe_tokens": len(toks),
                        "head_tokens_csv": ",".join(toks[:12]),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_words", "n_bpe_tokens", "head_tokens_csv"]
            )

    return docs.select("doc_id", "text").mapInPandas(
        gen, schema="doc_id long, n_words int, n_bpe_tokens int, head_tokens_csv string"
    )
