"""Corpus keyword search: BM25 top-k scoring, reproducibility-hardened.

A training-data engine needs corpus PROBES — "show me the best documents
for these terms" — for contamination audits, mixture debugging, and eval-
set curation. :func:`bm25_topk` is Robertson-Sparck-Jones BM25 (k1/b
defaults 1.2/0.75, the Lucene/Elasticsearch defaults) with two
reproducibility hardenings so the same corpus gives bit-identical scores
on ANY engine / cluster size / reduction order:

- the per-term idf is quantized to 1e-3 (``floor(ln(x)*1000)/1000``)
  before use, so a last-ulp difference between libm and JVM ``log``
  cannot propagate;
- the per-(doc,term) score is converted to a scaled long
  (``floor(score*1e6)``) BEFORE the per-doc sum, so the aggregation is
  integer and order-independent.

Scale notes (the plan you want at 100 TB):

- The query-term filter runs BEFORE the tf groupBy, so only postings of
  the query terms are shuffled — the exchange is proportional to the
  query's result surface, not the corpus. Everything upstream is one
  codegen'd narrow stage (split/filter/explode).
- Document-frequency and corpus stats are tiny aggregates broadcast back
  (`F.broadcast`); no second scan join.
- dl (document length) rides through the explode as a carried column, so
  no doc-side re-join is needed.
- Final top-k is a TakeOrderedAndProject (global k-row heap), not a full
  sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

K1 = 1.2
B = 0.75
ONE_MINUS_B = 0.25          # exact double
K1_PLUS_1 = 2.2             # parsed identically by Spark and DuckDB
IDF_QUANT = 1000            # idf floor-quantized to 1e-3
SCORE_SCALE = 1_000_000     # per-term score floor-scaled to a long

#: the tokenizer both engines share: lower -> split on non-alphanumeric
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, score_scaled) of the k best BM25 matches, ties broken by
    doc_id — fully deterministic (see module docstring)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
        lambda w: w != F.lit(""),
    )
    base = docs.select(F.col(id_col).alias("doc_id"), F.size(toks).alias("dl"), toks.alias("ts"))
    # corpus stats: one tiny agg, broadcast back
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    # postings of the QUERY terms only cross the exchange
    tf = (
        base.select("doc_id", "dl", F.explode("ts").alias("term"))
        .where(F.col("term").isin(list(query_terms)))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs")
    idf_q = (
        F.floor(
            F.log((F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
            * IDF_QUANT
        )
        / IDF_QUANT
    )
    denom = F.col("tf") + F.lit(K1) * (F.lit(ONE_MINUS_B) + F.lit(B) * F.col("dl") / avgdl)
    term_score = idf_q * F.col("tf") * F.lit(K1_PLUS_1) / denom
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", F.floor(term_score * SCORE_SCALE).cast("long").alias("s"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("s").cast("long").alias("score_scaled"))
        .orderBy(F.desc("score_scaled"), F.asc("doc_id"))
        .limit(k)
    )


def phrase_topk(
    docs: DataFrame,
    phrase_terms: Sequence[str],
    k: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-phrase search via positional postings -> the k docs with the
    most CONSECUTIVE occurrences of ``phrase_terms``: (doc_id,
    n_occurrences), ties broken by doc_id.

    The classic positional-index query (Manning et al., IIR ch. 2): a
    posting here is (doc_id, pos, term) from the shared tokenizer, and an
    m-term phrase is an (m-1)-way self-join with the adjacency constraint
    ``pos_i = pos_0 + i`` — every join is an EQUI-join on (doc_id,
    pos arithmetic), so Spark plans hash joins, never a cartesian.

    Scale shape: the term filter runs BEFORE the posexplode's exchange, so
    only postings of the phrase's own terms (a few rows per matching doc)
    are shuffled — cost follows the phrase's selectivity, not the corpus;
    the same contract as bm25_topk's tf pipeline. Top-k is a global k-row
    heap (TakeOrderedAndProject). Works identically against a STORED
    positional index: swap the inline postings CTE for the index scan.
    """
    terms = [str(t) for t in phrase_terms]
    if not terms:
        raise ValueError("phrase_topk: empty phrase")
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
        lambda w: w != F.lit(""),
    )
    postings = (
        docs.select(F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "term"))
        .where(F.col("term").isin(terms))
    )
    occ = (
        postings.where(F.col("term") == terms[0])
        .select("doc_id", F.col("pos").alias("p0"))
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = postings.where(F.col("term") == t).select(
            F.col("doc_id").alias("d_i"), F.col("pos").alias("p_i")
        )
        occ = occ.join(
            nxt,
            (occ.doc_id == nxt.d_i) & (nxt.p_i == occ.p0 + i),
        ).select("doc_id", "p0")
    return (
        occ.groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("doc_id"))
        .limit(k)
    )
