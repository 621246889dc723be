"""Tests for the temporal as-of join, SemDeDup, and the linear quality
classifier (round-2 continuation additions)."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from tests.conftest import SF_CORRECT


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            Row(event_id=1, user_id=10, ts=_ts("2024-01-05T00:00:00")),
            Row(event_id=2, user_id=10, ts=_ts("2024-01-02T00:00:00")),
            Row(event_id=3, user_id=10, ts=_ts("2024-01-01T00:00:00")),
            Row(event_id=4, user_id=20, ts=_ts("2024-01-03T00:00:00")),
            Row(event_id=5, user_id=30, ts=_ts("2024-01-03T00:00:00")),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(user_id=10, ts=_ts("2024-01-02T00:00:00"), value=7.0),
            Row(user_id=10, ts=_ts("2024-01-04T00:00:00"), value=9.0),
            Row(user_id=20, ts=_ts("2024-01-03T00:00:00"), value=1.0),
            # duplicate (key, ts): greatest payload must win
            Row(user_id=20, ts=_ts("2024-01-03T00:00:00"), value=5.0),
            Row(user_id=30, ts=_ts("2024-01-04T00:00:00"), value=2.0),
        ]
    )
    return left, right


class TestAsofJoin:
    def _run(self, left, right):
        from ocr_spark.operators.crawl_history import asof_join

        out = asof_join(
            left, right, key="user_id", ts_col="ts", payload_cols=("value",)
        )
        return {r["event_id"]: (r["asof_ts"], r["asof_value"]) for r in out.collect()}

    def test_semantics(self, asof_frames):
        left, right = asof_frames
        got = self._run(left, right)
        # newest prior: event 1 at 01-05 sees the 01-04 purchase
        assert got[1] == (_ts("2024-01-04T00:00:00"), 9.0)
        # inclusive <=: event 2 at 01-02 sees the same-instant purchase
        assert got[2] == (_ts("2024-01-02T00:00:00"), 7.0)
        # no prior row -> NULLs (ASOF LEFT JOIN)
        assert got[3] == (None, None)
        # duplicate right (key, ts): deterministic greatest-payload winner
        assert got[4] == (_ts("2024-01-03T00:00:00"), 5.0)
        # right row strictly later than left -> no match
        assert got[5] == (None, None)
        assert len(got) == left.count(), "every left row exactly once"

    def test_single_exchange_plan(self, spark, asof_frames):
        from ocr_spark.operators.crawl_history import asof_join

        left, right = asof_frames
        out = asof_join(
            left, right, key="user_id", ts_col="ts", payload_cols=("value",)
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Exchange rangepartitioning" not in plan
        assert "CartesianProduct" not in plan

    def test_matches_duckdb_asof(self, spark):
        """Independent engine parity on the sf0.01 events table."""
        duckdb = pytest.importorskip("duckdb")
        from ocr_spark.contract import ORACLE_SQL, QUERIES

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF_CORRECT}/events.parquet')"
        )
        sdf = QUERIES["asof_join"](spark, SF_CORRECT).toPandas()
        odf = con.execute(ORACLE_SQL["asof_join"]).df()
        cols = sorted(sdf.columns)
        a = sdf[cols].astype(str).sort_values(cols).reset_index(drop=True)
        b = odf[cols].astype(str).sort_values(cols).reset_index(drop=True)
        assert a.equals(b)


class TestSemDeDup:
    def test_keeps_canonical_and_drops_near_dups(self, spark):
        from ocr_spark.operators.similarity import semdedup

        base = [1.0] + [0.0] * 63
        near = [0.999] + [0.001] * 63
        other = ([0.0] * 32) + ([1.0] * 32)
        emb = spark.createDataFrame(
            [
                Row(vec_id=1, embedding=base),
                Row(vec_id=2, embedding=near),  # cos ~1 with vec 1
                Row(vec_id=3, embedding=other),  # far from both
            ]
        )
        out = {r["vec_id"]: r["kept"] for r in semdedup(emb).collect()}
        assert out == {1: True, 2: False, 3: True}

    def test_every_vector_appears_once(self, spark):
        from ocr_spark.operators.similarity import semdedup
        from ocr_spark.contract import _t

        e = _t(spark, SF_CORRECT, "embeddings")
        out = semdedup(e)
        assert out.count() == e.count()
        assert out.select("vec_id").distinct().count() == e.count()

    def test_removed_have_lower_id_witness(self, spark):
        """Every removed vector must have a kept-or-removed lower-id witness
        in the same bucket with cosine >= threshold (SemDeDup invariant)."""
        from ocr_spark.operators.similarity import cosine, semdedup
        from ocr_spark.contract import _t

        e = _t(spark, SF_CORRECT, "embeddings")
        out = semdedup(e)
        removed = out.where(~F.col("kept"))
        joined = (
            removed.alias("r")
            .join(out.alias("o"), "bucket")
            .join(e.alias("er"), F.col("r.vec_id") == F.col("er.vec_id"))
            .join(e.alias("eo"), F.col("o.vec_id") == F.col("eo.vec_id"))
            .where(F.col("o.vec_id") < F.col("r.vec_id"))
            .where(
                F.round(cosine(F.col("er.embedding"), F.col("eo.embedding")), 4)
                >= 0.9
            )
        )
        n_witnessed = joined.select("r.vec_id").distinct().count()
        assert n_witnessed == removed.count()


class TestQualityClassifier:
    def test_exact_integer_score(self, spark):
        from ocr_spark.operators.corpus_filters import (
            classifier_weights,
            quality_classifier,
        )

        w = classifier_weights(64, 11)
        docs = spark.createDataFrame(
            [Row(doc_id=1, text="ab cd"), Row(doc_id=2, text="")]
        )
        got = {r["doc_id"]: r for r in quality_classifier(docs).collect()}

        def poly(tok):
            acc = 0
            for ch in tok:
                acc = (acc * 31 + ord(ch)) % 1_000_000_007
            return acc

        expect = 25_000
        for tok in ["ab", "cd"]:
            h = poly(tok)
            sign = 1 if h % 128 < 64 else -1
            expect += sign * w[h % 64]
        assert got[1]["logit_micro"] == expect
        assert got[1]["label"] == (expect > 0)
        # empty text -> bias only
        assert got[2]["logit_micro"] == 25_000
        assert got[2]["n_tokens"] == 0

    def test_shuffle_free_plan(self, spark):
        from ocr_spark.contract import QUERIES

        plan = (
            QUERIES["quality_classifier"](spark, SF_CORRECT)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, "per-row operator must not shuffle"


class TestSequencePack:
    def test_boundary_straddle(self, spark):
        from ocr_spark.operators.corpus_filters import sequence_pack

        docs = spark.createDataFrame(
            [
                Row(doc_id=1, lang="en", text=" ".join(["w"] * 1500)),
                Row(doc_id=2, lang="en", text=" ".join(["w"] * 1000)),
                Row(doc_id=3, lang="en", text=""),
                Row(doc_id=4, lang="fr", text=" ".join(["w"] * 10)),
            ]
        )
        got = {r["doc_id"]: r for r in sequence_pack(docs, seq_len=2048).collect()}
        assert got[1]["seq_id"] == 0 and got[1]["offset_in_seq"] == 0
        assert got[1]["n_seqs_spanned"] == 1
        # doc 2 starts at 1500, ends at 2499 -> straddles seqs 0 and 1
        assert got[2]["start_offset"] == 1500
        assert got[2]["n_seqs_spanned"] == 2
        # empty doc occupies nothing
        assert got[3]["n_tokens"] == 0 and got[3]["n_seqs_spanned"] == 0
        # strata are independent streams
        assert got[4]["start_offset"] == 0 and got[4]["seq_id"] == 0

    def test_single_exchange(self, spark):
        from ocr_spark.contract import QUERIES
        from tests.conftest import SF_CORRECT

        plan = (
            QUERIES["sequence_pack"](spark, SF_CORRECT)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1


def test_embed_centroids_match_numpy_group_mean(spark):
    """Reference parity (utils/embeddings.compute_centroids,
    test_utils_embeddings.py:38-63): per-label centroid == numpy mean of
    member vectors, checked in exact micro-integers."""
    import numpy as np

    from ocr_spark.operators.similarity import embed_centroids
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    got = {
        (r["label"], r["dim"]): (r["sum_micro"], r["n"], r["centroid_micro"])
        for r in embed_centroids(emb).collect()
    }
    rows = emb.collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r["embedding"])
    for label, vecs in by_label.items():
        micro = np.round(np.array(vecs, dtype=np.float64) * 1e6).astype(np.int64)
        for d in range(micro.shape[1]):
            s, n = int(micro[:, d].sum()), micro.shape[0]
            assert got[(label, d)] == (s, n, s // n)
