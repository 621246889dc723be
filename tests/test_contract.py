"""Driver-contract tests: entry smoke, queries/oracle alignment, and the
no-per-row-Python guarantee (BASELINE.md)."""

import re
from pathlib import Path

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE

REPO = Path(__file__).resolve().parent.parent


def test_oracle_keys_subset_of_queries():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    # every oracle-checked query is present and callable
    assert all(callable(fn) for fn in q.values())


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    names = [f.name for f in df.schema.fields]
    assert names == ["url", "warc_ts", "lang", "title", "text", "spans", "n_spans"]
    assert df.count() == 500
    assert df.where("n_spans > 0").count() == 500


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_runs_at_smoke_scale(spark, name):
    # EVERY contract query must materialize at smoke scale — the local
    # pre-flight for the driver's correctness gate
    df = entry_mod.queries()[name](spark, SF_SMOKE)
    assert df.count() >= 0  # materializes without error


def test_no_per_row_python_udf():
    """input_hint: vectorized pandas/Arrow UDFs only — no row-wise udf()."""
    offenders = []
    for py in (REPO / "ocr_spark").rglob("*.py"):
        src = py.read_text()
        # match `udf(` calls that are not pandas_udf / mapInPandas etc.
        for m in re.finditer(r"(?<![a-zA-Z_.])udf\s*\(", src):
            start = max(0, m.start() - 7)
            if src[start : m.start()].endswith("pandas_"):
                continue
            offenders.append(f"{py.name}:{src[:m.start()].count(chr(10)) + 1}")
    assert not offenders, f"row-wise udf() found: {offenders}"


def test_kernels_do_not_import_spark():
    for py in (REPO / "ocr_spark" / "kernels").rglob("*.py"):
        src = py.read_text()
        assert "pyspark" not in src, f"{py} imports pyspark"


def test_multimodal_resize_and_frames(spark):
    from pyspark.sql import functions as F

    from ocr_spark.operators.multimodal import blob_resize, frame_sample

    d = spark.createDataFrame(
        [(1, b"alpha"), (2, b"beta"), (3, None)], "blob_id long, blob binary"
    )
    resized = blob_resize(d, h=4, w=4).collect()
    assert len(resized) == 3
    assert all(len(r.pixels) == 4 * 4 * 3 for r in resized)
    # deterministic across runs
    again = {r.blob_id: r.pixels for r in blob_resize(d, h=4, w=4).collect()}
    assert {r.blob_id: r.pixels for r in resized} == again

    frames = frame_sample(d, n_frames=8, every_k=2)
    rows = frames.collect()
    assert len(rows) == 3 * 4  # 1 -> N expansion
    assert sorted({r.frame_idx for r in rows}) == [0, 2, 4, 6]
    # frames differ per index (derived stream, not repeats)
    per_blob = [r.frame_sha256 for r in rows if r.blob_id == 1]
    assert len(set(per_blob)) == 4


def test_chunk_extracted(spark):
    from ocr_spark.operators.chunking import chunk_extracted, chunk_spans
    from ocr_spark.operators.extract import extract_pages
    from ocr_spark.sources.pages import pages_df
    from tests.conftest import SF_SMOKE

    # kernel: packing + over-long split + section boundaries
    spans = [
        {"section": "a", "text": "x" * 50},
        {"section": "a", "text": "y" * 50},
        {"section": "b", "text": "z" * 50},   # section change -> new chunk
        {"section": "b", "text": "long word " * 60},  # > max -> split
    ]
    chunks = chunk_spans(spans, max_length=120)
    assert chunks[0]["section"] == "a" and chunks[0]["n_spans"] == 2
    assert chunks[1]["section"] == "b" and chunks[1]["n_spans"] == 1
    assert all(len(c["text"]) <= 120 for c in chunks)

    # through Spark over the real extraction output
    out = chunk_extracted(extract_pages(pages_df(spark, SF_SMOKE)), max_length=300)
    rows = out.collect()
    assert len(rows) > 500
    assert all(r.n_chars <= 300 for r in rows)
    assert {r.url for r in rows} and all(r.chunk_id >= 0 for r in rows)


def test_training_pipeline_composition(spark):
    from ocr_spark.contract import QUERIES
    from tests.conftest import SF_SMOKE

    df = QUERIES["training_pipeline"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # synth (test scaffolding) + extract + chunk; production = 2 (scan replaces synth)
    assert plan.count("MapInPandas") == 3
    rows = df.collect()
    assert len(rows) > 100
    assert all(r.n_copies >= 1 and r.n_chars >= 40 for r in rows)


def test_all_fixture_oracles_have_fixtures():
    """Every FIXTURE_ORACLES entry must have its committed parquet — a
    missing one silently degrades that query to rows-only."""
    import os

    from ocr_spark.contract import FIXTURE_DIR, FIXTURE_ORACLES, ORACLE_SQL, QUERIES

    for name in FIXTURE_ORACLES:
        path = os.path.join(FIXTURE_DIR, name + ".parquet")
        assert os.path.isdir(path), f"fixture missing: {name}"
        assert name in ORACLE_SQL, f"oracle not registered: {name}"
    # and every query has SOME oracle
    missing = [q for q in QUERIES if q not in ORACLE_SQL]
    assert missing == [], f"queries without oracle: {missing}"
