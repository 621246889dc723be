"""Crawl-history operators (latest snapshot per url, cross-crawl change
stats) and the token-budget sampler: unit semantics, plan shape, and
DuckDB oracle parity at smoke scale."""

import duckdb
import pytest

import __spark_entry__ as entry_mod
from ocr_spark.operators import crawl_history as ch
from ocr_spark.operators.corpus_filters import token_budget_sample
from tests.conftest import SF_SMOKE

NEW_QUERIES = ["url_latest", "url_changes", "token_budget"]


# ---------------------------------------------------------------------------
# unit semantics
# ---------------------------------------------------------------------------

def _snaps(spark):
    return spark.createDataFrame(
        [
            # url a: 3 snapshots, content changes once (f1 -> f1 -> f2)
            ("a", 100, "f1"),
            ("a", 200, "f1"),
            ("a", 300, "f2"),
            # url b: 1 snapshot
            ("b", 150, "g1"),
            # url c: duplicate capture time — fingerprint tie-break
            ("c", 100, "h2"),
            ("c", 100, "h1"),
        ],
        "url string, warc_epoch long, fingerprint string",
    )


def test_latest_snapshot_per_url(spark):
    rows = {r.url: r for r in ch.latest_snapshot(_snaps(spark)).collect()}
    assert rows["a"].warc_epoch == 300 and rows["a"].fingerprint == "f2"
    assert rows["b"].warc_epoch == 150
    # tie on epoch resolved by fingerprint asc — deterministic on replay
    assert rows["c"].fingerprint == "h1"


def test_snapshot_changes_stats(spark):
    rows = {r.url: r for r in ch.snapshot_changes(_snaps(spark)).collect()}
    a = rows["a"]
    assert (a.n_snapshots, a.n_changes, a.first_epoch, a.last_epoch) == (3, 1, 100, 300)
    b = rows["b"]
    # a single snapshot is never a "change"
    assert (b.n_snapshots, b.n_changes) == (1, 0)
    c = rows["c"]
    # h1 -> h2 in (epoch, fingerprint) order = one change
    assert (c.n_snapshots, c.n_changes) == (2, 1)


def test_snapshot_changes_single_exchange(spark):
    """The lag window and the groupBy share the url hash partitioning —
    one Exchange total, reused by both (no second shuffle)."""
    plan = ch.snapshot_changes(_snaps(spark))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(url") == 1


def test_token_budget_greedy_prefix(spark):
    df = spark.createDataFrame(
        [
            # lang en: quality order 9,8,7 with tokens 40,50,30; budget 100
            (0, "en", 9, 40),
            (1, "en", 8, 50),
            (2, "en", 7, 30),   # 40+50+30=120 > 100 -> excluded
            # lang fr: single doc exactly at budget
            (3, "fr", 5, 100),
            # lang de: first doc already over budget -> empty stratum
            (4, "de", 5, 101),
        ],
        "doc_id long, lang string, quality long, n_tokens long",
    )
    got = {r.doc_id: r for r in token_budget_sample(df, budget=100).collect()}
    assert set(got) == {0, 1, 3}
    assert got[1].cum_tokens == 90
    assert got[3].cum_tokens == 100


# ---------------------------------------------------------------------------
# oracle parity at smoke scale (the driver's compare, run locally)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", NEW_QUERIES)
def test_oracle_parity_smoke(spark, name):
    got = entry_mod.queries()[name](spark, SF_SMOKE).toPandas()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    )
    exp = con.sql(entry_mod.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(exp.columns)
    got = got[sorted(got.columns)].sort_values(by=sorted(got.columns)).reset_index(drop=True)
    exp = exp[sorted(exp.columns)].sort_values(by=sorted(exp.columns)).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    for col in got.columns:
        assert got[col].tolist() == exp[col].tolist(), f"{name}.{col} mismatch"


def test_refresh_schedule_arithmetic(spark):
    import pandas as pd

    from ocr_spark.operators.crawl_history import refresh_schedule

    rows = []
    # u1: 3 snapshots, 2 changes over 2 days -> interval = span div 2 = 86400
    for i, fp in enumerate(["a", "b", "c"]):
        rows.append({"url": "u1", "warc_epoch": 1000000 + i * 86400, "fingerprint": fp})
    # u2: static page (2 snapshots, same fingerprint) -> max_interval
    for i in range(2):
        rows.append({"url": "u2", "warc_epoch": 2000000 + i * 86400, "fingerprint": "x"})
    # u3: changes every snapshot, tiny span -> clamps to min_interval
    for i, fp in enumerate(["p", "q"]):
        rows.append({"url": "u3", "warc_epoch": 3000000 + i * 60, "fingerprint": fp})
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = {r.url: r for r in refresh_schedule(df).collect()}
    assert out["u1"].fetch_interval_s == 86400
    assert out["u1"].next_fetch_epoch == 1000000 + 2 * 86400 + 86400
    assert out["u2"].fetch_interval_s == 30 * 86400
    assert out["u3"].fetch_interval_s == 3600


# ---------------------------------------------------------------------------
# cross-host mirror detection
# ---------------------------------------------------------------------------

def _mirror_df(spark, rows):
    return spark.createDataFrame(rows, "host string, fingerprint string")


def test_mirror_hosts_hand_golden(spark):
    """h1/h2 share f1,f2 (shared=2); h3 shares only f1 (below min_shared);
    containment = shared*1000 div min(|fp|) with h2 holding 3 fps."""
    from ocr_spark.operators.crawl_history import mirror_hosts

    rows = [
        ("h1", "f1"), ("h1", "f2"),
        ("h2", "f1"), ("h2", "f2"), ("h2", "f9"),
        ("h3", "f1"),
        ("h3", "f1"),  # duplicate snapshot rows count once
    ]
    out = {
        (r.host_a, r.host_b): (r.shared, r.containment_milli)
        for r in mirror_hosts(_mirror_df(spark, rows), min_shared=2).collect()
    }
    assert out == {("h1", "h2"): (2, 1000)}


def test_mirror_hosts_caps_boilerplate_fingerprint(spark):
    """A fingerprint on more than max_hosts_per_fp hosts is dropped before
    pair expansion — boilerplate must not produce quadratic pairs."""
    from ocr_spark.operators.crawl_history import mirror_hosts

    rows = [(f"b{i}", "BOILER") for i in range(10)]
    rows += [("b0", "fx"), ("b1", "fx"), ("b0", "fy"), ("b1", "fy")]
    out = {
        (r.host_a, r.host_b): r.shared
        for r in mirror_hosts(
            _mirror_df(spark, rows), min_shared=2, max_hosts_per_fp=8
        ).collect()
    }
    # only the real fx/fy overlap survives; BOILER (10 hosts > 8) is gone
    assert out == {("b0", "b1"): 2}


def test_mirror_clusters_folds_transitive_farms(spark):
    """h1-h2 and h2-h3 mirror pairs (h1,h3 never directly paired) must
    land in ONE farm with canonical h1; an unrelated pair stays its own
    cluster."""
    from ocr_spark.operators.crawl_history import mirror_clusters

    pairs = spark.createDataFrame(
        [("h1", "h2"), ("h2", "h3"), ("x1", "x2")],
        "host_a string, host_b string",
    )
    got = {r.host: r.canonical_host for r in mirror_clusters(pairs).collect()}
    assert got == {
        "h1": "h1", "h2": "h1", "h3": "h1",
        "x1": "x1", "x2": "x1",
    }


def test_mirror_hosts_ignores_null_fingerprints(spark):
    """NULL fingerprints (failed fetches) must not pair hosts: a groupBy
    would bucket all NULLs together while the SQL-oracle equi-join drops
    them."""
    from ocr_spark.operators.crawl_history import mirror_hosts

    rows = [("h1", None), ("h2", None), ("h1", "fx"), ("h2", "fx")]
    out = mirror_hosts(
        spark.createDataFrame(rows, "host string, fingerprint string"),
        min_shared=2,
    ).collect()
    assert out == []  # fx alone is below min_shared; NULLs don't count


def test_snapshot_drift_grades_change_magnitude(spark):
    """Identical consecutive snapshots -> 0; disjoint texts -> 1000; a
    half-overlapping rewrite lands in between; first snapshot emits no
    row; short texts (no shingles) compare as unchanged."""
    from ocr_spark.operators.crawl_history import snapshot_drift

    rows = [
        ("u1", 1, "alpha beta gamma delta"),
        ("u1", 2, "alpha beta gamma delta"),      # identical -> 0
        ("u1", 3, "zeta eta theta iota kappa"),    # disjoint -> 1000
        ("u2", 1, "one two three four"),
        ("u2", 2, "one two three five"),           # 1 of 3 shingles kept
        ("u3", 1, "hi"),
        ("u3", 2, "yo"),                           # no shingles -> 0
    ]
    df = spark.createDataFrame(rows, "url string, warc_epoch long, snap_text string")
    got = {
        (r.url, r.warc_epoch): r.drift_milli for r in snapshot_drift(df).collect()
    }
    # u2: shingles A={one two three, two three four}, B={one two three,
    # two three five}; |I|=1, |U|=3 -> 1000 - 333 = 667
    assert got == {
        ("u1", 2): 0,
        ("u1", 3): 1000,
        ("u2", 2): 667,
        ("u3", 2): 0,
    }


# ---------------------------------------------------------------------------
# revisit_records (WARC response/revisit classification)
# ---------------------------------------------------------------------------

def test_revisit_records(spark):
    from pyspark.sql import functions as F

    from ocr_spark.operators.crawl_history import revisit_records

    snaps = spark.createDataFrame(
        [
            ("u1", 100, "fpA"),
            ("u1", 200, "fpB"),   # content changed: new response
            ("u1", 300, "fpA"),   # back to fpA: revisit of epoch 100
            ("u2", 100, "fpA"),   # same fp on ANOTHER url: independent
        ],
        "url string, warc_epoch long, fingerprint string",
    )
    rows = {
        (r.url, r.warc_epoch): (r.record_type, r.refers_to_epoch)
        for r in revisit_records(snaps).collect()
    }
    assert rows == {
        ("u1", 100): ("response", None),
        ("u1", 200): ("response", None),
        ("u1", 300): ("revisit", 100),
        ("u2", 100): ("response", None),
    }
    # exactly ONE exchange: the (url, fingerprint) window
    plan = revisit_records(snaps)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
