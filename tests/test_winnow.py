"""Winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 — MOSS).

Covers the paper's two correctness properties (any >= w+k-1-token match
shares a fingerprint; rightmost-minimum tie-breaking), the degenerate
short-document cases, the stop-fingerprint cap in the pairing join, and
the zero-shuffle plan shape of the fingerprint stage.
"""

from pyspark.sql import functions as F

from ocr_spark.operators.dedup import winnow_fingerprints, winnow_pairs

K = 4
W = 4


def _fps(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return winnow_fingerprints(df, **kw).collect()


def test_shared_run_guarantees_shared_fingerprint(spark):
    # docs share a run of exactly w + k - 1 = 7 tokens -> the paper's
    # guarantee: at least one common fingerprint VALUE
    shared = "alpha beta gamma delta epsilon zeta eta"
    rows = _fps(
        spark,
        [f"xx yy {shared} zz", f"{shared} qq rr ss tt uu vv ww"],
    )
    a = {r.fp for r in rows if r.doc_id == 1}
    b = {r.fp for r in rows if r.doc_id == 2}
    assert a & b


def test_disjoint_docs_share_nothing(spark):
    rows = _fps(
        spark,
        [
            "one two three four five six seven eight",
            "neuf dix onze douze treize quatorze quinze seize",
        ],
    )
    a = {r.fp for r in rows if r.doc_id == 1}
    b = {r.fp for r in rows if r.doc_id == 2}
    assert a and b and not (a & b)


def test_rightmost_tie_breaking(spark):
    # all tokens identical -> all gram hashes equal -> each window's
    # rightmost index is selected: window i picks pos i + w - 1
    rows = _fps(spark, ["tok " * 12])  # 12 tokens -> 9 grams -> 6 windows
    got = sorted((r.pos, r.doc_id) for r in rows)
    assert [p for p, _ in got] == [W - 1 + i for i in range(6)]
    assert len({r.fp for r in rows}) == 1


def test_density_bound(spark):
    # paper §5: expected density of selected positions ~ 2 / (w + 1);
    # assert the trivial hard bound instead — at most one NEW fingerprint
    # per window, at least one per w windows
    n_tokens = 200
    text = " ".join(f"t{i * 7 % 61}x{i}" for i in range(n_tokens))
    rows = _fps(spark, [text])
    n_grams = n_tokens - K + 1
    n_windows = n_grams - W + 1
    assert n_windows // W <= len(rows) <= n_windows


def test_short_docs_emit_nothing(spark):
    # < k tokens: no gram; < w + k - 1 tokens: grams but no window
    rows = _fps(spark, ["a b c", "a b c d e f"])
    assert rows == []


def test_exactly_one_window(spark):
    rows = _fps(spark, ["a b c d e f g"])  # 7 tokens = w + k - 1 -> 1 window
    assert len(rows) == 1


def test_pairs_found_and_thresholded(spark):
    shared = "the quick brown fox jumps over the lazy dog today ok fine"
    df = spark.createDataFrame(
        [
            (1, f"{shared} intro one two three"),
            (2, f"other words first {shared}"),
            (3, "completely unrelated text about maritime navigation beacons"
                " and lighthouse maintenance schedules for northern coasts"),
        ],
        "doc_id long, text string",
    )
    got = {(r.doc_a, r.doc_b) for r in winnow_pairs(df).collect()}
    assert got == {(1, 2)}


def test_pairs_stop_fingerprint_cap(spark):
    # the same boilerplate in MANY docs: with max_df below the df the
    # fingerprints are stop-fingerprints and no pair survives
    boiler = "subscribe to our newsletter for updates and offers today"
    df = spark.createDataFrame(
        [(i, f"doc number {i} says {boiler}") for i in range(1, 9)],
        "doc_id long, text string",
    )
    assert winnow_pairs(df, max_df=3).count() == 0
    assert winnow_pairs(df, max_df=100).count() > 0


def test_fingerprint_stage_is_narrow(spark):
    df = spark.createDataFrame([(1, "a b c d e f g h")], "doc_id long, text string")
    plan = winnow_fingerprints(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # one narrow projection, zero shuffles


def test_positions_localize_overlap(spark):
    # same shared run at different offsets -> shared fp VALUES but
    # different positions (local fingerprinting, unlike MinHash)
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = _fps(spark, [f"{shared} tail", f"p q r s t u v w {shared}"])
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.fp] = r.pos
    common = set(by_doc[1]) & set(by_doc[2])
    assert common
    assert all(by_doc[2][f] - by_doc[1][f] == 8 for f in common)
