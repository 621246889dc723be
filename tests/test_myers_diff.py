"""Myers diff: minimality vs LCS DP, patch round-trip fuzz, determinism,
and the snapshot_line_diff operator."""

import random

from ocr_spark.kernels.myers import apply_diff, myers_diff


def lcs_len(a, b):
    m = len(b)
    prev = [0] * (m + 1)
    for x in a:
        cur = [0] * (m + 1)
        for j in range(1, m + 1):
            cur[j] = prev[j - 1] + 1 if x == b[j - 1] else max(prev[j], cur[j - 1])
        prev = cur
    return prev[m]


def test_basic_cases():
    assert myers_diff([], []) == []
    assert myers_diff(["a"], ["a"]) == []
    assert myers_diff(["a"], []) == [("-", 0, None, "a")]
    assert myers_diff([], ["a"]) == [("+", None, 0, "a")]
    # single replace in context
    ops = myers_diff(["x", "old", "y"], ["x", "new", "y"])
    assert ops == [("-", 1, None, "old"), ("+", None, 1, "new")]
    # pure append
    assert myers_diff(["x"], ["x", "z"]) == [("+", None, 1, "z")]


def test_roundtrip_and_minimality_fuzz():
    rng = random.Random(3)
    alphabet = ["a", "b", "c", "d"]
    for _ in range(400):
        a = [rng.choice(alphabet) for _ in range(rng.randint(0, 12))]
        b = [rng.choice(alphabet) for _ in range(rng.randint(0, 12))]
        ops = myers_diff(a, b)
        assert apply_diff(a, ops) == b
        # Myers guarantees the MINIMAL script: |ops| == n + m - 2*LCS
        assert len(ops) == len(a) + len(b) - 2 * lcs_len(a, b)
        # determinism
        assert myers_diff(a, b) == ops


def test_operator_and_construction_parity(spark):
    """The generic kernel on the residue-constructed snapshots must produce
    exactly the construction's known edits (the same check the DuckDB
    oracle performs in SQL)."""
    from ocr_spark.contract import QUERIES
    from tests.conftest import SF_SMOKE

    rows = QUERIES["snapshot_diff"](spark, SF_SMOKE).collect()
    assert rows
    by_key = {}
    for r in rows:
        by_key.setdefault((r.url, r.ts_to), []).append(r)
    for (url, ts_to), hunk in by_key.items():
        ops = sorted(r.op for r in hunk)
        assert ops in (["+", "-"], ["+", "+", "-"])  # replace [+ append]
        minus = [r for r in hunk if r.op == "-"][0]
        plus_same = [r for r in hunk if r.op == "+" and r.b_idx == minus.a_idx]
        assert len(plus_same) == 1  # the replace lands at the same index
        assert minus.line.rsplit(" ", 1)[0] == plus_same[0].line.rsplit(" ", 1)[0]


def test_unchanged_snapshots_emit_nothing(spark):
    from ocr_spark.operators.crawl_history import snapshot_line_diff

    rows = [
        ("u", 1, ["a", "b"]),
        ("u", 2, ["a", "b"]),  # unchanged
        ("u", 3, ["a", "c", "b"]),  # one insert
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_epoch long, lines array<string>"
    )
    got = snapshot_line_diff(df).collect()
    assert [(r.ts_from, r.ts_to, r.op, r.a_idx, r.b_idx, r.line) for r in got] == [
        (2, 3, "+", None, 1, "c")
    ]
