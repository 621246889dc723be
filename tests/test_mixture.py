"""UniMax allocation (operators/mixture.py): differential test of the
closed-form window program against a loop-form reference implementation
of the published algorithm, plus edge cases (all-capped, tiny budget,
remainder distribution)."""

import pandas as pd
import pytest

from ocr_spark.operators.mixture import unimax_allocation


def unimax_loop(tokens: dict[str, int], budget: int, max_epochs: int) -> dict[str, int]:
    """Reference water-filling: ascending-capacity sweep, integer shares,
    remainder to the first sources in sort order."""
    items = sorted(tokens.items(), key=lambda kv: (kv[1] * max_epochs, kv[0]))
    caps = [c * max_epochs for _, c in items]
    alloc = {}
    remaining = budget
    # capped prefix
    k = 0
    for i, (name, _) in enumerate(items):
        if caps[i] * (len(items) - i) <= remaining:
            alloc[name] = caps[i]
            remaining -= caps[i]
            k = i + 1
        else:
            break
    rest = items[k:]
    if rest:
        u, rem = divmod(remaining, len(rest))
        for j, (name, _) in enumerate(rest):
            alloc[name] = u + (1 if j < rem else 0)
    return alloc


def _docs(spark, sources):
    rows = []
    i = 0
    for src, texts in sources.items():
        for t in texts:
            rows.append({"doc_id": i, "source": src, "text": t})
            i += 1
    return spark.createDataFrame(pd.DataFrame(rows))


@pytest.mark.parametrize("divisor,epochs", [(2, 2), (1, 1), (10, 4)])
def test_unimax_matches_loop_reference(spark, divisor, epochs):
    sources = {
        "tiny": ["a b"],
        "small": ["a b c d", "e f"],
        "mid": ["one two three four five six"] * 3,
        "big": ["w " * 50] * 8,
    }
    tokens = {s: sum(len(t.split()) for t in ts) for s, ts in sources.items()}
    budget = sum(tokens.values()) // divisor
    expected = unimax_loop(tokens, budget, epochs)
    out = {
        r.source: r.allocation
        for r in unimax_allocation(
            _docs(spark, sources), budget_divisor=divisor, max_epochs=epochs
        ).collect()
    }
    assert out == expected
    # budget fully spent unless every source is capped
    if sum(expected.values()) < budget:
        assert all(
            expected[s] == tokens[s] * epochs for s in sources
        ), "under-spend only when all capped"


def test_unimax_all_capped_no_div_by_zero(spark):
    # huge budget (divisor 1, epochs 1): every source capped at its tokens
    sources = {"a": ["x y"], "b": ["z"]}
    out = {
        r.source: (r.allocation, r.epochs_milli)
        for r in unimax_allocation(
            _docs(spark, sources), budget_divisor=1, max_epochs=1
        ).collect()
    }
    assert out == {"a": (2, 1000), "b": (1, 1000)}
