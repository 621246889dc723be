"""Deterministic synchronous label propagation (operators/link_graph)."""

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.link_graph import label_propagation

pytestmark = pytest.mark.usefixtures("spark")


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src_host string, dst_host string")


def _run(spark, pairs, n_iters):
    out = label_propagation(_edges(spark, pairs), n_iters=n_iters)
    return {r.host: r.community for r in out.collect()}


def test_two_triangles_with_bridge(spark):
    # triangles {a,b,c} and {x,y,z}, one bridge c-x: each triangle
    # converges to one internal label, the bridge is outvoted 2:1 on both
    # sides so the two communities stay distinct
    pairs = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("x", "y"), ("y", "z"), ("z", "x"),
        ("c", "x"),
    ]
    got = _run(spark, pairs, n_iters=4)
    assert got["a"] == got["b"] == got["c"]
    assert got["x"] == got["y"] == got["z"]
    assert got["a"] != got["x"]
    # deterministic: same call, same labels
    assert _run(spark, pairs, n_iters=4) == got


def test_direction_and_self_loops_ignored(spark):
    # reversed duplicates and self-loops must not change the undirected vote
    base = [("a", "b"), ("b", "c"), ("c", "a")]
    noisy = base + [("b", "a"), ("c", "c"), ("a", "a")]
    assert _run(spark, base, 3) == _run(spark, noisy, 3)


def test_partition_invariance(spark):
    pairs = [(f"n{i:02d}", f"n{(i * 7 + 3) % 40:02d}") for i in range(40)]
    a = label_propagation(_edges(spark, pairs).repartition(1), n_iters=5)
    b = label_propagation(_edges(spark, pairs).repartition(13), n_iters=5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_planted_blocks_never_mix(spark):
    """The host_communities query's planted 3-block graph: every community
    label stays inside its own block of 120."""
    from ocr_spark.contract import QUERIES

    rows = QUERIES["host_communities"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 360
    n_comms = len({r.community for r in rows})
    assert n_comms == 12  # converged count (4 per block), pinned
    for r in rows:
        assert int(r.host[1:]) // 120 == int(r.community[1:]) // 120
