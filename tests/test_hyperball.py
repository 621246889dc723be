"""HyperBall harmonic centrality: ball growth, telescoping invariants,
determinism, and shape on known graphs."""

from pyspark.sql import functions as F

from ocr_spark.operators.link_graph import hyperball_harmonic


def edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "src_host string, dst_host string"
    )


def test_isolated_pair_and_chain(spark):
    # a -> b: b's in-ball gains a, a's stays itself
    out = {r.host: r for r in hyperball_harmonic(edges(spark, [("a", "b")])).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"].harmonic_milli == 0  # nothing reaches a
    assert out["b"].harmonic_milli > 0
    assert out["b"].ball_est >= out["a"].ball_est


def test_star_center_dominates(spark):
    # leaves -> center: the center is reached by every leaf at distance 1
    leaves = [f"leaf{i}" for i in range(8)]
    out = {
        r.host: r
        for r in hyperball_harmonic(
            edges(spark, [(l, "center") for l in leaves])
        ).collect()
    }
    assert out["center"].harmonic_milli > 0
    assert all(out[l].harmonic_milli == 0 for l in leaves)
    assert out["center"].ball_est == max(r.ball_est for r in out.values())


def test_chain_distance_discount(spark):
    # a -> b -> c: c is reached by a at distance 2 and b at distance 1;
    # b is reached only by a at distance 1. Telescoping must discount
    # the distance-2 contribution (terms divided by t).
    out = {
        r.host: r
        for r in hyperball_harmonic(edges(spark, [("a", "b"), ("b", "c")])).collect()
    }
    assert out["c"].ball_est >= out["b"].ball_est >= out["a"].ball_est
    assert out["c"].harmonic_milli >= out["b"].harmonic_milli > 0


def test_deterministic_under_parallelism(spark):
    pairs = [(f"h{i}", f"h{(i * 7 + 3) % 11}") for i in range(40)]
    a = sorted(map(tuple, hyperball_harmonic(edges(spark, pairs)).collect()))
    b = sorted(
        map(
            tuple,
            hyperball_harmonic(
                edges(spark, pairs).repartition(7, "src_host")
            ).collect(),
        )
    )
    assert a == b


def test_self_loops_and_duplicates_ignored(spark):
    out = hyperball_harmonic(
        edges(spark, [("a", "a"), ("a", "b"), ("a", "b")])
    ).collect()
    assert {r.host for r in out} == {"a", "b"}
