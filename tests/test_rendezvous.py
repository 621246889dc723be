"""Rendezvous (HRW) sharding: the minimal-movement guarantee, assignment
balance sanity, determinism across parallelism, and plan purity."""

import pytest

from pyspark.sql import functions as F

from ocr_spark.operators.layout import rendezvous_shard


def _urls(spark, n=400):
    return spark.range(n).select(
        F.concat(
            F.lit("https://host"),
            (F.col("id") % 50).cast("string"),
            F.lit(".example/p/"),
            F.col("id").cast("string"),
        ).alias("url")
    )


def test_minimal_movement(spark):
    """THE rendezvous property: dropping shard S moves exactly the keys
    that were assigned to S — every other key keeps its argmax."""
    shards = tuple(f"node{i:02d}" for i in range(16))
    df = _urls(spark).select(
        "url",
        rendezvous_shard(F.col("url"), shards).alias("a"),
        rendezvous_shard(F.col("url"), shards[:-1]).alias("b"),
    )
    rows = df.collect()
    assert rows
    for r in rows:
        if r.a == "node15":
            assert r.b != "node15"
        else:
            assert r.b == r.a, r.url


def test_balance_and_determinism(spark):
    shards = ("a", "b", "c", "d")
    counts = {
        r.s: r["count"]
        for r in _urls(spark, 1000)
        .select(rendezvous_shard(F.col("url"), shards).alias("s"))
        .groupBy("s")
        .count()
        .collect()
    }
    # every shard gets a sane share (uniform would be 250 each); this is
    # the regression net for the affine-family degeneracy, where one
    # shard took 100% of keys
    assert set(counts) == set(shards)
    assert all(150 <= c <= 350 for c in counts.values()), counts
    # repartitioning the input cannot change a per-row Column expression,
    # but pin it anyway: same assignment at different parallelism
    again = {
        r.s: r["count"]
        for r in _urls(spark, 1000)
        .repartition(13)
        .select(rendezvous_shard(F.col("url"), shards).alias("s"))
        .groupBy("s")
        .count()
        .collect()
    }
    assert counts == again


def test_needs_two_shards(spark):
    with pytest.raises(ValueError):
        rendezvous_shard(F.col("url"), ["only"])


def test_rendezvous_plan_is_pure_column(spark):
    from ocr_spark.contract import QUERIES
    from tests.conftest import SF_SMOKE

    plan = (
        QUERIES["rendezvous"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
