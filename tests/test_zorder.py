"""Z-order layout: interleave correctness vs a Python reference, the
both-axes-bounded locality property, and plan shape (pure Column)."""

import pytest

from pyspark.sql import functions as F

from ocr_spark.operators.layout import zorder_key, zorder_layout


def py_morton(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 255, 65535) for y in (0, 2, 7, 1024, 65535)]
    df = spark.createDataFrame(rows, "x int, y int").withColumn(
        "z", zorder_key(F.col("x"), F.col("y"))
    )
    for r in df.collect():
        assert r.z == py_morton(r.x, r.y), (r.x, r.y)


def test_shard_bounds_both_axes(spark):
    """The defining property: a shard (top 4 z-bits) fixes the top 2 bits
    of BOTH x and y — so zone maps on either column prune shards."""
    rows = [((i * 7919) % 65536, (i * 104729) % 65536) for i in range(2000)]
    df = zorder_layout(
        spark.createDataFrame(rows, "x int, y int"), "x", "y", n_shards=16
    )
    got = (
        df.groupBy("shard")
        .agg(
            F.countDistinct(F.shiftright("x", 14)).alias("nx"),
            F.countDistinct(F.shiftright("y", 14)).alias("ny"),
        )
        .collect()
    )
    assert got and all(r.nx == 1 and r.ny == 1 for r in got)


def test_power_of_two_required(spark):
    df = spark.createDataFrame([(1, 1)], "x int, y int")
    with pytest.raises(ValueError):
        zorder_layout(df, "x", "y", n_shards=12)


def test_zorder_plan_is_pure_column(spark):
    from ocr_spark.contract import QUERIES
    from tests.conftest import SF_SMOKE

    plan = (
        QUERIES["zorder"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
