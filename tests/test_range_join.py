"""Bucketed range join: exactness vs a naive join, boundary inclusivity,
overlap/left semantics, and the no-nested-loop plan guarantee."""

import random

from pyspark.sql import functions as F

from ocr_spark.operators.range_join import bucketed_range_join


def test_matches_naive_join_fuzz(spark):
    rng = random.Random(9)
    pts = [(i, rng.randint(0, 1 << 16)) for i in range(300)]
    rgs = []
    for j in range(40):
        lo = rng.randint(0, 1 << 16)
        rgs.append((lo, lo + rng.randint(0, 5000), j))
    p = spark.createDataFrame(pts, "pid int, v long")
    r = spark.createDataFrame(rgs, "lo long, hi long, tag int")
    got = sorted(
        (x.pid, x.tag)
        for x in bucketed_range_join(
            p, r, point_col="v", bucket_bits=10
        ).collect()
    )
    naive = sorted(
        (pid, tag) for pid, v in pts for lo, hi, tag in rgs if lo <= v <= hi
    )
    assert got == naive


def test_boundaries_inclusive_and_left_semantics(spark):
    p = spark.createDataFrame([(1, 10), (2, 20), (3, 21)], "pid int, v long")
    r = spark.createDataFrame([(10, 20, 7)], "lo long, hi long, tag int")
    got = {
        x.pid: x.tag
        for x in bucketed_range_join(
            p, r, point_col="v", bucket_bits=4, how="left"
        ).collect()
    }
    assert got == {1: 7, 2: 7, 3: None}


def test_overlapping_ranges_multi_match(spark):
    p = spark.createDataFrame([(1, 15)], "pid int, v long")
    r = spark.createDataFrame(
        [(10, 20, 1), (12, 16, 2), (17, 30, 3)], "lo long, hi long, tag int"
    )
    tags = sorted(
        x.tag for x in bucketed_range_join(p, r, point_col="v", bucket_bits=3).collect()
    )
    assert tags == [1, 2]


def test_plan_has_no_nested_loop(spark):
    from ocr_spark.contract import QUERIES
    from tests.conftest import SF_SMOKE

    plan = (
        QUERIES["ip_asn"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
