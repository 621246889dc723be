"""iteration_shuffle (plans/session): state-sized loop partitioning."""

from pyspark.sql import functions as F

from ocr_spark.plans.session import iteration_shuffle


def test_scales_with_state_and_clamps(spark):
    par = spark.sparkContext.defaultParallelism
    with iteration_shuffle(spark, 10) as n:
        assert n == 1  # toy state -> one partition
    with iteration_shuffle(spark, 250_000) as n:
        assert n == min(3, par)
    with iteration_shuffle(spark, 10**9) as n:
        assert n == par  # clamped to the session's parallelism


def test_restores_session_conf_and_applies_inside(spark):
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    with iteration_shuffle(spark, 1):
        assert spark.conf.get(key) == "1"
        # a shuffle materialized INSIDE the scope carries the bound
        df = (
            spark.range(100)
            .groupBy((F.col("id") % 7).alias("k"))
            .count()
            .localCheckpoint(eager=True)
        )
        assert df.rdd.getNumPartitions() == 1
    assert spark.conf.get(key) == old


def test_restores_on_exception(spark):
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    try:
        with iteration_shuffle(spark, 1):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get(key) == old
