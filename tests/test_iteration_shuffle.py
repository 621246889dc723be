"""iteration_shuffle (plans/session): state-sized loop partitioning in an
isolated cloned session — the parent's conf is NEVER touched (VERDICT r04
#5), so concurrently-planned queries cannot inherit the loop's bound."""

import threading

from pyspark.sql import functions as F

from ocr_spark.plans.session import iteration_shuffle


def test_scales_with_state_and_clamps(spark):
    par = spark.sparkContext.defaultParallelism
    with iteration_shuffle(spark, 10) as it:
        assert it.n == 1  # toy state -> one partition
    with iteration_shuffle(spark, 250_000) as it:
        assert it.n == min(3, par)
    with iteration_shuffle(spark, 10**9) as it:
        assert it.n == par  # clamped to the session's parallelism


def test_parent_conf_untouched_clone_bounded(spark):
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    with iteration_shuffle(spark, 1) as it:
        # the parent session keeps its scan-sized setting THROUGHOUT
        assert spark.conf.get(key) == old
        assert it.spark.conf.get(key) == "1"
        # a shuffle materialized from a BOUND frame carries the bound
        df = (
            it.bind(spark.range(100))
            .groupBy((F.col("id") % 7).alias("k"))
            .count()
            .localCheckpoint(eager=True)
        )
        assert df.rdd.getNumPartitions() == 1
    assert spark.conf.get(key) == old


def test_bound_frame_matches_parent_values(spark):
    src = spark.range(200).select(
        F.col("id"), (F.col("id") % 5).alias("k")
    )
    expect = {r["k"]: r["n"] for r in src.groupBy("k").agg(F.count("*").alias("n")).collect()}
    with iteration_shuffle(spark, 1) as it:
        got = {
            r["k"]: r["n"]
            for r in it.bind(src).groupBy("k").agg(F.count("*").alias("n")).collect()
        }
    assert got == expect


def test_views_dropped_on_exit(spark):
    with iteration_shuffle(spark, 1) as it:
        it.bind(spark.range(3))
        names = [v.name for v in spark.catalog.listTables("global_temp")]
        assert any(n.startswith("ocr_spark_iter_") for n in names)
    names = [v.name for v in spark.catalog.listTables("global_temp")]
    assert not any(n.startswith("ocr_spark_iter_") for n in names)


def test_exception_path_cleans_up(spark):
    """The finally-block invariant the clone design actually introduced:
    bound global temp views must be dropped even when the loop body
    raises (the parent conf can no longer change by construction, but
    assert it anyway as the no-bleed bound)."""
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    try:
        with iteration_shuffle(spark, 1) as it:
            it.bind(spark.range(3))
            names = [v.name for v in spark.catalog.listTables("global_temp")]
            assert any(n.startswith("ocr_spark_iter_") for n in names)
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    names = [v.name for v in spark.catalog.listTables("global_temp")]
    assert not any(n.startswith("ocr_spark_iter_") for n in names)
    assert spark.conf.get(key) == old


def test_threaded_concurrent_query_sees_session_partitioning(spark):
    """The VERDICT r04 'Done' criterion: while one thread holds an
    iteration scope open, a query planned on the PARENT session from
    another thread must NOT inherit the loop's 1-partition bound."""
    key = "spark.sql.shuffle.partitions"
    old = int(spark.conf.get(key))
    in_scope = threading.Event()
    release = threading.Event()
    seen = {}

    def loop_thread():
        with iteration_shuffle(spark, 1) as it:
            bound = (
                it.bind(spark.range(50))
                .groupBy((F.col("id") % 3).alias("k"))
                .count()
                .localCheckpoint(eager=True)
            )
            seen["bound_parts"] = bound.rdd.getNumPartitions()
            in_scope.set()
            release.wait(timeout=30)

    t = threading.Thread(target=loop_thread)
    t.start()
    assert in_scope.wait(timeout=60)
    def parent_probe():
        df = (
            spark.range(1000)
            .groupBy((F.col("id") % 97).alias("k"))
            .count()
            .localCheckpoint(eager=True)
        )
        return df.rdd.getNumPartitions()

    try:
        # concurrent planning on the parent while the scope is open
        seen["parent_conf"] = int(spark.conf.get(key))
        seen["parent_parts_during"] = parent_probe()
    finally:
        release.set()
        t.join(timeout=60)
    assert seen["bound_parts"] == 1
    assert seen["parent_conf"] == old
    # AQE coalesces the tiny probe identically whether or not a scope is
    # open — identical planning in-scope vs after-scope IS the no-bleed
    # evidence (the old implementation made the in-scope run plan with
    # the loop's conf)
    assert seen["parent_parts_during"] == parent_probe()
    assert int(spark.conf.get(key)) == old
