"""SparkSession builder tuned for the extraction workload.

Scale knobs (SURVEY.md §4 / guide): AQE on (runtime coalescing + skew
split), Arrow enabled with a bounded batch size (the extraction kernels are
CPU-bound per row; 2k rows/batch keeps executor memory flat at 100 TB-scale
page sizes), shuffle partitions sized to the core count (overridable for the
N-vs-4N scaling evidence).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


def widen(df, min_parts: int | None = None):
    """Small-scan parallelism guard for heavy per-row operators.

    A bench-SF parquet table is one file with ONE row group, so its scan is
    a single task no matter what ``spark.sql.files.*`` says — every
    downstream narrow operator (shingling, hashing, tokenizing) serializes
    on one core. Repartition up to the session's default parallelism ONLY
    when the physical scan has fewer partitions; at production scale a scan
    carries >= cores partitions and this returns the input unchanged (no
    exchange added to the 100 TB plan).
    """
    if df.isStreaming:  # micro-batch sizing is the source's job; df.rdd
        return df  # would throw on a streaming plan anyway
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def get_spark(app: str = "ocr_spark", cpus: int | None = None, **conf) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.appName(app)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.default.parallelism", str(max(cpus, 8)))
        # timestamps render in the session zone (date_format in the CDX
        # sink); pin UTC so exports are byte-identical across machines
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # runtime bloom filters: the big side of a shuffle join (e.g. a full
        # lineage-vs-pages resume after near-complete progress) gets a
        # bloom pre-filter injected from the small side — free row pruning
        # before the exchange at 100 TB, no code changes
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


@contextmanager
def iteration_shuffle(spark, state_rows: int, rows_per_partition: int = 100_000):
    """Bound ``spark.sql.shuffle.partitions`` to the ITERATION STATE's own
    size for the duration of a fixed-point loop, restoring the session
    value on exit.  Yields the partition count chosen.

    Iterative graph/cluster operators (HITS, BFS, pointer jumping,
    redirect doubling) exchange a bounded per-round state — one small row
    per host/node — orders of magnitude smaller than the page-level
    shuffles the session's global shuffle.partitions is sized for.
    Inheriting the global value gives every tiny round cores-many tasks;
    across the loop's tens of stages the fixed per-task cost dominates
    and the operator ANTI-scales with added cores (measured at
    sf0.1/local[32]: hits 5.2 s with 32-partition rounds vs 2.9 s with
    8 — more cores were slower than local[8] until the rounds stopped
    inheriting the scan-sized partitioning).  Deriving the round
    partitioning from the state's cardinality keeps the loop's task count
    proportional to its data at EVERY scale: 1 partition for a toy graph,
    defaultParallelism for a 1e8-host one.  AQE cannot express this:
    coalescing stops at defaultParallelism (parallelismFirst=true), and
    flipping that globally serialized the pointer-jumping CC's real work
    2x — the bound must be per-loop, from the loop's own state size.

    Only effective for loops that run ACTIONS inside the scope (eager
    localCheckpoint / convergence counts) — lazy builders must
    materialize their final state inside it.  Correctness is unaffected:
    every wrapped loop is partitioning-invariant by construction
    (integral, order-independent updates; partition-invariance tests).

    SINGLE-THREADED-DRIVER ASSUMPTION: this mutates the session-global
    ``spark.sql.shuffle.partitions`` for the scope's duration, so any
    query planned CONCURRENTLY on the same SparkSession (driver thread
    pools, shared Spark Connect sessions) could inherit the loop's small
    value.  This repo's drivers are single-threaded (bench/contract/jobs
    run queries sequentially), which is why the conf scope is safe here;
    a multi-tenant driver should instead pin the loop state with explicit
    ``repartition(n)`` on each round's state DataFrame.
    """
    n = max(
        1,
        min(spark.sparkContext.defaultParallelism, -(-state_rows // rows_per_partition)),
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
