"""SparkSession builder tuned for the extraction workload.

Scale knobs (SURVEY.md §4 / guide): AQE on (runtime coalescing + skew
split), Arrow enabled with a bounded batch size (the extraction kernels are
CPU-bound per row; 2k rows/batch keeps executor memory flat at 100 TB-scale
page sizes), shuffle partitions sized to the core count (overridable for the
N-vs-4N scaling evidence).
"""

from __future__ import annotations

import os

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
