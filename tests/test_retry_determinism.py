"""Byte-identity under TASK RETRIES — at 1000 executors, task attempts
fail and re-run constantly; the extraction must produce the identical
corpus digest whether or not attempts were retried, and the parquet
sink must commit exactly the clean output (failed-attempt files
discarded). Runs in a SUBPROCESS: retries need `local[N, maxFailures]`
on a fresh SparkContext, which the shared test session can't provide
(getOrCreate would silently reuse it)."""

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.appName("retry_test")
    .master("local[4, 3]")  # up to 3 attempts per task
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from ocr_spark.operators.extract import EXTRACT_SCHEMA, extract_batch
from ocr_spark.sources.pages import pages_df

import tempfile, os
tmp = tempfile.mkdtemp()
pages_df(spark, "/root/testdata/sf0.001", partitions=8).write.mode(
    "overwrite"
).parquet(tmp + "/pages")
pages = spark.read.parquet(tmp + "/pages")


def digest(df):
    return df.select(
        F.md5(
            F.concat_ws(
                "|",
                F.sort_array(F.collect_list(F.concat_ws("#", "url", "text"))),
            )
        ).alias("d")
    ).collect()[0]["d"]


def gen_clean(batches):
    for pdf in batches:
        yield extract_batch(pdf, "greedy")


clean = digest(pages.mapInPandas(gen_clean, schema=EXTRACT_SCHEMA))


# the FIRST attempt of every task dies AFTER already emitting a batch —
# the nastiest case: Spark must discard the partial output, not merge it
def gen_flaky(batches):
    from pyspark import TaskContext

    ctx = TaskContext.get()
    for pdf in batches:
        yield extract_batch(pdf, "greedy")
        if ctx.attemptNumber() == 0:
            raise RuntimeError("injected first-attempt failure")


flaky = digest(pages.mapInPandas(gen_flaky, schema=EXTRACT_SCHEMA))
assert flaky == clean, (flaky, clean)


# tamper sanity: the digest is real
def gen_tampered(batches):
    for pdf in batches:
        out = extract_batch(pdf, "greedy")
        out["text"] = out["text"] + "!"
        yield out


assert digest(pages.mapInPandas(gen_tampered, schema=EXTRACT_SCHEMA)) != clean

# full sink job under retries: committed parquet == clean output
out = tmp + "/out"
pages.mapInPandas(gen_flaky, schema=EXTRACT_SCHEMA).write.mode(
    "overwrite"
).parquet(out)
committed = spark.read.parquet(out)
assert committed.count() == 500
assert committed.select("url").distinct().count() == 500
assert digest(committed) == clean

print("RETRY-DETERMINISM-OK")
"""


def test_extraction_byte_identity_under_task_retries():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "RETRY-DETERMINISM-OK" in proc.stdout
