"""Scaling-efficiency evidence (BASELINE.json north_rule).

A real N-vs-4N-executor cluster is unavailable in the sandbox; per the
driver instruction the same job runs at two parallelism levels on the SAME
input and we report docs/sec at both + efficiency = (T_N / T_4N) / 4.

Method notes (recorded in BENCH/BASELINE.md):
- the corpus is replicated large enough that the job is CPU-bound at the
  higher level (>= ~6s of work), so fixed scheduling overhead is amortized;
- each level runs the extraction twice, best-of-2;
- a raw multiprocessing calibration of the SAME kind of work measures the
  box's hardware ceiling (32 hyperthreads on fewer physical cores: the
  8->32 pair conflates SMT with software scaling; the 2->8 pair is inside
  the physical-core range).

Usage: python scripts/scaling.py [n_docs] [cpus...]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def _burn(_):
    s = 0
    for i in range(10_000_000):
        s += i
    return s


def hardware_ceiling(levels):
    """Throughput (burns/sec) of pure-python work at each process count."""
    out = {}
    for n in levels:
        with mp.Pool(n) as p:
            p.map(_burn, range(n))  # warm
            t0 = time.time()
            p.map(_burn, range(n * 4))
            out[n] = round(n * 4 / (time.time() - t0), 2)
    return out


def run_level(cpus: int, pages_path: str) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ocr_spark.operators.extract import extract_pages
    from ocr_spark.plans.session import get_spark

    spark = get_spark(f"scaling_{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path)
    n = pages.count()
    extract_pages(pages).count()  # warm all workers
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        extract_pages(pages).count()
        best = min(best, time.time() - t0)
    spark.stop()
    return {"cpus": cpus, "n_docs": n, "sec": round(best, 3), "docs_per_sec": round(n / best, 1)}


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 160_000
    levels = [int(c) for c in sys.argv[2:]] or [8, 32]

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ocr_spark.plans.session import get_spark
    from ocr_spark.sources.pages import pages_df

    pages_path = f"/tmp/ocr_spark_bench/scaling_pages_n{n_docs}"
    if not os.path.exists(pages_path + "/_SUCCESS"):
        spark = get_spark("scaling_prep", cpus=32)
        spark.sparkContext.setLogLevel("ERROR")
        base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").count()
        rep = max(1, n_docs // base)
        pages_df(spark, "/root/testdata/sf0.1", replicate=rep, partitions=192).write.mode(
            "overwrite"
        ).parquet(pages_path)
        spark.stop()

    results = [run_level(c, pages_path) for c in levels]
    hw = hardware_ceiling(levels)

    report = {"levels": results, "hardware_burns_per_sec": hw}
    for a, b in zip(results, results[1:]):
        ratio = b["docs_per_sec"] / a["docs_per_sec"]
        ideal = b["cpus"] / a["cpus"]
        hw_ratio = hw[b["cpus"]] / hw[a["cpus"]]
        report[f"scaling_{a['cpus']}_to_{b['cpus']}"] = {
            "throughput_ratio": round(ratio, 3),
            "ideal": ideal,
            "efficiency": round(ratio / ideal, 3),
            "hardware_ceiling_ratio": round(hw_ratio, 3),
            "efficiency_vs_hardware": round(ratio / hw_ratio, 3),
        }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
