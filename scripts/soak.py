"""Sustained-scale soak: replicate the bench pages corpus N-fold, run the
flagship extraction plan (scan -> ONE mapInPandas -> count) warm, report
steady-state docs/sec.  The linear-runtime evidence behind the 10^12-doc
design point (BENCH/BASELINE.md "Sustained scale").

Usage: python scripts/soak.py [n_docs] [cpus] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_spark.operators.extract import extract_pages  # noqa: E402
from ocr_spark.plans.session import get_spark  # noqa: E402
from ocr_spark.sources.pages import pages_df  # noqa: E402


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_560_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    spark = get_spark("soak", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    replicate = max(1, n_docs // base)
    splits = max(cpus * 8, (base * replicate) // 20_000)
    # key the replica cache by the SOURCE dir too — row count alone would
    # silently reuse a previous corpus' parquet for a different sf_dir
    src_key = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    path = f"/tmp/ocr_spark_soak/pages_{src_key}_n{base * replicate}"
    if not os.path.exists(path + "/_SUCCESS"):
        t0 = time.time()
        pages_df(spark, sf_dir, replicate=replicate, partitions=splits).write.mode(
            "overwrite"
        ).parquet(path)
        print(json.dumps({"synth_sec": round(time.time() - t0, 1)}), flush=True)
    pages = spark.read.parquet(path)
    n = pages.count()

    t0 = time.time()
    out = extract_pages(pages).count()
    cold = time.time() - t0
    t0 = time.time()
    extract_pages(pages).count()
    warm = time.time() - t0
    print(
        json.dumps(
            {
                "n_docs": n,
                "n_extracted": out,
                "cpus": cpus,
                "cold_sec": round(cold, 1),
                "warm_sec": round(warm, 1),
                "warm_docs_per_sec": round(n / warm, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
