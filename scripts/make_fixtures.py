"""(Re)generate the committed oracle fixtures for the deterministic
non-SQL-expressible queries (contract.FIXTURE_ORACLES).

The driver's correctness gate runs each Spark query at sf0.01 next to its
oracle SQL; for queries DuckDB cannot express (grouped numpy kernels,
xxhash64 signatures, the extraction pipeline itself) the oracle is a
trivial SELECT over a parquet fixture produced HERE by the same kernels.
Run this script ONLY after an intentional semantics change, then commit
the refreshed `fixtures/sf001/`:

    python scripts/make_fixtures.py [sf_dir]

A stale fixture after an unintended change is the point — it turns a
silent kernel regression into a driver-visible hash mismatch.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_spark.contract import FIXTURE_DIR, FIXTURE_ORACLES, QUERIES  # noqa: E402
from ocr_spark.plans.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("make_fixtures", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    manifest = {}
    for name in FIXTURE_ORACLES:
        out = os.path.join(FIXTURE_DIR, name + ".parquet")
        df = QUERIES[name](spark, sf_dir)
        df.coalesce(1).write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
        manifest[name] = n
        print(f"{name:20s} {n:8d} rows -> {out}")
    with open(os.path.join(FIXTURE_DIR, "manifest.json"), "w") as f:
        json.dump({"sf_dir": sf_dir, "rows": manifest}, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
