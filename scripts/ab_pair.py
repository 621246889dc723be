"""Interleaved A/B/A anti-scaling probe — the controlled measurement
behind the round-3 gate-flag adjudications (BENCH/BASELINE.md).

Single-window bench pairs on this shared box flag whatever co-tenant
noise touched (2-3x swings between identical runs were measured); this
probe alternates whole sessions between the two cpu levels (A B A B),
runs each query once per session, and reports best-per-level + ratio, so
slow drift cancels instead of landing on one level.

Usage: python scripts/ab_pair.py query [query ...] [--cpus A B] [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_spark.contract import QUERIES  # noqa: E402
from ocr_spark.plans.session import get_spark  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--cpus", nargs=2, type=int, default=[8, 32])
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    unknown = [q for q in args.queries if q not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    if args.cpus[0] == args.cpus[1]:
        sys.exit(
            "--cpus levels must differ (equal values would collapse the"
            " results dict and silently merge the two legs)"
        )

    results = {q: {c: [] for c in args.cpus} for q in args.queries}
    for rep in range(args.reps):
        for cpus in args.cpus:
            spark = get_spark(f"ab_{rep}_{cpus}", cpus=cpus)
            spark.sparkContext.setLogLevel("ERROR")
            spark.range(1000).selectExpr("sum(id)").collect()
            # warm EVERY query once (python workers, codegen, broadcasts)
            # so no query's first timed run is charged per-session setup
            for q in args.queries:
                QUERIES[q](spark, args.sf).count()
            spark.catalog.clearCache()
            for q in args.queries:
                t0 = time.time()
                QUERIES[q](spark, args.sf).count()
                results[q][cpus].append(round(time.time() - t0, 2))
                spark.catalog.clearCache()
            spark.stop()
            print(f"# rep{rep} cpus{cpus} done", file=sys.stderr, flush=True)

    lo, hi = sorted(args.cpus)
    out = []
    for q in args.queries:
        b_lo, b_hi = min(results[q][lo]), min(results[q][hi])
        out.append(
            {"query": q, f"cpus{lo}": b_lo, f"cpus{hi}": b_hi,
             "ratio": round(b_hi / b_lo, 2), "raw": results[q]}
        )
        print(f"{q:24s} {lo}c {b_lo:7.2f}  {hi}c {b_hi:7.2f}  ratio {b_hi/b_lo:5.2f}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
