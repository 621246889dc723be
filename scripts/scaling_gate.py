"""Anti-scaling gate over a recorded bench pair (VERDICT r02 item 4).

Usage: python scripts/scaling_gate.py BENCH/bench_small.json BENCH/bench_big.json

Flags every query whose big-cpu time is BOTH > 1.3x the small-cpu time
AND > 2 s — "more cores, meaningfully slower". Exit 1 if anything is
flagged, so this can gate a round's recorded pair. bench.py applies the
same rule inline when SPARK_GRAFT_PAIR_JSON is set; this script re-checks
already-recorded files.
"""

from __future__ import annotations

import json
import sys


def gate(small: dict, big: dict, ratio: float = 1.3, floor: float = 2.0):
    flagged = []
    for name, t_big in big.get("queries", {}).items():
        t_small = small.get("queries", {}).get(name)
        if t_small and t_big > floor and t_big > ratio * t_small:
            flagged.append((name, t_small, t_big, round(t_big / t_small, 2)))
    return flagged


def main():
    small_path, big_path = sys.argv[1], sys.argv[2]
    with open(small_path) as f:
        small = json.load(f)
    with open(big_path) as f:
        big = json.load(f)
    if small.get("cpus", 0) > big.get("cpus", 0):
        small, big = big, small
    flagged = gate(small, big)
    print(
        f"pair: {small.get('cpus')}c -> {big.get('cpus')}c  "
        f"rule: t_big > 1.3 * t_small and t_big > 2s"
    )
    for name, a, b, r in sorted(flagged, key=lambda x: -x[3]):
        print(f"ANTI-SCALING  {name:24s} {a:7.2f}s -> {b:7.2f}s  ({r}x)")
    if not flagged:
        print("OK: no query anti-scales")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
