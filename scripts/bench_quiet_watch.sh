#!/bin/bash
# Poll the host-speed calibration; when a fast window appears (single-
# thread burn < $THRESH s, default 0.45 — see bench.py
# IDLE_CALIBRATION_SEC), run the bench pair (8c, then 32c with the
# anti-scaling pair gate) and the 2/8/32 scaling run, writing into
# BENCH/. The single-thread probe can read slow while Spark runs fast
# (BENCH/BASELINE.md round-4 note) — when in doubt, run one Spark leg
# and let its timings decide.
#
# Usage: scripts/bench_quiet_watch.sh [polls] [sleep_s] [thresh]
cd "$(dirname "$0")/.."
POLLS=${1:-40}; SLEEP=${2:-150}; THRESH=${3:-0.45}
calib() {
python - <<'PY'
import time
best=1e9
for _ in range(4):
    t0=time.time(); s=0
    for i in range(10_000_000): s+=i
    best=min(best,time.time()-t0)
print(round(best,3))
PY
}
for i in $(seq 1 "$POLLS"); do
  c=$(calib)
  echo "poll $i calibration=$c $(date +%H:%M:%S)"
  if [ "$(python -c "print(1 if $c < $THRESH else 0)")" = "1" ]; then
    echo "fast window — running bench pair + scaling"
    SPARK_GRAFT_CPUS=8 python bench.py 2>/dev/null | tail -1 > BENCH/bench_quiet_cpus8.json
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_PAIR_JSON=BENCH/bench_quiet_cpus8.json \
      python bench.py 2>/dev/null | tail -1 > BENCH/bench_quiet_cpus32.json
    python scripts/scaling.py 160000 2 8 32 2>/dev/null > BENCH/scaling_run_quiet.json.txt
    echo "done $(date +%H:%M:%S) calib=$(calib)"
    exit 0
  fi
  sleep "$SLEEP"
done
echo "no fast window found in budget"
exit 3
