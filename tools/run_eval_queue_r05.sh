#!/bin/bash
# Sequential round-5 TPU evidence queue. Order: fast numerical feedback on
# the half-whitened Gram rework first (gram bench + profile), then the
# headline bench, then the 9-combo matrix, then scaling (full ladder incl.
# the 512 fault row) and the executor/validator agreement (reuses matrix
# compile-cache shapes). Every tool flushes incrementally, so a wall-clock
# cut keeps completed artifacts.
set -u
cd "$(dirname "$0")/.."

step() { echo "=== $(date +%H:%M:%S) $* ===" >&2; }

step gram bench
timeout 2400 python tools/gram_bench.py 2>&1 | grep -v '^WARNING' | tail -12

step profile breakdown
timeout 2400 python tools/profile_breakdown.py --json-out PROFILE_r05.json 2>&1 | grep -v '^WARNING' | tail -20

step bench
timeout 4500 python bench.py 2>&1 | grep -v '^WARNING' | tail -5
cp -f BENCH_PARTIAL.json BENCH_SELF_r05_partial.json 2>/dev/null || true

step tuned matrix
timeout 10000 python benchmarking.py --all --runs 5 --adaptive-rounds 3 \
  --json-out RESULTS_r05.json 2>&1 | grep -v '^WARNING'

step batch scaling full ladder
timeout 5400 python tools/batch_scaling.py --json-out SCALING_r05.json --reps 2 2>&1 | grep -v '^WARNING'

step agreement
timeout 5400 python tools/agreement_r05.py 2>&1 | grep -v '^WARNING'

echo EVAL_QUEUE_R05_DONE
