#!/bin/bash
# Sequential round-5 TPU evidence queue. GRAM_BENCH.json and PROFILE_r05.json
# were captured standalone earlier in the round; this queue runs the
# remaining chip artifacts. Every tool flushes incrementally, so a
# wall-clock cut keeps completed artifacts.
set -u
cd "$(dirname "$0")/.."

step() { echo "=== $(date +%H:%M:%S) $* ===" >&2; }

step bench
timeout 4500 python bench.py 2>&1 | grep -v '^WARNING' | tail -5

step tuned matrix
timeout 12000 python benchmarking.py --all --runs 5 --adaptive-rounds 3 \
  --json-out RESULTS_r05.json 2>&1 | grep -v '^WARNING'

step batch scaling full ladder
timeout 5400 python tools/batch_scaling.py --json-out SCALING_r05.json --reps 2 2>&1 | grep -v '^WARNING'

step agreement
timeout 5400 python tools/agreement_r05.py --fresh 2>&1 | grep -v '^WARNING'

echo EVAL_QUEUE_R05_DONE
