#!/bin/bash
# Sequential round-3 evidence queue (one TPU process at a time).
# Run AFTER tuned overlays are final: calibration -> tuned matrix -> parity
# matrix -> batch scaling -> gather microbench -> bench rehearsal.
set -u
cd "$(dirname "$0")/.."

while pgrep -f 'tune_execution|benchmarking|batch_scaling|calibrate_validator' >/dev/null 2>&1; do sleep 20; done

step() { echo "=== $(date +%H:%M:%S) $* ===" >&2; }

step calibrate_validator
timeout 7200 python tools/calibrate_validator.py 2>&1 | grep -v '^WARNING' | tail -40

step tuned matrix
timeout 10800 python benchmarking.py --all --runs 5 --adaptive-rounds 2 \
  --json-out RESULTS_r03.json 2>&1 | grep -v '^WARNING'

step parity matrix
timeout 10800 python benchmarking.py --all --runs 5 --parity \
  --json-out RESULTS_r03_parity.json 2>&1 | grep -v '^WARNING'

step batch scaling
timeout 5400 python tools/batch_scaling.py 2>&1 | grep -v '^WARNING'

step gather bench
timeout 1800 python tools/gather_bench.py 2>&1 | grep -v '^WARNING'

step bench rehearsal
timeout 3600 python bench.py 2>&1 | tail -5

echo EVAL_QUEUE_DONE
