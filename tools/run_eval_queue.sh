#!/bin/bash
# Sequential round-4 TPU evidence queue. Run AFTER overlays are final:
# tuned 9-combo matrix (5 runs, adaptive restarts) -> batch scaling ->
# gather microbench (Pallas go/no-go) -> profile breakdown. Calibration and
# the parity matrix run on CPU in parallel (tools/run_cpu_queue.sh).
set -u
cd "$(dirname "$0")/.."

step() { echo "=== $(date +%H:%M:%S) $* ===" >&2; }

# matrix first — it is the round's must-land artifact. The adaptive engine
# compiles ONE [B]-shaped program per combo (no K-axis ensemble program),
# and the driver flushes incrementally + contains per-combo errors, so a
# timeout still keeps completed combos.
step tuned matrix
timeout 9000 python benchmarking.py --all --runs 5 --adaptive-rounds 3 \
  --json-out RESULTS_r04.json 2>&1 | grep -v '^WARNING'

step batch scaling
timeout 1800 python tools/batch_scaling.py --sizes 36 128 256 --reps 2 2>&1 | grep -v '^WARNING'

step gather bench
timeout 1200 python tools/gather_bench.py 2>&1 | grep -v '^WARNING'

step profile breakdown
timeout 1200 python tools/profile_breakdown.py 2>&1 | grep -v '^WARNING'

echo EVAL_QUEUE_DONE
