#!/bin/bash
# Sequential round-3 TPU evidence queue. Run AFTER tuned overlays are final:
# batch scaling (also warms bench.py's B=128 program in the shared compile
# cache) -> gather microbench -> tuned 9-combo matrix (5 runs, adaptive
# restarts). Calibration and the parity matrix run on CPU in parallel
# (tools/run_cpu_queue.sh).
set -u
cd "$(dirname "$0")/.."

while pgrep -f 'tune_execution' >/dev/null 2>&1; do sleep 20; done

step() { echo "=== $(date +%H:%M:%S) $* ===" >&2; }

# matrix first — it is the round's must-land artifact; scaling (which also
# warms bench.py's B=128 program) and the gather microbench follow
# timeouts sized so the whole queue drains before the round's bench run
# needs the chip (a timed-out matrix still keeps completed combos — the
# driver flushes incrementally and contains per-combo errors)
step tuned matrix
timeout 7800 python benchmarking.py --all --runs 5 --adaptive-rounds 2 \
  --json-out RESULTS_r03.json 2>&1 | grep -v '^WARNING'

step batch scaling
timeout 1500 python tools/batch_scaling.py --sizes 36 128 --reps 1 2>&1 | grep -v '^WARNING'

step gather bench
timeout 1200 python tools/gather_bench.py 2>&1 | grep -v '^WARNING'

echo EVAL_QUEUE_DONE
