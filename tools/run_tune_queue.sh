#!/bin/bash
# Sequential execution-metric tuning queue (one TPU process at a time).
# Waits for any running tuner to exit first, then runs every combo under the
# query-grounded phantom-floor executor (commit cf2d91e).
set -u
cd "$(dirname "$0")/.."

while pgrep -f tune_execution >/dev/null 2>&1; do sleep 20; done

run() {
  robot=$1; env=$2; shift 2
  echo "=== $(date +%H:%M:%S) $robot/$env $* ===" >&2
  timeout 3600 python tools/tune_execution.py --robot "$robot" --env "$env" \
    --json-out "TUNE_EXEC_${robot}_${env}.json" --seed 0 "$@" 2>&1 \
    | grep -v '^WARNING'
}

# re-verify the committed franka/industrial subset under the corrected metric
run franka industrial --inits frand5 frand0 frand4 rand0 frand1 waypoint
run kuka industrial
run franka bookshelves
run kuka bookshelves
run wam industrial
run wam bookshelves
run wam lab
run ur10 industrial
run ur10 bookshelves
echo ALL_TUNES_DONE
