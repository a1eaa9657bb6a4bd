#!/bin/bash
# Follow-up tuning: franka/bookshelves retry (chunk 3 — K=6 x B=55 x M=24
# faulted the chip) and a wam/industrial epsilon sweep (failures are mm-deep
# dips below the phantom floor + endpoint misses).
set -u
cd "$(dirname "$0")/.."

while pgrep -f tune_execution >/dev/null 2>&1; do sleep 20; done

run() {
  robot=$1; env=$2; shift 2
  echo "=== $(date +%H:%M:%S) $robot/$env $* ===" >&2
  timeout 4000 python tools/tune_execution.py --robot "$robot" --env "$env" \
    --json-out "TUNE_EXEC_${robot}_${env}.json" --seed 0 "$@" 2>&1 \
    | grep -v '^WARNING'
}

run wam industrial --epsilon 0.065 0.08
run franka bookshelves --chunk 3
run wam bookshelves --chunk 3
echo FOLLOWUP_DONE
