#!/bin/bash
# Round-3 retune queue (runs after the primary tune queue drains).
# - wam/industrial: its first tune predates the 5mm contact-slack fix
#   (sub-voxel grasp-approach dips no longer block), and its real failures
#   motivate an epsilon sweep
# - franka/bookshelves, wam/bookshelves: first attempts faulted the chip at
#   chunk 6 (K x B=55 x M past 16G HBM); rerun at the overlay chunk 3
# - wam/lab: epsilon 0.08 probe (0.05 results already current) — its
#   failures are real between-waypoint sweeps, a wider hinge margin pushes
#   paths off the shelves
set -u
cd "$(dirname "$0")/.."

while pgrep -f 'tune_execution|run_tune_queue.sh' >/dev/null 2>&1; do sleep 20; done

run() {
  robot=$1; env=$2; out=$3; shift 3
  echo "=== $(date +%H:%M:%S) $robot/$env $* ===" >&2
  timeout 3600 python tools/tune_execution.py --robot "$robot" --env "$env" \
    --json-out "$out" --seed 0 "$@" 2>&1 | grep -v '^WARNING'
}

run wam industrial TUNE_EXEC_wam_industrial.json --epsilon 0.05 0.08
run franka bookshelves TUNE_EXEC_franka_bookshelves.json --chunk 3
run wam bookshelves TUNE_EXEC_wam_bookshelves.json --chunk 3
run wam lab TUNE_EXEC_wam_lab_eps08.json --epsilon 0.08
echo RETUNE_QUEUE_DONE
# appended while queue idle-waiting: ur10/industrial dense-path dips between
# waypoints (diag: end_err=0, waypoint clearance positive, executor blocks)
# — probe a wider hinge margin
run ur10 industrial TUNE_EXEC_ur10_industrial_eps.json --epsilon 0.12 0.16
echo URDONE
# randomized-time-grid probes on the two worst combos (real between-waypoint
# dips; per-member grids pressure K x |X| distinct times)
run wam bookshelves TUNE_EXEC_wam_bookshelves_rt.json --chunk 3 --set randomize_timesteps=true
run wam lab TUNE_EXEC_wam_lab_rt.json --set randomize_timesteps=true
echo RT_PROBES_DONE
