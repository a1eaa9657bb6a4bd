#!/bin/bash
# CPU-side evidence queue: waits for the parity matrix, then runs validator
# calibration — both forced onto the CPU platform so the chip stays free.
set -u
cd "$(dirname "$0")/.."

while pgrep -f 'benchmarking.py --all --runs 3 --parity' >/dev/null 2>&1; do sleep 30; done

echo "=== $(date +%H:%M:%S) calibrate_validator (cpu) ===" >&2
JAX_PLATFORMS=cpu nice -n 10 timeout 10800 python tools/calibrate_validator.py 2>&1 \
  | grep -v '^WARNING' | tail -50
echo CPU_QUEUE_DONE
