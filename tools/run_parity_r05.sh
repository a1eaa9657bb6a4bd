#!/bin/bash
# Round-5 parity matrix: exact reference hyperparameters, 5 runs (the
# reference protocol, /root/reference/benchmarking.py:70), on CPU so the
# TPU queue is untouched. One driver invocation per combo with incremental
# merge, so a wall-clock cut keeps every completed combo at full 5-run
# provenance.
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu

python - <<'EOF'
import json, subprocess, sys
from pathlib import Path

COMBOS = [
    ("franka", "industrial"), ("franka", "bookshelves"),
    ("kuka", "industrial"), ("kuka", "bookshelves"),
    ("wam", "industrial"), ("wam", "bookshelves"), ("wam", "lab"),
    ("ur10", "industrial"), ("ur10", "bookshelves"),
]
out_path = Path("RESULTS_r05_parity.json")
rows = []
if out_path.exists():
    rows = [r for r in json.loads(out_path.read_text()) if "error" not in r]
done = {(r["robot"], r["problemset"]) for r in rows}
for robot, env in COMBOS:
    if (robot, env) in done:
        print(f"{robot}/{env}: kept", flush=True)
        continue
    tmp = Path(f"/tmp/parity_{robot}_{env}.json")
    proc = subprocess.run(
        [sys.executable, "benchmarking.py", "--robot", robot,
         "--problemset", env, "--parity", "--runs", "5",
         "--json-out", str(tmp)],
        timeout=3600,
    )
    try:
        rows.extend(json.loads(tmp.read_text()))
    except Exception as e:
        rows.append({"robot": robot, "problemset": env,
                     "error": f"driver rc={proc.returncode}: {e}"})
    out_path.write_text(json.dumps(rows, indent=1))
    print(f"{robot}/{env}: flushed ({len(rows)} rows)", flush=True)
print("PARITY_DONE", flush=True)
EOF
