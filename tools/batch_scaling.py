#!/usr/bin/env python
"""Batch-size scaling sweep: find the chip-saturation knee.

VERDICT r1: a 36-problem batch is latency-bound (<1% MFU) — "solves/s/chip"
only means something at saturation. This sweep replicates the real
problemset across the batch axis (each replica gets an independent PRNG key,
i.e. a genuinely distinct solve) and measures steady-state wall-clock per
batch size. Output: SCALING_r04.json + a table on stdout; the knee feeds
bench.py's reported batch size.

Each batch size runs in its OWN subprocess: past the chip's HBM envelope the
dispatch does not fail cleanly — it faults the TPU and poisons every
subsequent dispatch in the process (this voided BENCH_r02) — so fault
isolation is per-size, and a faulted size is recorded as such instead of
killing the sweep.

Run on the TPU:  python tools/batch_scaling.py [--sizes 36 64 128 256 512]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_ENABLE_X64", "1")


def run_one(robot: str, env: str, B: int, reps: int) -> dict:
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    from vgpmp_tpu.engine import solver
    from vgpmp_tpu.session import PlanningSession

    sess = PlanningSession(robot, env, dtype=jnp.float32, use_tuned=True)
    starts0, goals0 = sess.queries()
    Q = len(starts0)
    solve_b = solver.make_batch_solver(sess.model, sess.train_config)

    reps_idx = np.arange(B) % Q
    starts, goals = starts0[reps_idx], goals0[reps_idx]
    params_b = solver.init_batch(sess.model, starts, goals, sess.planner_params)
    sb, gb = jnp.asarray(starts, jnp.float32), jnp.asarray(goals, jnp.float32)

    t0 = time.time()
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, res = solve_b(params_b, sb, gb, keys)
    res.best.block_until_ready()
    compile_first = time.time() - t0

    times = []
    for r in range(reps):
        keys = jax.random.split(jax.random.PRNGKey(r + 1), B)
        t0 = time.time()
        _, res = solve_b(params_b, sb, gb, keys)
        res.best.block_until_ready()
        times.append(time.time() - t0)
    steady = min(times)
    # a silently-faulted device can "complete" dispatches instantly (seen at
    # B=256: 0.000 s steady after a 254 s first run) — or return garbage;
    # sanity-gate on wall-clock and on the outputs actually being finite
    best = np.asarray(res.best)
    if steady < 0.05 or not np.isfinite(best).any():
        return {
            "batch": B, "failed": True,
            "reason": f"implausible steady {steady:.4f}s / non-finite output "
                      "(silent device fault)",
            "compile_plus_first_seconds": round(compile_first, 1),
        }
    return {
        "batch": B,
        "steady_seconds": round(steady, 3),
        "solves_per_sec": round(B / steady, 2),
        "ms_per_problem": round(1e3 * steady / B, 2),
        "compile_plus_first_seconds": round(compile_first, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="franka")
    ap.add_argument("--env", default="industrial")
    ap.add_argument("--sizes", type=int, nargs="*", default=[36, 64, 128, 192, 256, 512])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--one", type=int, default=None,
                    help="internal: run a single batch size and print its JSON row")
    ap.add_argument("--json-out", default=str(ROOT / "SCALING_r04.json"))
    args = ap.parse_args()

    if args.one is not None:
        print("ROW " + json.dumps(run_one(args.robot, args.env, args.one, args.reps)))
        return

    rows = []
    for B in args.sizes:
        proc = subprocess.run(
            [sys.executable, __file__, "--robot", args.robot, "--env", args.env,
             "--one", str(B), "--reps", str(args.reps)],
            capture_output=True, text=True, timeout=3600,
        )
        row = None
        for line in proc.stdout.splitlines():
            if line.startswith("ROW "):
                row = json.loads(line[4:])
        if row is None:
            tail = (proc.stderr or proc.stdout).strip().splitlines()[-1:]
            row = {"batch": B, "failed": True, "rc": proc.returncode,
                   "tail": tail[0][:300] if tail else ""}
            print(f"B={B:5d}: FAILED rc={proc.returncode} ({row['tail'][:120]})")
        elif row.get("failed"):
            print(f"B={B:5d}: FAILED ({row.get('reason', '')[:140]})")
        else:
            print(
                f"B={B:5d}: {row['steady_seconds']:8.3f} s steady -> "
                f"{row['solves_per_sec']:8.2f} solves/s "
                f"({row['ms_per_problem']:6.2f} ms/problem), "
                f"compile+first {row['compile_plus_first_seconds']:.1f} s"
            )
        rows.append(row)
        # incremental flush: a wall-clock cut keeps completed sizes
        Path(args.json_out).write_text(json.dumps(
            {"robot": args.robot, "env": args.env, "partial": True,
             "isolation": "one subprocess per batch size", "rows": rows},
            indent=1))

    import jax  # device name only; sweep itself ran in subprocesses

    out = {
        "robot": args.robot,
        "env": args.env,
        "device": str(jax.devices()[0]),
        "isolation": "one subprocess per batch size (device faults poison the process)",
        "rows": rows,
    }
    Path(args.json_out).write_text(json.dumps(out, indent=1))
    print("wrote", args.json_out)


if __name__ == "__main__":
    main()
