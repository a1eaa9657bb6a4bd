#!/usr/bin/env python
"""Batch-size scaling sweep: find the chip-saturation knee.

VERDICT r1: a 36-problem batch is latency-bound (<1% MFU) — "solves/s/chip"
only means something at saturation. This sweep replicates the real
problemset across the batch axis (each replica gets an independent PRNG key,
i.e. a genuinely distinct solve) and measures steady-state wall-clock per
batch size. Output: SCALING_r03.json + a table on stdout; the knee feeds
bench.py's reported batch size.

Run on the TPU:  python tools/batch_scaling.py [--sizes 36 128 512 1024 2048]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))

import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="franka")
    ap.add_argument("--env", default="industrial")
    ap.add_argument("--sizes", type=int, nargs="*", default=[36, 128, 512, 1024, 2048])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tuned", action="store_true", default=True)
    ap.add_argument("--json-out", default=str(ROOT / "SCALING_r03.json"))
    args = ap.parse_args()

    from vgpmp_tpu.engine import solver
    from vgpmp_tpu.session import PlanningSession

    sess = PlanningSession(args.robot, args.env, dtype=jnp.float32, use_tuned=args.tuned)
    starts0, goals0 = sess.queries()
    Q = len(starts0)
    solve_b = solver.make_batch_solver(sess.model, sess.train_config)

    rows = []
    for B in args.sizes:
        reps_idx = np.arange(B) % Q
        starts = starts0[reps_idx]
        goals = goals0[reps_idx]
        params_b = solver.init_batch(sess.model, starts, goals, sess.planner_params)
        sb, gb = jnp.asarray(starts, jnp.float32), jnp.asarray(goals, jnp.float32)

        t0 = time.time()
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        _, res = solve_b(params_b, sb, gb, keys)
        res.best.block_until_ready()
        compile_first = time.time() - t0

        times = []
        for r in range(args.reps):
            keys = jax.random.split(jax.random.PRNGKey(r + 1), B)
            t0 = time.time()
            _, res = solve_b(params_b, sb, gb, keys)
            res.best.block_until_ready()
            times.append(time.time() - t0)
        steady = min(times)
        rows.append(
            {
                "batch": B,
                "steady_seconds": round(steady, 3),
                "solves_per_sec": round(B / steady, 2),
                "ms_per_problem": round(1e3 * steady / B, 2),
                "compile_plus_first_seconds": round(compile_first, 1),
            }
        )
        print(
            f"B={B:5d}: {steady:8.3f} s steady -> {B / steady:8.2f} solves/s "
            f"({1e3 * steady / B:6.2f} ms/problem), compile+first {compile_first:.1f} s"
        )

    out = {
        "robot": args.robot,
        "env": args.env,
        "budget": {
            k: sess.planner_params[k]
            for k in ("num_steps", "num_samples", "num_inducing")
        },
        "device": str(jax.devices()[0]),
        "rows": rows,
    }
    Path(args.json_out).write_text(json.dumps(out, indent=1))
    print("wrote", args.json_out)


if __name__ == "__main__":
    main()
