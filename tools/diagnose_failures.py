#!/usr/bin/env python
"""Per-problem failure diagnosis for the execution metric.

For a robot x env combo, runs one adaptive solve (same engine as the
benchmark) and, for every problem that still fails, reports WHERE and WHY
the best surviving trajectory violates the tapered penetration floor:

- worst floor violation depth (how far below the tolerated depth),
- its position along the trajectory (waypoint fraction) and its L_inf
  joint distance to each query endpoint,
- the query endpoints' own phantom depths,
- endpoint error (did the trajectory even reach the goal).

This separates "sub-centimetre graze that the stricter round-4 taper now
blocks" (metric strictness — candidate for more restarts or retuning) from
"multi-centimetre mid-route sweep through an obstacle" (the plan is
genuinely colliding under the reference budget).

Run on the TPU:  python tools/diagnose_failures.py --robot franka --env bookshelves
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
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="franka")
    ap.add_argument("--env", default="bookshelves")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--adaptive-rounds", type=int, default=3)
    ap.add_argument("--taper-radius", type=float, default=0.5)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from vgpmp_tpu.engine import solver
    from vgpmp_tpu.session import PlanningSession

    sess = PlanningSession(args.robot, args.env, dtype=jnp.float32)
    starts, goals = sess.queries()
    inits = tuple(sess.planner_params.get("q_mu_inits", ["linear"]))
    t0 = time.time()
    best, reps, info = solver.solve_adaptive(
        sess.model, sess.train_config, starts, goals, sess.planner_params,
        inits=inits, max_rounds=len(inits) + args.adaptive_rounds,
        seed=args.seed,
    )
    ex = np.asarray(reps.executed)
    print(
        f"{args.robot}/{args.env}: {int(ex.sum())}/{len(ex)} executed "
        f"(k_eff {info['k_eff']:.2f}, {time.time() - t0:.0f}s); diagnosing "
        f"{int((~ex).sum())} failures"
    )

    col = sess.model.collision
    R = args.taper_radius
    slack = 5e-3

    @jax.jit
    def profile(traj, s, g):
        # dense clearance + tapered floor along the trajectory
        from vgpmp_tpu.engine.validator import densify

        dense = densify(traj, 8)                         # [Td, L]
        clear = jnp.min(col.sphere_clearance(dense), axis=-1)  # [Td]
        d_s = jnp.maximum(0.0, -jnp.min(col.sphere_clearance(s)))
        d_g = jnp.maximum(0.0, -jnp.min(col.sphere_clearance(g)))
        dist_s = jnp.max(jnp.abs(dense - s), axis=-1)
        dist_g = jnp.max(jnp.abs(dense - g), axis=-1)
        ramp = lambda d: jnp.maximum(0.0, 1.0 - d / R)
        allowed = jnp.maximum(d_s * ramp(dist_s), d_g * ramp(dist_g))
        floor = -allowed - slack
        viol = floor - clear                             # >0 where blocked
        end_err = jnp.maximum(
            jnp.max(jnp.abs(traj[0] - s)), jnp.max(jnp.abs(traj[-1] - g))
        )
        return viol, clear, dist_s, dist_g, d_s, d_g, end_err

    rows = []
    for i in np.nonzero(~ex)[0]:
        viol, clear, dist_s, dist_g, d_s, d_g, end_err = (
            np.asarray(v) for v in profile(
                jnp.asarray(best[i]), jnp.asarray(starts[i], jnp.float32),
                jnp.asarray(goals[i], jnp.float32),
            )
        )
        j = int(np.argmax(viol))
        row = {
            "problem": int(i),
            "worst_violation_m": round(float(viol[j]), 4),
            "clearance_there_m": round(float(clear[j]), 4),
            "frac_along_traj": round(j / (len(viol) - 1), 3),
            "dist_to_start_rad": round(float(dist_s[j]), 3),
            "dist_to_goal_rad": round(float(dist_g[j]), 3),
            "start_phantom_depth_m": round(float(d_s), 4),
            "goal_phantom_depth_m": round(float(d_g), 4),
            "endpoint_err_rad": round(float(end_err), 4),
            "class": (
                "endpoint-miss" if end_err > 0.05 else
                "graze<1cm" if viol[j] < 0.01 else
                "shallow<3cm" if viol[j] < 0.03 else "deep-sweep"
            ),
        }
        rows.append(row)
        print(json.dumps(row))

    if args.json_out:
        Path(args.json_out).write_text(json.dumps(
            {"robot": args.robot, "env": args.env, "executed": int(ex.sum()),
             "problems": len(ex), "k_eff": info["k_eff"], "failures": rows},
            indent=1,
        ))
        print("wrote", args.json_out)


if __name__ == "__main__":
    main()
