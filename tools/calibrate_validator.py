#!/usr/bin/env python
"""Calibrate the geometric validator against the physical-execution metric.

The benchmark's headline success number comes from ``engine.validator``
(endpoint-relative clearance margin). The reference's metric is physical:
a PD controller either traverses the trajectory or is stopped by an obstacle
(``utils/robot.py:416-480``). pybullet is not installable in this image, so
the physical side here is ``sim.kinematic_execute_trajectory`` — a
contact-blocking PD model reproducing that mechanism (velocity-capped
tracking that can never deepen penetration).

Protocol: solve every problem of the given combos twice (tuned schedule and
a deliberately under-budgeted run to produce colliding trajectories), score
each trajectory with BOTH metrics, and report the confusion matrix +
agreement. Target: >= 95% agreement (VERDICT r1 item 3).

Run on the TPU:  python tools/calibrate_validator.py [--combos franka:industrial ...]
Writes CALIBRATION.json at the repo root.
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

DEFAULT_COMBOS = ["franka:industrial", "franka:bookshelves", "kuka:industrial"]


def gather_trajectories(robot: str, env: str, seed: int):
    """Solve the problemset at full tuned budget AND at a starved budget
    (1/8 steps, constant lr) so the pool contains real failures too."""
    from vgpmp_tpu.engine import solver
    from vgpmp_tpu.session import PlanningSession

    out = []
    for tag, use_tuned, shrink in (("tuned", True, 1), ("starved", False, 8)):
        sess = PlanningSession(robot, env, dtype=jnp.float32, use_tuned=use_tuned)
        cfg = sess.train_config
        if shrink > 1:
            cfg = cfg.replace(num_steps=max(cfg.num_steps // shrink, 5))
        starts, goals = sess.queries()
        B = len(starts)
        sb, gb = jnp.asarray(starts, jnp.float32), jnp.asarray(goals, jnp.float32)
        params_b = solver.init_batch(sess.model, starts, goals, sess.planner_params)
        solve_b = solver.make_batch_solver(sess.model, cfg)
        keys = jax.random.split(jax.random.PRNGKey(seed), B)
        _, res = solve_b(params_b, sb, gb, keys)
        res.best.block_until_ready()
        out.append((tag, sess, np.asarray(res.best), starts, goals))
        print(f"{robot}/{env} [{tag}]: {B} trajectories solved")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--combos", nargs="*", default=DEFAULT_COMBOS)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from vgpmp_tpu.engine.validator import validate_trajectory
    from vgpmp_tpu.sim import kinematic_execute_trajectory

    rows = []
    for combo in args.combos:
        robot, env = combo.split(":")
        for tag, sess, best, starts, goals in gather_trajectories(robot, env, args.seed):
            model = sess.model
            val = jax.jit(
                jax.vmap(
                    lambda t, a, b: validate_trajectory(
                        model.collision, t, a, b, model.limits_low, model.limits_high
                    ).success
                )
            )
            exe = jax.jit(
                jax.vmap(
                    lambda t: kinematic_execute_trajectory(model.collision, t)[0]
                )
            )
            sb = jnp.asarray(starts, jnp.float32)
            gb = jnp.asarray(goals, jnp.float32)
            t0 = time.time()
            v = np.asarray(val(jnp.asarray(best), sb, gb))
            # physical reachability also requires the endpoints to be the
            # query (the controller starts at the query start); prepend/append
            bt = jnp.asarray(best)
            e = np.asarray(exe(bt))
            # endpoint condition (executor only checks waypoint reachability)
            end_ok = (
                np.abs(best[:, 0] - starts).max(-1) <= 0.05
            ) & (np.abs(best[:, -1] - goals).max(-1) <= 0.05)
            e = e & end_ok
            dt = time.time() - t0
            for vi, ei in zip(v.tolist(), e.tolist()):
                rows.append({"combo": combo, "pool": tag, "validator": vi, "executor": ei})
            print(f"{combo} [{tag}]: validator {v.mean():.3f} executor {e.mean():.3f} ({dt:.1f}s)")

    v = np.array([r["validator"] for r in rows])
    e = np.array([r["executor"] for r in rows])
    cm = {
        "both_success": int(np.sum(v & e)),
        "both_fail": int(np.sum(~v & ~e)),
        "validator_only": int(np.sum(v & ~e)),  # optimistic validator
        "executor_only": int(np.sum(~v & e)),   # pessimistic validator
    }
    agreement = (cm["both_success"] + cm["both_fail"]) / len(rows)
    out = {
        "n_trajectories": len(rows),
        "confusion": cm,
        "agreement": round(float(agreement), 4),
        "combos": args.combos,
        "note": "executor = sim.kinematic_execute_trajectory (contact-blocking "
        "PD; pybullet not installable in this image)",
    }
    (ROOT / "CALIBRATION.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
