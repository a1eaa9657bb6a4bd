#!/usr/bin/env python
"""Tune overlays against the PHYSICAL execution metric.

Round 3 made ``execution_success`` (contact-blocking PD executor + endpoint
match — the mechanism of the reference's PyBullet metric,
``utils/robot.py:416-480``) the benchmark's headline success. The round-2
overlays were tuned against the *geometric validator*, which calibration
showed is optimistic (validator-only accepts); under the executor they score
lower (franka/industrial: 0.92 validator vs 0.64 executed).

This tool measures, per combo and per candidate (epsilon, sigma_anneal)
setting, the executed success of every restart init individually and of the
union, using one K-member ensemble run with ``keep_member_reports`` — so the
best small init subset can be chosen host-side without re-running. It also
prints per-problem diagnostics for problems no restart solves (endpoint
clearance, best member's stuck waypoint) to separate "needs more restarts"
from "needs a different objective".

Run on the TPU:
    python tools/tune_execution.py --robot franka --env industrial \
        --epsilon 0.05 0.08 --sigma-anneal 1 10
"""

from __future__ import annotations

import argparse
import itertools
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

DEFAULT_INITS = [
    "linear", "zeros", "waypoint",
    "rand0", "rand1", "rand2",
    "frand0", "frand1", "frand2", "frand3", "frand4", "frand5",
]


def greedy_subsets(executed_kb: np.ndarray, inits: list) -> list:
    """Greedy forward selection of inits by marginal union-executed gain."""
    K, B = executed_kb.shape
    chosen, covered, out = [], np.zeros(B, bool), []
    for _ in range(K):
        gains = [
            (np.sum(covered | executed_kb[k]), k)
            for k in range(K) if k not in chosen
        ]
        best_gain, k = max(gains)
        if best_gain == covered.sum() and chosen:
            break
        chosen.append(k)
        covered |= executed_kb[k]
        out.append((inits[k], int(covered.sum())))
    return out


def run_config(robot, env, inits, overrides, seed, chunk=1):
    from vgpmp_tpu.engine import solver
    from vgpmp_tpu.session import PlanningSession

    sess = PlanningSession(robot, env, dtype=jnp.float32, use_tuned=True,
                           overrides=overrides)
    starts, goals = sess.queries()
    B = len(starts)
    sb, gb = jnp.asarray(starts, jnp.float32), jnp.asarray(goals, jnp.float32)
    solve = solver.make_ensemble_solver(sess.model, sess.train_config,
                                        keep_member_reports=True)
    executed, stuck_clear = [], []
    t0 = time.time()
    for off in range(0, len(inits), chunk):
        ch = tuple(inits[off : off + chunk])
        params = solver.init_ensemble(sess.model, starts, goals,
                                      sess.planner_params, inits=ch)
        keys = jax.random.split(
            jax.random.PRNGKey(seed * 1000 + off), len(ch) * B
        ).reshape(len(ch), B, 2)
        _, _, _, reps_kb = solve(params, sb, gb, keys)
        executed.append(np.asarray(reps_kb.executed))
        stuck_clear.append(np.asarray(reps_kb.min_clearance))
    executed = np.concatenate(executed, 0)  # [K, B]
    mc = np.concatenate(stuck_clear, 0)
    elapsed = time.time() - t0

    # endpoint clearances for diagnostics
    col = sess.model.collision
    end_clear = np.asarray(
        jax.jit(jax.vmap(lambda a, b: jnp.minimum(
            jnp.min(col.sphere_clearance(a)), jnp.min(col.sphere_clearance(b))
        )))(sb, gb)
    )
    return sess, executed, mc, end_clear, elapsed


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="franka")
    ap.add_argument("--env", default="industrial")
    ap.add_argument("--epsilon", type=float, nargs="*", default=[None],
                    help="hinge epsilon candidates (default: problemset value)")
    ap.add_argument("--sigma-anneal", type=float, nargs="*", default=[None])
    ap.add_argument("--inits", nargs="*", default=DEFAULT_INITS)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--set", dest="sets", nargs="*", default=[],
                    metavar="KEY=JSONVAL",
                    help="extra planner-param overrides applied to every "
                    "candidate, e.g. --set randomize_timesteps=true")
    ap.add_argument("--chunk", type=int, default=1,
                    help="restarts per XLA program; 1 (default) reuses ONE "
                    "compiled [1,B] program for every init — the [K,B] "
                    "ensemble shape costs K x the trace with no runtime win")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    base_overrides = {}
    for kv in args.sets:
        k, _, v = kv.partition("=")
        base_overrides[k] = json.loads(v)

    results = []
    for eps, sa in itertools.product(args.epsilon, args.sigma_anneal):
        overrides = dict(base_overrides)
        if eps is not None:
            overrides["epsilon"] = eps
        if sa is not None:
            overrides["sigma_anneal"] = sa
        sess, executed, mc, end_clear, elapsed = run_config(
            args.robot, args.env, args.inits, overrides, args.seed,
            chunk=args.chunk,
        )
        union = executed.any(0)
        per_init = {name: round(float(executed[k].mean()), 4)
                    for k, name in enumerate(args.inits)}
        subset = greedy_subsets(executed, args.inits)
        row = {
            "overrides": overrides,
            "union_executed": round(float(union.mean()), 4),
            "per_init_executed": per_init,
            "greedy_subset": subset,
            "unsolved": np.nonzero(~union)[0].tolist(),
            "seconds": round(elapsed, 1),
        }
        print(json.dumps(row), flush=True)
        for b in np.nonzero(~union)[0]:
            print(
                f"  problem {b}: end_clear {end_clear[b]:+.4f}, best member "
                f"min_clear {mc[:, b].max():+.4f}", flush=True,
            )
        results.append(row)

    results.sort(key=lambda r: -r["union_executed"])
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(results, indent=1))
    print("BEST:", json.dumps(results[0]))


if __name__ == "__main__":
    main()
