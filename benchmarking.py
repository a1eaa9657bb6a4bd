#!/usr/bin/env python
"""Benchmark driver — the reference ``benchmarking.py`` equivalent.

Where the reference loops one problem at a time through PyBullet
(``/root/reference/benchmarking.py:73-91``), this driver solves an entire
robot x environment problemset as ONE batched XLA program per run and scores
success with the PHYSICAL execution metric: a contact-blocking PD executor
must traverse every waypoint and the endpoints must match the query
(``engine.validator.execution_success`` — the mechanism of the reference's
PyBullet metric, ``utils/robot.py:416-480``). The geometric validator's
verdict is reported alongside as a calibration statistic.

Usage:
    python benchmarking.py --robot franka --problemset industrial
    python benchmarking.py --all --runs 5 --json-out RESULTS.json
    python benchmarking.py --all --runs 5 --parity   # exact reference params
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache")
)
# honor JAX_PLATFORMS even under self-registering platform plugins (the axon
# TPU plugin re-registers over the env var; same workaround as
# parallel/multihost.py) — lets a parity run execute on CPU while the TPU is
# busy, without grabbing (and crashing) the chip
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

ALL_COMBOS = [
    ("franka", "industrial"),
    ("franka", "bookshelves"),
    ("kuka", "industrial"),
    ("kuka", "bookshelves"),
    ("wam", "industrial"),
    ("wam", "bookshelves"),
    ("wam", "lab"),
    ("ur10", "industrial"),
    ("ur10", "bookshelves"),
]


def run_combo(
    robot: str,
    problemset: str,
    runs: int,
    sdf_mode: str,
    seed: int,
    use_tuned: bool = True,
    max_restarts_per_program: int = 6,
    adaptive_rounds: int = 0,
) -> dict:
    """Solve one robot x environment problemset ``runs`` times.

    When the (tuned) planner params request multiple q_mu inits
    (``q_mu_inits``) or ``adaptive_rounds > 0``, the ADAPTIVE restart engine
    runs (``solver.solve_adaptive``): one ``[B]``-shaped XLA program, round 0
    from the first init, then rounds whose B slots are packed with restarts
    for still-unsolved problems only (remaining inits, then fresh
    free-space-biased via-points), stopping as soon as every problem
    executes. Restart compute concentrates where it pays — measured K_eff is
    ~1.5-3 instead of the round-3 fixed K=6 — and only one program is ever
    compiled. Otherwise the plain batched solver runs the exact reference
    schedule (``--parity``, which also pins the reference's jitter=1e-6).
    """
    from vgpmp_tpu.engine import solver
    from vgpmp_tpu.engine.validator import execute_and_validate
    from vgpmp_tpu.session import PlanningSession

    overrides = {} if use_tuned else {"jitter": 1e-6}
    sess = PlanningSession(
        robot, problemset, dtype=jnp.float32, sdf_mode=sdf_mode,
        use_tuned=use_tuned, overrides=overrides,
    )
    starts, goals = sess.queries()
    B = len(starts)
    sb, gb = jnp.asarray(starts, jnp.float32), jnp.asarray(goals, jnp.float32)
    inits = tuple(sess.planner_params.get("q_mu_inits", ["linear"]))
    K = len(inits)
    adaptive_used = []
    k_effs = []

    if K > 1 or adaptive_rounds > 0:
        solve = solver.make_round_solver(sess.model, sess.train_config)
        # round budget: the configured init list plus the requested adaptive
        # headroom — each round costs one [B] program execution, the same
        # unit the round-3 fixed ensemble spent per init
        max_rounds = K + adaptive_rounds

        def run_once(run_seed):
            _, reps, info = solver.solve_adaptive(
                sess.model, sess.train_config, starts, goals,
                sess.planner_params, inits=inits, max_rounds=max_rounds,
                seed=run_seed, solve=solve,
                # ONE program shape per combo: a B//4 tail bucket would cost
                # a second full solver compile (~150 s at today's remote-
                # compile service) to save a few seconds of tail-round
                # steady time — the matrix pins the full-B shape and lets
                # slot-packing spend the spare slots on extra restarts
                round_sizes=(B,),
            )
            adaptive_used.append(info["rounds"] - 1)
            k_effs.append(info["k_eff"])
            return reps
    else:
        params0 = solver.init_batch(sess.model, starts, goals, sess.planner_params)
        solve_b = solver.make_batch_solver(sess.model, sess.train_config)
        # the model rides through jit as an argument, not a closure constant
        # (round-5 grids exceed the remote-compile request limit as consts)
        val_jit = jax.jit(
            jax.vmap(
                lambda m, t, a, b: execute_and_validate(
                    m.collision, t, a, b, m.limits_low, m.limits_high
                ),
                in_axes=(None, 0, 0, 0),
            )
        )
        val = lambda t, a, b: val_jit(sess.model, t, a, b)

        def run_once(run_seed):
            keys = jax.random.split(jax.random.PRNGKey(run_seed), B)
            _, res = solve_b(params0, sb, gb, keys)
            res.best.block_until_ready()
            return val(res.best, sb, gb)

    per_run = []
    per_run_validator = []
    times = []
    failed: list = []
    for r in range(runs):
        t0 = time.time()
        reps = run_once(seed + r)
        ex = np.asarray(reps.executed)
        times.append(time.time() - t0)
        per_run.append(int(ex.sum()))
        per_run_validator.append(int(np.asarray(reps.success).sum()))
        failed.append(np.nonzero(~ex)[0].tolist())

    steady = min(times[1:]) if len(times) > 1 else times[0]
    avg = float(np.mean(per_run))
    try:  # artifact provenance: the engine commit that produced the numbers
        import subprocess

        commit = subprocess.run(
            ["git", "-C", os.path.dirname(os.path.abspath(__file__)), "rev-parse",
             "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:
        commit = None
    out = {
        "robot": robot,
        "problemset": problemset,
        "engine_commit": commit,
        "device": str(jax.devices()[0]),
        "problems": B,
        "restarts": K,
        "adaptive_rounds_used": adaptive_used or None,
        "tuned": use_tuned,
        "budget": {
            k: sess.planner_params[k]
            for k in ("num_steps", "num_samples", "num_inducing", "learning_rate")
        },
        "metric": "execution_success (contact-blocking PD executor + "
                  "endpoints, tapered phantom floor r=0.5, trilinear "
                  "clearance, undersampling guard)",
        "k_eff": round(float(np.mean(k_effs)), 2) if k_effs else 1.0,
        "avg_solved": avg,
        "success_rate": avg / B,
        "per_run_solved": per_run,
        "per_run_validator_solved": per_run_validator,
        "failed_indices_last_run": failed[-1],
        "compile_plus_first_seconds": round(times[0] - steady, 1),
        "steady_batch_seconds": round(steady, 3),
        "solves_per_sec": round(B / steady, 2),
    }
    print(
        f"{robot}/{problemset}: average solved {avg:.1f} / {B} "
        f"({100 * avg / B:.1f}%), K={K}, batch {out['steady_batch_seconds']}s "
        f"= {out['solves_per_sec']} solves/s, compile {out['compile_plus_first_seconds']}s"
        + (f", adaptive rounds {adaptive_used}" if any(adaptive_used) else "")
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="franka")
    ap.add_argument("--problemset", default="industrial")
    ap.add_argument("--all", action="store_true", help="run every robot x env combo")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument(
        "--sdf-mode", default=None, choices=["nearest", "trilinear", "packed"],
        help="default: 'packed' (bf16 fused-gather nearest semantics, the "
        "production path) for tuned runs, 'nearest' (exact f32 reference "
        "semantics) under --parity",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json-out", default=None)
    ap.add_argument(
        "--adaptive-rounds", type=int, default=0,
        help="extra restart chunks spent only while problems remain unsolved",
    )
    ap.add_argument(
        "--parity", action="store_true",
        help="exact reference hyperparameters (no tuned schedule/restart "
        "overlay; jitter pinned to the reference's 1e-6)",
    )
    args = ap.parse_args()

    sdf_mode = args.sdf_mode or ("nearest" if args.parity else "packed")
    combos = ALL_COMBOS if args.all else [(args.robot, args.problemset)]
    results = []
    for r, p in combos:
        # one retry after a cool-down: the axon TPU throws transient
        # FAILED_PRECONDITION when a previous process is still releasing the
        # chip (observed when a queue launches this driver right after
        # bench.py exits) — distinct from a genuine in-process poisoning,
        # which the retry also cannot make worse.
        for attempt in range(2):
            try:
                results.append(
                    run_combo(
                        r, p, args.runs, sdf_mode, args.seed,
                        use_tuned=not args.parity,
                        adaptive_rounds=0 if args.parity else args.adaptive_rounds,
                    )
                )
                break
            except Exception as e:  # device fault: record, keep going (a
                # poisoned process fails the rest fast; completed combos
                # must survive)
                print(f"{r}/{p} FAILED (attempt {attempt}): "
                      f"{type(e).__name__}: {e}", file=sys.stderr)
                if attempt == 0 and "FAILED_PRECONDITION" in str(e):
                    time.sleep(45)
                    continue
                results.append({"robot": r, "problemset": p,
                                "error": f"{type(e).__name__}: {e}"})
                break
        if args.json_out:  # flush incrementally — a late crash keeps earlier combos
            with open(args.json_out, "w") as f:
                json.dump(results, f, indent=1)
    ok = [r for r in results if "error" not in r]
    total_b = sum(r["problems"] for r in ok)
    total_s = sum(r["avg_solved"] for r in ok)
    if total_b:
        print(f"TOTAL: {total_s:.1f} / {total_b} ({100 * total_s / total_b:.1f}%)")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
