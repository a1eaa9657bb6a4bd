#!/usr/bin/env python
"""Benchmark driver — the reference ``benchmarking.py`` equivalent.

Where the reference loops one problem at a time through PyBullet
(``/root/reference/benchmarking.py:73-91``), this driver solves an entire
robot x environment problemset as ONE batched XLA program per run and scores
success with the geometric validator (PyBullet execution optional via
``vgpmp_tpu.sim`` when available).

Usage:
    python benchmarking.py --robot franka --problemset industrial
    python benchmarking.py --all --runs 5
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache")
)

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
) -> dict:
    """Solve one robot x environment problemset ``runs`` times.

    When the (tuned) planner params request multiple q_mu inits
    (``q_mu_inits``), the K-restart ensemble solver runs K x B problems and
    the validator-best restart wins per problem — otherwise the plain batched
    solver is used (the exact reference schedule, ``--parity``).

    Large restart pools are chunked: at most ``max_restarts_per_program``
    restarts run per XLA program (K=15 x B=55 x M=24 in one program needs
    ~27 G HBM, past the 16 G chip), and the per-problem best is merged across
    chunks on the host with the ensemble's own score (success, then worst-case
    clearance).
    """
    from vgpmp_tpu.engine import solver
    from vgpmp_tpu.engine.validator import validate_trajectory
    from vgpmp_tpu.session import PlanningSession

    sess = PlanningSession(
        robot, problemset, dtype=jnp.float32, sdf_mode=sdf_mode, use_tuned=use_tuned
    )
    starts, goals = sess.queries()
    B = len(starts)
    sb, gb = jnp.asarray(starts, jnp.float32), jnp.asarray(goals, jnp.float32)
    inits = tuple(sess.planner_params.get("q_mu_inits", ["linear"]))
    K = len(inits)

    if K > 1:
        C = max_restarts_per_program
        chunks = [inits[i : i + C] for i in range(0, K, C)]
        chunk_params = [
            solver.init_ensemble(sess.model, starts, goals, sess.planner_params, inits=ch)
            for ch in chunks
        ]
        solve = solver.make_ensemble_solver(sess.model, sess.train_config)

        def run_once(run_seed):
            all_keys = jax.random.split(
                jax.random.PRNGKey(run_seed), K * B
            ).reshape(K, B, 2)
            best_score = np.full(B, -np.inf)
            merged = None
            off = 0
            for ch, params0 in zip(chunks, chunk_params):
                kc = len(ch)
                _, reps, _ = solve(params0, sb, gb, all_keys[off : off + kc])
                off += kc
                succ = np.asarray(reps.success)
                clear = np.nan_to_num(np.asarray(reps.min_clearance), nan=-np.inf)
                score = succ.astype(np.float64) * 1e3 + clear
                if merged is None:
                    merged, best_score = reps, score
                else:
                    take = score > best_score
                    merged = jax.tree.map(
                        lambda new, old: np.where(
                            take.reshape((-1,) + (1,) * (np.ndim(old) - 1)),
                            np.asarray(new), np.asarray(old),
                        ),
                        reps, merged,
                    )
                    best_score = np.maximum(score, best_score)
            return merged
    else:
        params0 = solver.init_batch(sess.model, starts, goals, sess.planner_params)
        solve_b = solver.make_batch_solver(sess.model, sess.train_config)
        val = jax.jit(
            jax.vmap(
                lambda t, a, b: validate_trajectory(
                    sess.model.collision, t, a, b,
                    sess.model.limits_low, sess.model.limits_high,
                )
            )
        )

        def run_once(run_seed):
            keys = jax.random.split(jax.random.PRNGKey(run_seed), B)
            _, res = solve_b(params0, sb, gb, keys)
            res.best.block_until_ready()
            return val(res.best, sb, gb)

    per_run = []
    times = []
    failed: list = []
    for r in range(runs):
        t0 = time.time()
        reps = run_once(seed + r)
        times.append(time.time() - t0)
        succ = np.asarray(reps.success)
        per_run.append(int(succ.sum()))
        failed.append(np.nonzero(~succ)[0].tolist())

    steady = min(times[1:]) if len(times) > 1 else times[0]
    avg = float(np.mean(per_run))
    out = {
        "robot": robot,
        "problemset": problemset,
        "problems": B,
        "restarts": K,
        "tuned": use_tuned,
        "budget": {
            k: sess.planner_params[k]
            for k in ("num_steps", "num_samples", "num_inducing", "learning_rate")
        },
        "avg_solved": avg,
        "success_rate": avg / B,
        "per_run_solved": per_run,
        "failed_indices_last_run": failed[-1],
        "compile_plus_first_seconds": round(times[0] - steady, 1),
        "steady_batch_seconds": round(steady, 3),
        "solves_per_sec": round(B / steady, 2),
    }
    print(
        f"{robot}/{problemset}: average solved {avg:.1f} / {B} "
        f"({100 * avg / B:.1f}%), K={K}, batch {out['steady_batch_seconds']}s "
        f"= {out['solves_per_sec']} solves/s, compile {out['compile_plus_first_seconds']}s"
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="franka")
    ap.add_argument("--problemset", default="industrial")
    ap.add_argument("--all", action="store_true", help="run every robot x env combo")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sdf-mode", default="nearest", choices=["nearest", "trilinear", "packed"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json-out", default=None)
    ap.add_argument(
        "--parity", action="store_true",
        help="exact reference hyperparameters (no tuned schedule/restart overlay)",
    )
    args = ap.parse_args()

    combos = ALL_COMBOS if args.all else [(args.robot, args.problemset)]
    results = [
        run_combo(r, p, args.runs, args.sdf_mode, args.seed, use_tuned=not args.parity)
        for r, p in combos
    ]
    total_b = sum(r["problems"] for r in results)
    total_s = sum(r["avg_solved"] for r in results)
    print(f"TOTAL: {total_s:.1f} / {total_b} ({100 * total_s / total_b:.1f}%)")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
