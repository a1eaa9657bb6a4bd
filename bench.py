#!/usr/bin/env python
"""Benchmark driver: batched planner solves/s on one chip + success rate.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Workload: the franka industrial problemset (36 start/goal pairs, the
reference's ``benchmarking.py`` configuration) solved as ONE batched XLA
program at the full reference optimizer budget (200 Adam steps, S=20 MC
samples, B=1024 RFF bases, M=10 inducing; ``data/problemsets/franka.py:77-90``),
including posterior extraction (150 samples) and geometric validation.

Baseline: the TF reference neither times itself nor can run here (no
TF/GPflow in this image), so ``vs_baseline`` is computed against a documented
estimate of the reference's per-problem wall-clock: 30 s/problem
(0.033 solves/s) for 200 eager-loop steps of S=20 x N=50 FK+SDF rollouts on
CPU — deliberately generous to the reference; see BASELINE.md.
"""

import json
import os
import time

os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

REFERENCE_SOLVES_PER_SEC = 1.0 / 30.0  # documented estimate, see module docstring


def main() -> None:
    from vgpmp_tpu.engine import solver
    from vgpmp_tpu.engine.validator import validate_trajectory
    from vgpmp_tpu.session import PlanningSession

    sess = PlanningSession("franka", "industrial", dtype=jnp.float32)
    starts, goals = sess.queries()
    B = len(starts)
    sb = jnp.asarray(starts, jnp.float32)
    gb = jnp.asarray(goals, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    params_b = solver.init_batch(sess.model, starts, goals, sess.planner_params)

    solve_b = solver.make_batch_solver(sess.model, sess.train_config)
    val = jax.jit(
        jax.vmap(
            lambda t, a, b: validate_trajectory(
                sess.model.collision, t, a, b,
                sess.model.limits_low, sess.model.limits_high,
            )
        )
    )

    t0 = time.time()
    _, res = solve_b(params_b, sb, gb, keys)
    res.best.block_until_ready()
    compile_and_first = time.time() - t0

    t0 = time.time()
    _, res = solve_b(params_b, sb, gb, keys)
    res.best.block_until_ready()
    steady = time.time() - t0

    reps = val(res.best, sb, gb)
    success = float(np.mean(np.asarray(reps.success)))
    solves_per_sec = B / steady

    print(
        json.dumps(
            {
                "metric": "batched_planner_solves_per_sec_per_chip",
                "value": round(solves_per_sec, 3),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_sec / REFERENCE_SOLVES_PER_SEC, 1),
                "success_rate": round(success, 4),
                "batch_size": B,
                "steady_batch_seconds": round(steady, 3),
                "compile_plus_first_seconds": round(compile_and_first, 1),
                "budget": "200 steps, S=20, B_rff=1024, M=10, franka industrial",
            }
        )
    )


if __name__ == "__main__":
    main()
