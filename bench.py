#!/usr/bin/env python
"""Benchmark driver: batched planner solves/s on one chip + success rate.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Workload: the franka industrial problemset (36 start/goal pairs, the
reference's ``benchmarking.py`` configuration) at the full reference
optimizer budget (200 Adam steps, S=20 MC samples, B=1024 RFF bases, M=10
inducing; ``data/problemsets/franka.py:77-90``), including posterior
extraction and geometric validation, solved with the TUNED schedule
(warmup-cosine LR + linear/zeros restart ensemble — same step/sample budget
per restart; see ``assets/problemsets/franka.json planner_params_tuned``).

Two numbers are reported:
- ``success_rate`` on the real 36-problem set (K=2 restarts);
- throughput at a *saturated* batch: the 36 problems are replicated to
  ``--batch`` rows (each row an independent solve under its own PRNG key) so
  solves/s measures chip throughput, not dispatch latency (VERDICT r1).

Baseline: measured TF re-timing of the reference hot loop on this image's
CPU (``tools/baseline_tf_retime.py`` -> BASELINE_MEASURED.json). Falls back
to the documented 30 s/problem estimate when the file is absent.
"""

import argparse
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

FALLBACK_REFERENCE_SOLVES_PER_SEC = 1.0 / 30.0  # documented estimate (BASELINE.md)


def reference_solves_per_sec() -> tuple[float, str]:
    path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            d = json.load(f)
        v = d.get("reference_solves_per_sec")
        if v:
            return float(v), "measured (tools/baseline_tf_retime.py)"
    return FALLBACK_REFERENCE_SOLVES_PER_SEC, "documented estimate"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024,
                    help="replicated rows for the throughput measurement")
    args, _ = ap.parse_known_args()

    from vgpmp_tpu.engine import solver
    from vgpmp_tpu.session import PlanningSession

    sess = PlanningSession("franka", "industrial", dtype=jnp.float32)
    starts, goals = sess.queries()
    Q = len(starts)
    inits = tuple(sess.planner_params.get("q_mu_inits", ["linear", "zeros"]))
    K = len(inits)

    # --- success on the real problemset (tuned ensemble) -------------------
    sb, gb = jnp.asarray(starts, jnp.float32), jnp.asarray(goals, jnp.float32)
    params_kb = solver.init_ensemble(sess.model, starts, goals, sess.planner_params, inits=inits)
    solve_e = solver.make_ensemble_solver(sess.model, sess.train_config)
    t0 = time.time()
    keys = jax.random.split(jax.random.PRNGKey(0), K * Q).reshape(K, Q, 2)
    best, reps, _ = solve_e(params_kb, sb, gb, keys)
    best.block_until_ready()
    compile_and_first = time.time() - t0
    t0 = time.time()
    keys = jax.random.split(jax.random.PRNGKey(1), K * Q).reshape(K, Q, 2)
    best, reps, _ = solve_e(params_kb, sb, gb, keys)
    best.block_until_ready()
    steady_real = time.time() - t0
    success = float(np.mean(np.asarray(reps.success)))

    # --- throughput at saturation (replicated problems, batch solver) ------
    B = args.batch
    idx = np.arange(B) % Q
    params_b = solver.init_batch(sess.model, starts[idx], goals[idx], sess.planner_params)
    sbig, gbig = jnp.asarray(starts[idx], jnp.float32), jnp.asarray(goals[idx], jnp.float32)
    solve_b = solver.make_batch_solver(sess.model, sess.train_config)
    keys = jax.random.split(jax.random.PRNGKey(2), B)
    _, res = solve_b(params_b, sbig, gbig, keys)
    res.best.block_until_ready()  # compile + first
    t0 = time.time()
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    _, res = solve_b(params_b, sbig, gbig, keys)
    res.best.block_until_ready()
    steady = time.time() - t0
    solves_per_sec = B / steady

    ref_sps, ref_kind = reference_solves_per_sec()
    print(
        json.dumps(
            {
                "metric": "batched_planner_solves_per_sec_per_chip",
                "value": round(solves_per_sec, 3),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_sec / ref_sps, 1),
                "baseline_kind": ref_kind,
                "success_rate": round(success, 4),
                "restarts": K,
                "throughput_batch": B,
                "steady_batch_seconds": round(steady, 3),
                "real_problemset_seconds": round(steady_real, 3),
                "compile_plus_first_seconds": round(compile_and_first, 1),
                "budget": "200 steps, S=20, B_rff=1024, M=10, franka industrial, tuned schedule",
            }
        )
    )


if __name__ == "__main__":
    main()
