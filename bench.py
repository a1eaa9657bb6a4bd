#!/usr/bin/env python
"""Benchmark driver: batched planner solves/s on one chip + success rate.

Prints ONE JSON line on stdout (progress goes to stderr):
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Workload: the franka industrial problemset (36 start/goal pairs, the
reference's ``benchmarking.py`` configuration) at the full reference
optimizer budget (200 Adam steps, S=20 MC samples, B=1024 RFF bases, M=10
inducing; ``data/problemsets/franka.py:77-90``), including posterior
extraction and validation, solved with the TUNED schedule (warmup-cosine LR
+ restart ensemble at the same per-restart step/sample budget; see
``assets/problemsets/franka.json planner_params_tuned``). Success is the
PHYSICAL execution metric (contact-blocking PD executor + endpoint match,
``engine/validator.py execution_success`` — the mechanism of the
reference's PyBullet success, ``utils/robot.py:416-480``).

Two numbers are reported:
- ``success_rate`` on the real 36-problem set (K-restart ensemble);
- throughput at a *saturated* batch: the 36 problems are replicated to
  ``--batch`` rows (each row an independent solve under its own PRNG key) so
  solves/s measures chip throughput, not dispatch latency (VERDICT r1).

Failure hardening (VERDICT r2): the success-phase result is flushed to
``BENCH_PARTIAL.json`` before the risky saturated-throughput phase; that
phase runs under a batch-size fallback ladder (``--batch`` -> /2 -> /2 ...),
and any throughput-phase failure degrades to reporting the real-problemset
rate instead of exiting non-zero.

Baseline: measured TF re-timing of the reference hot loop on this image's
CPU (``tools/baseline_tf_retime.py`` -> BASELINE_MEASURED.json; note the
2-vCPU caveat recorded there and in BASELINE.md). Falls back to the
documented 30 s/problem estimate when the file is absent.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

FALLBACK_REFERENCE_SOLVES_PER_SEC = 1.0 / 30.0  # documented estimate (BASELINE.md)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def reference_baseline() -> dict:
    path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            d = json.load(f)
        v = d.get("reference_solves_per_sec")
        if v:
            return {
                "solves_per_sec": float(v),
                "kind": "measured (tools/baseline_tf_retime.py)",
                "cpu_count": d.get("cpu_count"),
            }
    return {
        "solves_per_sec": FALLBACK_REFERENCE_SOLVES_PER_SEC,
        "kind": "documented estimate",
        "cpu_count": None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    # 128 is the measured chip envelope/saturation knee (SCALING_r03.json):
    # 36/128/256 run, 256 adds no throughput, 512 faults the device — and a
    # fault poisons subsequent dispatches in-process, so the ladder cannot
    # recover from an over-ambitious default.
    ap.add_argument("--batch", type=int, default=128,
                    help="replicated rows for the throughput measurement "
                    "(falls back to /2 repeatedly on device failure)")
    ap.add_argument("--min-batch", type=int, default=32)
    args, _ = ap.parse_known_args()

    from vgpmp_tpu.engine import solver
    from vgpmp_tpu.session import PlanningSession

    sess = PlanningSession("franka", "industrial", dtype=jnp.float32)
    starts, goals = sess.queries()
    Q = len(starts)
    inits = tuple(sess.planner_params.get("q_mu_inits", ["linear", "zeros"]))
    K = len(inits)

    # --- phase 1: success on the real problemset (tuned ensemble) -----------
    sb, gb = jnp.asarray(starts, jnp.float32), jnp.asarray(goals, jnp.float32)
    params_kb = solver.init_ensemble(sess.model, starts, goals, sess.planner_params, inits=inits)
    solve_e = solver.make_ensemble_solver(sess.model, sess.train_config)
    t0 = time.time()
    keys = jax.random.split(jax.random.PRNGKey(0), K * Q).reshape(K, Q, 2)
    best, reps, _ = solve_e(params_kb, sb, gb, keys)
    best.block_until_ready()
    compile_and_first = time.time() - t0
    log(f"success phase compiled+ran in {compile_and_first:.1f}s")
    t0 = time.time()
    keys = jax.random.split(jax.random.PRNGKey(1), K * Q).reshape(K, Q, 2)
    best, reps, _ = solve_e(params_kb, sb, gb, keys)
    best.block_until_ready()
    steady_real = time.time() - t0
    success = float(np.mean(np.asarray(reps.executed)))
    validator_success = float(np.mean(np.asarray(reps.success)))

    baseline = reference_baseline()
    result = {
        "metric": "batched_planner_solves_per_sec_per_chip",
        "value": round(Q / steady_real, 3),
        "unit": "solves/s",
        "vs_baseline": round((Q / steady_real) / baseline["solves_per_sec"], 1),
        "baseline_kind": baseline["kind"],
        "baseline_cpu_count": baseline["cpu_count"],
        "success_rate": round(success, 4),
        "success_metric": "execution (contact-blocking PD + endpoints)",
        "validator_success_rate": round(validator_success, 4),
        "restarts": K,
        "throughput_batch": Q,
        "real_problemset_seconds": round(steady_real, 3),
        "compile_plus_first_seconds": round(compile_and_first, 1),
        "budget": "200 steps, S=20, B_rff=1024, M=10, franka industrial, tuned schedule",
    }
    # flush the success-phase result before the risky saturated phase
    with open(os.path.join(os.path.dirname(__file__), "BENCH_PARTIAL.json"), "w") as f:
        json.dump(result, f)
    log(f"success phase: {success:.4f} executed ({validator_success:.4f} validator), "
        f"{Q} problems in {steady_real:.2f}s")

    # --- phase 2: throughput at saturation (replicated problems) ------------
    B, failures = args.batch, []
    while B >= args.min_batch:
        try:
            idx = np.arange(B) % Q
            params_b = solver.init_batch(sess.model, starts[idx], goals[idx], sess.planner_params)
            sbig = jnp.asarray(starts[idx], jnp.float32)
            gbig = jnp.asarray(goals[idx], jnp.float32)
            solve_b = solver.make_batch_solver(sess.model, sess.train_config)
            keys = jax.random.split(jax.random.PRNGKey(2), B)
            _, res = solve_b(params_b, sbig, gbig, keys)
            res.best.block_until_ready()  # compile + first
            t0 = time.time()
            keys = jax.random.split(jax.random.PRNGKey(3), B)
            _, res = solve_b(params_b, sbig, gbig, keys)
            res.best.block_until_ready()
            steady = time.time() - t0
            result.update(
                value=round(B / steady, 3),
                vs_baseline=round((B / steady) / baseline["solves_per_sec"], 1),
                throughput_batch=B,
                steady_batch_seconds=round(steady, 3),
            )
            log(f"throughput phase: B={B} in {steady:.2f}s = {B / steady:.2f} solves/s")
            break
        except Exception as e:  # device fault / OOM: degrade, don't die
            log(f"throughput phase failed at B={B}: {type(e).__name__}: {e}")
            failures.append(f"B={B}: {type(e).__name__}")
            B //= 2
    else:
        result["throughput_note"] = (
            "saturated phase unavailable; value is the real-problemset "
            f"ensemble rate (failures: {', '.join(failures)})"
        )

    print(json.dumps(result))


if __name__ == "__main__":
    main()
