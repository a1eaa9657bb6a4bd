#!/usr/bin/env python
"""Benchmark driver: batched planner solves/s on one chip + success rate.

Prints ONE JSON line on stdout (progress goes to stderr):
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Workload: the franka industrial problemset (36 start/goal pairs, the
reference's ``benchmarking.py`` configuration) at the full reference
optimizer budget per restart (200 Adam steps, S=20 MC samples, B=1024 RFF
bases, M=10 inducing; ``data/problemsets/franka.py:77-90``), including
posterior extraction and validation. Success is the PHYSICAL execution
metric with the round-4 tapered phantom floor (contact-blocking PD executor
+ endpoint match, ``engine/validator.py execution_success`` — the mechanism
of the reference's PyBullet success, ``utils/robot.py:416-480``).

ONE number carries both success and throughput (VERDICT r3 next #2): the
ADAPTIVE restart engine (``solver.solve_adaptive``) re-attacks only
still-unsolved rows in later rounds, so the reported solves/s is measured on
exactly the program that delivers the reported success rate — no more K=1
throughput quoted next to K=6 success. Two scales are reported:

- the real 36-problem set (dispatch-latency bound), and
- a *saturated* batch (``--batch`` rows replicating the problemset under
  independent PRNG keys) — the headline ``value``.

Failure hardening (VERDICT r2): the real-problemset result is flushed to
``BENCH_PARTIAL.json`` before the saturated phase; that phase runs under a
batch-size fallback ladder (``--batch`` -> /2 -> ...), and any failure
degrades to reporting the real-problemset rate instead of exiting non-zero.

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
    # 128 is the measured chip envelope/saturation knee (SCALING artifacts):
    # 256 adds no throughput, 512 faults the device — and a fault poisons
    # subsequent dispatches in-process, so the ladder cannot recover from an
    # over-ambitious default.
    ap.add_argument("--batch", type=int, default=128,
                    help="replicated rows for the saturated measurement "
                    "(falls back to /2 repeatedly on device failure)")
    ap.add_argument("--min-batch", type=int, default=32)
    ap.add_argument("--adaptive-rounds", type=int, default=2,
                    help="extra restart rounds beyond the configured inits")
    args, _ = ap.parse_known_args()

    from vgpmp_tpu.engine import solver
    from vgpmp_tpu.session import PlanningSession

    sess = PlanningSession("franka", "industrial", dtype=jnp.float32)
    starts, goals = sess.queries()
    Q = len(starts)
    inits = tuple(sess.planner_params.get("q_mu_inits", ["linear", "zeros"]))
    max_rounds = len(inits) + args.adaptive_rounds

    def adaptive(solve, s, g, seed, round_sizes=None):
        t0 = time.time()
        _, reps, info = solver.solve_adaptive(
            sess.model, sess.train_config, s, g, sess.planner_params,
            inits=inits, max_rounds=max_rounds, seed=seed, solve=solve,
            round_sizes=round_sizes,
        )
        dt = time.time() - t0
        ex = float(np.mean(np.asarray(reps.executed)))
        va = float(np.mean(np.asarray(reps.success)))
        return dt, ex, va, info

    # --- phase 1: the real problemset (adaptive restarts) -------------------
    # one program shape (Q,): a tail bucket here would cost a second solver
    # compile for ~2 s of steady saving at the real-set size
    solve_q = solver.make_round_solver(sess.model, sess.train_config)
    t_first, _, _, _ = adaptive(solve_q, starts, goals, seed=0, round_sizes=(Q,))
    log(f"real-set compile+first in {t_first:.1f}s")
    steady_real, success, validator_success, info = adaptive(
        solve_q, starts, goals, seed=1, round_sizes=(Q,)
    )
    log(f"real set: {success:.4f} executed ({validator_success:.4f} validator) "
        f"in {steady_real:.2f}s, k_eff {info['k_eff']:.2f}")

    baseline = reference_baseline()

    def pack(value_bs, steady, succ, val_succ, k_eff, batch):
        return {
            "metric": "batched_planner_solves_per_sec_per_chip",
            "value": round(value_bs, 3),
            "unit": "solves/s",
            "vs_baseline": round(value_bs / baseline["solves_per_sec"], 1),
            "baseline_kind": baseline["kind"],
            "baseline_cpu_count": baseline["cpu_count"],
            "success_rate": round(succ, 4),
            "success_metric": "execution (contact-blocking PD + endpoints, "
                              "tapered phantom floor r=0.5, trilinear "
                              "clearance, undersampling guard)",
            "validator_success_rate": round(val_succ, 4),
            "adaptive": {"inits": list(inits), "max_rounds": max_rounds,
                         "k_eff": round(k_eff, 2)},
            "throughput_batch": batch,
            "steady_batch_seconds": round(steady, 3),
            "real_problemset_seconds": round(steady_real, 3),
            "real_problemset_success": round(success, 4),
            "compile_plus_first_seconds": round(t_first, 1),
            "budget": "200 steps, S=20, B_rff=1024, M=10 per restart, "
                      "franka industrial, tuned schedule, adaptive restarts",
            "note": "throughput and success are the SAME adaptive program "
                    "(solves/s includes all restart rounds)",
        }

    result = pack(Q / steady_real, steady_real, success, validator_success,
                  info["k_eff"], Q)
    with open(os.path.join(os.path.dirname(__file__), "BENCH_PARTIAL.json"), "w") as f:
        json.dump(result, f)

    # --- phase 2: saturated batch (adaptive, replicated problems) -----------
    # ONE round-solver instance across the whole ladder (and shared with
    # phase 1): jax.jit caches per shape inside the wrapper, so a halved-B
    # retry only pays the unavoidable new-shape trace instead of a full
    # recompile (advisor r4 finding).
    B, failures = args.batch, []
    while B >= args.min_batch:
        try:
            idx = np.arange(B) % Q
            sB, gB = starts[idx], goals[idx]
            # restart buckets down to B//8: tail rounds re-attack a handful
            # of rows, and a smaller bucket cuts their cost proportionally
            # (k_eff 2.5 -> ~1.7 measured at B=128); the extra shape is a
            # cheap compile at the bench combo's M=10
            rs = (B, max(16, B // 4), max(16, B // 8))
            t_w, _, _, _ = adaptive(solve_q, sB, gB, seed=2, round_sizes=rs)
            steady, succ_b, val_b, info_b = adaptive(
                solve_q, sB, gB, seed=3, round_sizes=rs
            )
            result = pack(B / steady, steady, succ_b, val_b,
                          info_b["k_eff"], B)
            result["saturated_warm_seconds"] = round(t_w, 1)
            log(f"saturated: B={B} in {steady:.2f}s = {B / steady:.2f} "
                f"solves/s at {succ_b:.4f} executed, k_eff {info_b['k_eff']:.2f}")
            break
        except Exception as e:  # device fault / OOM: degrade, don't die
            log(f"saturated phase failed at B={B}: {type(e).__name__}: {e}")
            failures.append(f"B={B}: {type(e).__name__}")
            B //= 2
    else:
        result["throughput_note"] = (
            "saturated phase unavailable; value is the real-problemset "
            f"adaptive rate (failures: {', '.join(failures)})"
        )

    print(json.dumps(result))


if __name__ == "__main__":
    main()
