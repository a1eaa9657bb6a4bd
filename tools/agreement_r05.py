#!/usr/bin/env python
"""Per-trajectory executor/validator agreement under the round-5 metric.

Round 5 moved the validator onto the executor's exact PD path (one fused
clearance pass, trilinear interpolation): residual disagreement now comes
only from the executor's reach-budget/sampling guard and the validator's
joint-limit check, so the target is >=0.90 per combo / >=0.95 aggregate
(VERDICT r4 weak #6: ur10/industrial was 0.639 under straight-line
densification).

The round-3 CALIBRATION.json fitted the geometric validator's knobs against
the round-3 (global-floor) executor. Round 4 tapered the phantom floor in
BOTH metrics, so their agreement must be re-measured. This tool runs one
adaptive solve per combo (the same engine and programs as the benchmark —
compile-cache hits after a matrix run) and scores, per selected trajectory,
whether the geometric validator's verdict matches the executor's.

Output: CALIBRATION_r05.json {combo: {n, agree, executor_only,
validator_only}, total_agreement}.

Run on the TPU:  python tools/agreement_r04.py
"""

from __future__ import annotations

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

COMBOS = [
    ("franka", "industrial"), ("franka", "bookshelves"),
    ("kuka", "industrial"), ("kuka", "bookshelves"),
    ("wam", "industrial"), ("wam", "bookshelves"), ("wam", "lab"),
    ("ur10", "industrial"), ("ur10", "bookshelves"),
]


def main() -> None:
    from vgpmp_tpu.engine import solver
    from vgpmp_tpu.session import PlanningSession

    out, tot_n = {}, 0
    tot_agree = tot_eo = tot_vo = 0
    prev = {}
    pf = ROOT / "CALIBRATION_r05.json"
    if pf.exists() and "--fresh" not in sys.argv:
        prev = json.loads(pf.read_text()).get("combos", {})
    for robot, env in COMBOS:
        if f"{robot}/{env}" in prev and "error" not in prev[f"{robot}/{env}"]:
            row = prev[f"{robot}/{env}"]
            out[f"{robot}/{env}"] = row
            tot_n += row["n"]; tot_agree += row["agree"]
            tot_eo += row["executor_only"]; tot_vo += row["validator_only"]
            print(f"{robot}/{env}: (kept) {row}", flush=True)
            continue
        t0 = time.time()
        try:
            sess = PlanningSession(robot, env, dtype=jnp.float32)
            starts, goals = sess.queries()
            inits = tuple(sess.planner_params.get("q_mu_inits", ["linear"]))
            _, reps, info = solver.solve_adaptive(
                sess.model, sess.train_config, starts, goals,
                sess.planner_params, inits=inits,
                max_rounds=len(inits) + 3, seed=11,
                # pin the matrix's full-B round-program shape: tail-round
                # buckets would each cost a fresh multi-minute compile here
                round_sizes=(len(starts),),
            )
            ex = np.asarray(reps.executed)
            va = np.asarray(reps.success)
            row = {
                "n": int(len(ex)),
                "agree": int((ex == va).sum()),
                "executor_only": int((ex & ~va).sum()),
                "validator_only": int((va & ~ex).sum()),
                "executed_rate": round(float(ex.mean()), 4),
                "seconds": round(time.time() - t0, 1),
            }
            tot_n += row["n"]
            tot_agree += row["agree"]
            tot_eo += row["executor_only"]
            tot_vo += row["validator_only"]
        except Exception as e:  # contain per-combo device faults
            row = {"error": f"{type(e).__name__}: {e}"[:200]}
        out[f"{robot}/{env}"] = row
        print(f"{robot}/{env}: {row}", flush=True)
        # incremental flush: a wall-clock cut keeps completed combos
        (ROOT / "CALIBRATION_r05.json").write_text(json.dumps(
            {"metric": "per-trajectory agreement (incremental)",
             "combos": out,
             "total_n": tot_n, 
             "total_agreement": round(tot_agree / max(tot_n, 1), 4)},
            indent=1))

    result = {
        "metric": "per-trajectory agreement: validate_trajectory (geometric, "
                  "tapered) vs execution_success (closed-form PD executor, "
                  "tapered) on the adaptive engine's selected trajectories",
        "combos": out,
        "total_n": tot_n,
        "total_agreement": round(tot_agree / max(tot_n, 1), 4),
        "executor_only": tot_eo,
        "validator_only": tot_vo,
        "note": "held-out seed 11 (matrix ran seeds 0-4); validator probes "
                "the executor's PD path (fused pass), trilinear clearance, "
                "taper r=0.5 in both metrics",
    }
    (ROOT / "CALIBRATION_r05.json").write_text(json.dumps(result, indent=1))
    print("total agreement:", result["total_agreement"], "n =", tot_n)


if __name__ == "__main__":
    main()
