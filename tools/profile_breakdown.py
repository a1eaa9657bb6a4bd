#!/usr/bin/env python
"""Stage-level wall-clock breakdown of the ELBO hot loop on the real device.

Times each cost center of one training step (SURVEY.md 3.2) at benchmark
shapes, then the fused step, so kernel-optimization decisions are based on
measured dominance, not guesses.

Methodology: each stage runs REPS times inside one jitted ``lax.scan`` whose
carry folds a hash of the stage output back into the inputs — single-dispatch
timing is useless here because the TPU tunnel adds ~30 ms per dispatch (
measured), which buries sub-30ms stages. Scan amortizes the dispatch and the
carry dependency defeats CSE/DCE.

Run on the TPU:  python tools/profile_breakdown.py [--robot franka --env industrial]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

REPS = 50


def bench_scan(step, init, iters: int = 3) -> float:
    """Median per-iteration wall-clock (ms) of ``step: carry -> carry``
    executed REPS times inside one jitted scan."""

    @jax.jit
    def run(c):
        def body(c, _):
            return step(c), ()

        c, _ = jax.lax.scan(body, c, None, length=REPS)
        return c

    jax.block_until_ready(run(init))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(run(init))
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times)) / REPS


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="franka")
    ap.add_argument("--env", default="industrial")
    ap.add_argument("--batch", type=int, default=36)
    ap.add_argument("--json-out", default=None, help="also write the table as JSON")
    args = ap.parse_args()

    from vgpmp_tpu.engine import solver
    from vgpmp_tpu.gp import pathwise
    from vgpmp_tpu.kinematics.dh import sphere_positions
    from vgpmp_tpu.models import vgpmp as planner
    from vgpmp_tpu.session import PlanningSession

    sess = PlanningSession(args.robot, args.env, dtype=jnp.float32)
    model = sess.model
    starts, goals = sess.queries()
    B = min(args.batch, len(starts))
    sb = jnp.asarray(starts[:B], jnp.float32)
    gb = jnp.asarray(goals[:B], jnp.float32)
    params_b = solver.init_batch(model, starts[:B], goals[:B], sess.planner_params)
    cfg = sess.train_config
    S, N = model.num_samples, cfg.time_spacing_X
    L = model.num_latent
    P = int(model.collision.fk.sphere_radii.shape[0])
    X = jnp.linspace(0.0, 1.0, N, dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    print(
        f"{args.robot}/{args.env}: B={B} S={S} N={N} L={L} P={P} "
        f"M={model.num_inducing} bases={model.num_bases} "
        f"solve_dtype={model.solve_dtype} sdf_mode={sess.sdf_mode}"
    )

    cfgs = jax.random.uniform(
        jax.random.PRNGKey(1), (B, S, N, L), dtype=jnp.float32,
        minval=model.limits_low, maxval=model.limits_high,
    )
    sig = jnp.full((P,), 0.005, jnp.float32)

    def fold(f):
        def step(c):
            return c + 1e-12 * jnp.mean(f(c))

        return step

    rows = []

    def report(name, ms):
        rows.append((name, ms))
        print(f"{name:<42s} {ms:9.3f} ms")

    # --- gram + cholesky + pathwise draw/eval (fwd) --------------------------
    def paths_fwd(p_b):
        def one(p, s, g, k):
            c = planner.constrain(p, model.variance_lower)
            q_lat = planner.query_latent(model, s, g)
            _, chol = planner._gram(model, c)
            q_mu_full = planner._q_mu_full(model, c, q_lat)
            st = pathwise.draw_paths(
                k, model.ny, c["Z"], c["lengthscales"], c["variance"], chol,
                q_mu_full, c["q_sqrt"], model.num_samples, model.num_bases,
                jitter=model.jitter, kernel=model.kernel,
            )
            Kuf = planner._kuf(model, c, X)
            return pathwise.eval_paths(st, Kuf, X)

        f = jax.vmap(one)(p_b, sb, gb, keys)
        return jax.tree.map(lambda x: x + 1e-12 * jnp.mean(f).astype(x.dtype), p_b)

    report("gram+chol+draw+eval paths fwd", bench_scan(paths_fwd, params_b))

    # --- FK sphere rollout ----------------------------------------------------
    report(
        "FK sphere rollout fwd [B,S,N]",
        bench_scan(fold(lambda q: sphere_positions(model.collision.fk, q)), cfgs),
    )
    report(
        "FK sphere rollout fwd+bwd",
        bench_scan(
            fold(lambda q: jax.grad(
                lambda x: jnp.sum(sphere_positions(model.collision.fk, x)))(q)),
            cfgs,
        ),
    )

    # --- FK + SDF + hinge ------------------------------------------------------
    report(
        "FK+SDF+hinge log_prob fwd",
        bench_scan(fold(lambda q: model.collision.log_prob(q, sig)), cfgs),
    )
    report(
        "FK+SDF+hinge log_prob fwd+bwd",
        bench_scan(
            fold(lambda q: jax.grad(
                lambda x: jnp.sum(model.collision.log_prob(x, sig)))(q)),
            cfgs,
        ),
    )

    # --- bwd decomposition of the dominant stage ------------------------------
    # PROFILE_r03 left ~18 ms of log_prob bwd unattributed (gather accounts
    # for ~9 ms at the measured issue rate); these stages isolate each leg.
    pos = sphere_positions(model.collision.fk, cfgs)  # [B,S,N,P,3] fixed
    radii = model.collision.fk.sphere_radii

    def sdf_hinge_only(p):
        d = model.collision.scene.distance(p) - radii
        cost = jnp.maximum(model.collision.epsilon - d, 0.0)
        return -0.5 * jnp.sum(cost * cost / sig, axis=-1)

    report(
        "SDF+hinge on fixed positions fwd",
        bench_scan(fold(lambda p: sdf_hinge_only(p)), pos),
    )
    report(
        "SDF+hinge on fixed positions fwd+bwd",
        bench_scan(
            fold(lambda p: jax.grad(lambda x: jnp.sum(sdf_hinge_only(x)))(p)),
            pos,
        ),
    )

    def fk_quadcost(q):
        # FK machinery with a gather-free cost: isolates the FK bwd transpose
        p = sphere_positions(model.collision.fk, q)
        c = jnp.maximum(0.05 - jnp.sum(p * p, axis=-1), 0.0)
        return -0.5 * jnp.sum(c * c / sig, axis=-1)

    report(
        "FK+quad-cost (no SDF) fwd+bwd",
        bench_scan(
            fold(lambda q: jax.grad(lambda x: jnp.sum(fk_quadcost(x)))(q)), cfgs
        ),
    )

    # --- full ELBO --------------------------------------------------------------
    def elbo_fwd(p_b):
        def one(p, s, g, k):
            return planner.elbo(p, model, s, g, X, k)

        v = jax.vmap(one)(p_b, sb, gb, keys)
        return jax.tree.map(lambda x: x + 1e-12 * jnp.mean(v).astype(x.dtype), p_b)

    report("full ELBO fwd", bench_scan(elbo_fwd, params_b))

    def elbo_grad(p_b):
        def one(p, s, g, k):
            return jax.grad(lambda pp: -planner.elbo(pp, model, s, g, X, k))(p)

        gr = jax.vmap(one)(p_b, sb, gb, keys)
        return jax.tree.map(lambda x, g: x + 1e-12 * g, p_b, gr)

    report("full ELBO fwd+bwd (1 train step)", bench_scan(elbo_grad, params_b))

    total = dict(rows)["full ELBO fwd+bwd (1 train step)"]
    print(
        f"\nprojected {cfg.num_steps}-step optimize wall-clock: "
        f"{total * cfg.num_steps / 1e3:.2f} s for B={B} "
        f"({B / (total * cfg.num_steps / 1e3):.2f} solves/s excl. extraction)"
    )
    if args.json_out:
        import json

        out = {
            "robot": args.robot,
            "env": args.env,
            "batch": B,
            "shapes": {
                "S": S, "N": N, "L": L, "P": P,
                "M": model.num_inducing, "bases": model.num_bases,
            },
            "device": str(jax.devices()[0]),
            "stages_ms": {name: round(ms, 3) for name, ms in rows},
            "projected_full_optimize_seconds": round(total * cfg.num_steps / 1e3, 3),
        }
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", args.json_out)


if __name__ == "__main__":
    main()
