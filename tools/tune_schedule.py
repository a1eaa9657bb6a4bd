#!/usr/bin/env python
"""Sweep training schedules (LR curve, sigma continuation) WITHOUT recompiling.

The production solver bakes its schedule into the compiled program
(``TrainConfig.lr_peak`` / ``sigma_anneal``). Tuning by re-running ``bench.py``
costs a ~5 min XLA compile per candidate. This tool instead feeds the
per-step learning-rate and sigma-scale curves as *inputs* to the scan
(``xs = (keys, lr_t, sigma_t)``), so every candidate schedule reuses one
compiled executable; a full-budget candidate evaluation is then just the ~9 s
steady-state solve.

Run on the TPU:
    python tools/tune_schedule.py [--robot franka --env industrial]
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
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax.numpy as jnp
import numpy as np
import optax


def schedule_arrays(name: str, cfg, dtype) -> tuple[np.ndarray, np.ndarray]:
    """(lr_t [T], sigma_t [T]) for a named candidate schedule."""
    T = cfg.num_steps
    t = np.arange(T, dtype=np.float64)
    base = cfg.learning_rate
    kind, *rest = name.split(":")
    if kind == "const":
        lr = np.full(T, base)
    elif kind == "cos":  # warmup-cosine peak -> base
        peak, warm = float(rest[0]), int(rest[1])
        warmup = peak * np.minimum(t / max(warm, 1), 1.0)
        frac = np.clip((t - warm) / max(T - warm, 1), 0.0, 1.0)  # optax warmup_cosine_decay denominator
        cos = base + 0.5 * (peak - base) * (1 + np.cos(np.pi * frac))
        lr = np.where(t < warm, warmup, cos)
    else:
        raise ValueError(name)
    anneal = float(rest[-1]) if kind == "cos" and len(rest) > 2 else (
        float(rest[0]) if kind == "const" and rest else 1.0
    )
    sigma = anneal ** (1.0 - t / max(T - 1, 1)) if anneal > 1.0 else np.ones(T)
    return lr.astype(dtype), sigma.astype(dtype)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="franka")
    ap.add_argument("--env", default="industrial")
    ap.add_argument(
        "--schedules",
        nargs="*",
        default=[
            "const",            # reference: constant lr, no annealing
            "const:10",         # constant lr + sigma continuation x10
            "cos:0.07:10",      # warmup-cosine 0.07 -> base
            "cos:0.10:10",
            "cos:0.10:10:10",   # + sigma continuation x10
            "cos:0.10:10:30",
        ],
    )
    ap.add_argument(
        "--hypers",
        nargs="*",
        default=["ref"],
        help="init-hyperparameter variants 'name:variance:ls_scale:sigma_obs' "
        "('-' keeps the problemset default); evaluated without recompiling",
    )
    ap.add_argument(
        "--inits",
        nargs="*",
        default=["linear", "zeros", "waypoint"],
        help="q_mu init modes (restart candidates); 'rand<i>' = random "
        "via-point restart seeded by i",
    )
    args = ap.parse_args()

    from vgpmp_tpu.engine import solver
    from vgpmp_tpu.engine.validator import validate_trajectory
    from vgpmp_tpu.models import vgpmp as planner
    from vgpmp_tpu.session import PlanningSession

    sess = PlanningSession(args.robot, args.env, dtype=jnp.float32, use_tuned=False)
    model, cfg = sess.model, sess.train_config
    starts, goals = sess.queries()
    B = len(starts)
    sb = jnp.asarray(starts, jnp.float32)
    gb = jnp.asarray(goals, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    # init params are INPUTS to the compiled solve, so the restart ensemble
    # (linear + zeros q_mu) AND kernel/likelihood init-hyperparameter variants
    # (variance / lengthscale / sigma_obs) are all evaluated on the same
    # executable for free — only shapes (M, S, N) and epsilon recompile.
    def init_with(interp, variance=None, ls_scale=1.0, sigma_obs=None):
        pp = sess.planner_params
        common = dict(
            lengthscales=np.asarray(pp["lengthscales"], np.float64) * ls_scale,
            variance=float(variance if variance is not None else pp["variance"]),
            sigma_obs=float(sigma_obs if sigma_obs is not None else pp["sigma_obs"]),
            alpha=float(pp["alpha"]),
        )
        wps = solver.restart_waypoints(model, starts, goals, interp)
        if wps is not None:
            return jax.vmap(
                lambda s, g, w: planner.init_params(
                    model, s, g, interpolation="waypoint", waypoint=w, **common
                )
            )(jnp.asarray(starts), jnp.asarray(goals), jnp.asarray(wps))
        return jax.vmap(
            lambda s, g: planner.init_params(model, s, g, interpolation=interp, **common)
        )(jnp.asarray(starts), jnp.asarray(goals))

    # hyper variants: "name:variance:ls_scale:sigma_obs" ('-' keeps default)
    def parse_hyper(h):
        name, v, lss, so = (h.split(":") + ["-", "-", "-"])[:4]
        return name, dict(
            variance=None if v in ("-", "") else float(v),
            ls_scale=1.0 if lss in ("-", "") else float(lss),
            sigma_obs=None if so in ("-", "") else float(so),
        )

    hypers = [parse_hyper(h) for h in args.hypers]
    init_names = tuple(args.inits)
    params_sets = {
        (hname, interp): init_with(interp, **hkw)
        for hname, hkw in hypers
        for interp in init_names
    }
    dtype = model.limits_low.dtype
    X = jnp.linspace(0.0, 1.0, cfg.time_spacing_X, dtype=dtype)
    Xnew = jnp.linspace(0.0, 1.0, cfg.time_spacing_Xnew, dtype=dtype)
    trainable = solver.default_trainable()
    opt = optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2)

    def solve_one(params, start, goal, key, lr_t, sigma_t):
        mask = solver._mask_pytree(params, trainable)
        opt_state = opt.init(params)

        def step(carry, xs):
            k, lr, ss = xs
            p, s = carry
            grads = jax.grad(
                lambda pp: -planner.elbo(pp, model, start, goal, X, k, sigma_scale=ss)
            )(p)
            grads = jax.tree.map(lambda g, m: g * m, grads, mask)
            updates, s = opt.update(grads, s, p)
            p = optax.apply_updates(
                p, jax.tree.map(lambda u: -lr.astype(u.dtype) * u, updates)
            )
            return (p, s), ()

        ks = jax.random.split(key, cfg.num_steps + 1)
        (params, _), _ = jax.lax.scan(
            step, (params, opt_state), (ks[:-1], lr_t, sigma_t)
        )
        _, best, _, _ = planner.sample_from_posterior(
            params, model, start, goal, Xnew, ks[-1], cfg.num_posterior_samples
        )
        return best

    solve_b = jax.jit(jax.vmap(solve_one, in_axes=(0, 0, 0, 0, None, None)))
    val = jax.jit(
        jax.vmap(
            lambda tr, a, b: validate_trajectory(
                model.collision, tr, a, b, model.limits_low, model.limits_high
            )
        )
    )

    print(f"{args.robot}/{args.env}: B={B}, budget={cfg.num_steps} steps, lr={cfg.learning_rate}")
    for hname, _ in hypers:
        for name in args.schedules:
            lr_t, sigma_t = schedule_arrays(name, cfg, np.float32)
            succ = {}
            dt = 0.0
            for interp in init_names:
                p0 = params_sets[(hname, interp)]
                t0 = time.time()
                best = solve_b(p0, sb, gb, keys, jnp.asarray(lr_t), jnp.asarray(sigma_t))
                best.block_until_ready()
                dt = time.time() - t0
                reps = val(best, sb, gb)
                succ[interp] = np.asarray(reps.success)
            union = np.zeros_like(succ[init_names[0]])
            parts, unions = [], []
            for interp in init_names:
                union = union | succ[interp]
                parts.append(f"{interp}={succ[interp].mean():.3f}")
                unions.append(f"{union.mean():.3f}")
            print(
                f"{hname:<12s} {name:<16s} " + " ".join(parts)
                + "  union:" + ">".join(unions) + f"  ({dt:.1f} s/run)"
            )


if __name__ == "__main__":
    main()
