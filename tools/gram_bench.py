#!/usr/bin/env python
"""Roofline microbenchmark of the GP "Gram leg" (VERDICT r4 weak #2).

PROFILE_r04.json attributed 8.6 ms of the 25.6 ms train step to
"gram+chol+draw+eval paths fwd" with no per-piece evidence. This tool times
each piece at the bench shapes (franka/industrial: L=7, Mc=12, N=50, S=20,
B_rff=1024, batch 36) on the real device, for BOTH the round-4 formulation
(f64-island einsums: u-draw, cho_solve, f64 update contraction, gamma-based
Student-t) and the round-5 half-whitened one (one f64 triangular solve per
leg, Bailey Student-t, bulk-dtype contractions), plus flop/byte roofline
arithmetic for the dominant pieces.

Writes GRAM_BENCH.json at the repo root and prints a summary.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, *args, warmup=3, iters=20):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=36)
    args = ap.parse_args()

    from vgpmp_tpu.gp import conditioned, kl, pathwise
    from vgpmp_tpu.ops import kernels as kops
    from vgpmp_tpu.ops import linalg

    Bp = args.batch       # problem batch
    L, M, C = 7, 10, 2
    Mc = M + C
    N, S, BR = 50, 20, 1024
    bulk = jnp.float32
    island = jnp.float64

    r = np.random.default_rng(0)
    ny = jnp.asarray([0.0, 1.0], bulk)
    Z = jnp.asarray(np.linspace(0.1, 0.9, M)[:, None].repeat(L, 1), bulk)
    ls = jnp.asarray(r.uniform(0.3, 2.0, (Bp, L)), bulk)
    s2 = jnp.asarray(r.uniform(0.2, 0.6, (Bp, L)), bulk)
    q_mu_full = jnp.asarray(r.normal(size=(Bp, Mc, L)) * 0.5, bulk)
    q_sqrt = jnp.asarray(
        np.tril(0.05 * r.normal(size=(Bp, L, M, M))) + np.eye(M), bulk
    )
    X = jnp.linspace(0.0, 1.0, N, dtype=bulk)
    keys = jax.random.split(jax.random.PRNGKey(0), Bp)
    kfn = kops.KERNELS["matern52"][0]
    dev = jax.devices()[0]
    results = {"device": str(dev), "shapes": dict(batch=Bp, L=L, M=M, Mc=Mc, N=N, S=S, B_rff=BR)}

    # ---------------- piece 1: Gram assembly + Cholesky (f64 island) --------
    @jax.jit
    def gram_chol_f64(ls, s2):
        def one(l_, v_):
            return conditioned.cholesky_kuu(
                kfn, ny, Z, l_, v_, jitter=1e-9, solve_dtype=island
            )[1]
        return jax.vmap(one)(ls, s2)

    @jax.jit
    def gram_chol_f32(ls, s2):
        def one(l_, v_):
            return conditioned.cholesky_kuu(kfn, ny, Z, l_, v_, jitter=1e-6)[1]
        return jax.vmap(one)(ls, s2)

    results["gram_chol_f64_ms"] = timeit(gram_chol_f64, ls, s2) * 1e3
    results["gram_chol_f32_ms"] = timeit(gram_chol_f32, ls, s2) * 1e3
    log(f"gram+chol f64 {results['gram_chol_f64_ms']:.3f} ms | f32 {results['gram_chol_f32_ms']:.3f} ms")

    chol = gram_chol_f64(ls, s2)

    # ---------------- piece 2: Student-t spectral draw ----------------------
    @jax.jit
    def t_bailey(keys):
        return jax.vmap(lambda k: pathwise.student_t(k, 5.0, (L, BR), bulk))(keys)

    @jax.jit
    def t_gamma(keys):
        return jax.vmap(lambda k: jax.random.t(k, 5.0, (L, BR), bulk))(keys)

    results["student_t_bailey_ms"] = timeit(t_bailey, keys) * 1e3
    results["student_t_gamma_ms"] = timeit(t_gamma, keys) * 1e3
    log(f"student-t bailey {results['student_t_bailey_ms']:.3f} ms | gamma {results['student_t_gamma_ms']:.3f} ms")

    # ---------------- piece 3: full draw+eval (round-5 path) ----------------
    @jax.jit
    def draw_eval(ls, s2, chol, q_mu_full, q_sqrt, keys):
        def one(l_, v_, ch, qm, qs, k):
            st = pathwise.draw_paths(
                k, ny, Z, l_, v_, ch, qm, qs, S, BR, jitter=1e-9
            )
            kuf = conditioned.kuf(kfn, ny, Z, X, l_, v_, solve_dtype=island)
            return pathwise.eval_paths(st, kuf, X)
        return jax.vmap(one)(ls, s2, chol, q_mu_full, q_sqrt, keys)

    results["draw_eval_r5_ms"] = timeit(draw_eval, ls, s2, chol, q_mu_full, q_sqrt, keys) * 1e3
    log(f"draw+eval (round-5 half-whitened) {results['draw_eval_r5_ms']:.3f} ms")

    # round-4 formulation twin: f64 u-draw einsum + cho_solve + f64 update
    @jax.jit
    def draw_eval_r4(ls, s2, chol, q_mu_full, q_sqrt, keys):
        def one(l_, v_, ch, qm, qs, k):
            k_omega, k_phase, k_w, k_eps = jax.random.split(k, 4)
            t = jax.random.t(k_omega, 5.0, (L, BR), bulk)
            omega = t / l_[:, None]
            phase = jax.random.uniform(k_phase, (L, BR), dtype=bulk, maxval=2 * np.pi)
            w = jax.random.normal(k_w, (S, L, BR), dtype=bulk)
            scale = jnp.sqrt(2.0 * v_[:, None] / BR).astype(bulk)
            zy_ = conditioned.zy(ny, Z).astype(bulk)
            arg = zy_[..., :, None] * omega[..., None, :] + phase[..., None, :]
            phi_z = jnp.cos(arg) * scale[..., None]
            fz = jnp.einsum("lmb,slb->slm", phi_z, w).astype(island)
            lam = pathwise.whitened_scale(ch, qs.astype(island), 1e-9)
            eps = jax.random.normal(k_eps, (S, L, Mc), dtype=island)
            u = qm.T[None].astype(island) + jnp.einsum("lmn,sln->slm", lam, eps)
            resid = jnp.transpose(u - fz, (1, 2, 0))
            v64 = jnp.transpose(linalg.cho_solve(ch, resid), (2, 0, 1))
            kuf = conditioned.kuf(kfn, ny, Z, X, l_, v_, solve_dtype=island)
            Xb = jnp.broadcast_to(X, (L, N))
            argx = Xb[..., :, None] * omega[..., None, :] + phase[..., None, :]
            phi_x = jnp.cos(argx) * scale[..., None]
            fp = jnp.einsum("lnb,slb->sln", phi_x, w)
            upd = jnp.einsum("lmn,slm->sln", kuf, v64)
            return jnp.transpose(fp + upd.astype(bulk), (0, 2, 1))
        return jax.vmap(one)(ls, s2, chol, q_mu_full, q_sqrt, keys)

    results["draw_eval_r4_ms"] = timeit(draw_eval_r4, ls, s2, chol, q_mu_full, q_sqrt, keys) * 1e3
    log(f"draw+eval (round-4 f64-island einsums) {results['draw_eval_r4_ms']:.3f} ms")

    # ---------------- piece 4: RFF feature evaluation alone -----------------
    @jax.jit
    def rff_only(ls, s2, keys):
        def one(l_, v_, k):
            k_omega, k_phase, k_w = jax.random.split(k, 3)
            omega = pathwise.student_t(k_omega, 5.0, (L, BR), bulk) / l_[:, None]
            phase = jax.random.uniform(k_phase, (L, BR), dtype=bulk, maxval=2 * np.pi)
            w = jax.random.normal(k_w, (S, L, BR), dtype=bulk)
            scale = jnp.sqrt(2.0 * v_[:, None] / BR).astype(bulk)
            Xb = jnp.broadcast_to(X, (L, N))
            arg = Xb[..., :, None] * omega[..., None, :] + phase[..., None, :]
            phi = jnp.cos(arg) * scale[..., None]
            return jnp.einsum("lnb,slb->sln", phi, w)
        return jax.vmap(one)(ls, s2, keys)

    results["rff_eval_ms"] = timeit(rff_only, ls, s2, keys) * 1e3
    log(f"RFF features+prior eval alone {results['rff_eval_ms']:.3f} ms")

    # ---------------- piece 5: KL --------------------------------------------
    @jax.jit
    def kl_leg(chol, q_mu_full, q_sqrt):
        def one(ch, qm, qs):
            Kuu = jnp.einsum("lij,lkj->lik", ch, ch)
            return kl.prior_kl(
                Kuu, ch, qm[C:].astype(island), qs.astype(island),
                qm[:C].astype(island),
            )
        return jax.vmap(one)(chol, q_mu_full, q_sqrt)

    results["kl_ms"] = timeit(kl_leg, chol, q_mu_full, q_sqrt) * 1e3
    log(f"prior KL {results['kl_ms']:.3f} ms")

    # ---------------- roofline arithmetic ------------------------------------
    # RFF prior eval dominates the leg's FLOPs: cos features [Bp,L,N,BR]
    # (~1 transcendental + 2 flops each) + the [Bp,S,L,N]x[BR] contraction.
    cos_evals = Bp * L * N * BR
    mac_flops = 2 * Bp * S * L * N * BR
    # v5e peak ~197 TFLOP/s bf16 MXU; f32 VPU ~ 1/8 of that; transcendental
    # ~1 per VPU lane-op. Use conservative 9.9e12 f32 FLOP/s VPU bound.
    vpu = 9.9e12
    results["roofline"] = {
        "rff_cos_evals": cos_evals,
        "rff_mac_flops": mac_flops,
        "rff_flops_bound_ms": (mac_flops / vpu + cos_evals / (vpu / 8)) * 1e3,
        "note": "MXU does the MACs if laid out as matmul; VPU bound shown is "
                "conservative. Bytes: all operands are <32 MB, HBM-resident "
                "once, so the leg is compute/latency-bound, not bandwidth.",
    }
    log(f"roofline: RFF flops bound ~{results['roofline']['rff_flops_bound_ms']:.3f} ms")

    out = os.path.join(os.path.dirname(__file__), "..", "GRAM_BENCH.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
