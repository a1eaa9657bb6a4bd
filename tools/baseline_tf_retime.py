#!/usr/bin/env python
"""Measure the reference implementation's wall-clock on this image's CPU.

The TF reference cannot run here verbatim (GPflow/GPflowSampling/PyBullet are
not installed), so this tool re-times a SHAPE- AND OP-FAITHFUL TensorFlow
reconstruction of its hot loop at the exact benchmark configuration —
the defensible baseline denominator BASELINE.md calls for (replacing the
earlier 30 s/problem estimate).

Faithful to the reference per SURVEY.md 3.2 (file:line cites are
/root/reference):

- one problem at a time, float64, CPU (``benchmarking.py:9-10``);
- per step: fresh pathwise draw (S samples x B=1024 RFF bases per latent,
  ``models/vgpmp.py:281, :97``), per-latent conditioned Gram (Mc x Mc) +
  Cholesky for BOTH the pathwise update and the KL (both re-Cholesky each
  step, ``covariances/multioutput/Kuus.py``, ``kullback_leiblers/prior_kl.py``);
- FK via ``tf.vectorized_map`` over the S*N flattened configs, each a dof-step
  ``tf.scan`` of 4x4 DH matmuls + per-sphere offset matmuls
  (``likelihoods/likelihood.py:122``, ``utils/sampler.py:103-120,216-235``);
- SDF nearest-cell ``tf.gather_nd`` under a ``@tf.custom_gradient`` routing
  grads through central differences (``utils/sdf_utils.py:73-136``,
  ``likelihoods/likelihood.py:132-176``);
- hinge + Gaussian collision factor, conditioned KL via ``gauss_kl``-equivalent
  math, Adam(lr, 0.8, 0.95) ``apply_gradients`` under one outer ``tf.function``
  (``utils/miscellaneous.py:68-84``, ``models/vgpmp.py:77``);
- posterior extraction: 150 pathwise samples on the fine grid, per-sample
  collision log-prob, argmax (``models/vgpmp.py:313-339``).

Shapes/constants come from the SAME assets the JAX framework uses (robot spec
JSON, scene SDF npz, problemset JSON), so the workload is identical to what
``bench.py`` solves. Generosity choices toward the reference: the whole step
graph is additionally tried with ``jit_compile=True`` (XLA-CPU — more fusion
than the reference's own eager/graph mix) and the FASTER variant is reported.

Run:  python tools/baseline_tf_retime.py [--robot franka --env industrial]
Writes BASELINE_MEASURED.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")  # benchmarking.py:10
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

import numpy as np
import tensorflow as tf

F64 = tf.float64


def build_reference_step(spec, sdf, ps, base_pose, scene_offset):
    """One training step + posterior extraction, reference op-for-op."""
    dof = spec["dof"]
    L = dof
    M = int(ps["num_inducing"])
    S = int(ps["num_samples"])
    N = int(ps["time_spacing_X"])
    Nnew = int(ps["time_spacing_Xnew"])
    B = 1024  # models/vgpmp.py:97
    C = 2     # conditioned timesteps t=0,1

    dh = np.asarray(spec["dh"], np.float64)          # [dof, 3] d, a, alpha
    twist = np.asarray(spec["twist"], np.float64)
    craig = bool(spec["craig_dh"])
    fk_slice = np.asarray(spec["fk_slice"], np.int32)
    sphere_frame = np.asarray(spec["sphere_frame"], np.int32)  # [P]
    sphere_off = np.asarray(spec["sphere_offsets"], np.float64)  # [P, 3]
    radii = np.asarray(spec["sphere_radii"], np.float64)
    P = radii.shape[0]
    limits = np.asarray(spec["joint_limits"], np.float64)
    lo, hi = limits[:, 0], limits[:, 1]

    data = tf.constant(sdf["data"], F64)
    origin = tf.constant(sdf["origin"], F64)
    delta = tf.constant(float(sdf["delta"]), F64)
    dims = tf.constant(np.asarray(sdf["data"].shape, np.int64) - 1, tf.int64)
    scene_off_t = tf.constant(scene_offset, F64)

    base_T = tf.constant(base_pose, F64)
    dh_t = tf.constant(dh, F64)
    twist_t = tf.constant(twist, F64)
    sphere_off_T = np.tile(np.eye(4), (P, 1, 1))
    sphere_off_T[:, :3, 3] = sphere_off
    sphere_off_t = tf.constant(sphere_off_T, F64)
    radii_t = tf.constant(radii, F64)
    lo_t, hi_t = tf.constant(lo, F64), tf.constant(hi, F64)

    # ---- kernel / GP constants -------------------------------------------
    sigma_obs0 = float(ps["sigma_obs"])
    eps = float(ps["epsilon"])
    ls0 = np.asarray(ps["lengthscales"], np.float64)
    var0 = float(ps["variance"])
    alpha0 = float(ps["alpha"])
    lr = float(ps["learning_rate"])
    num_steps = int(ps["num_steps"])

    ny = tf.constant(np.array([0.0, 1.0]), F64)
    Zg = np.linspace(0.1, 0.9, M)

    # trainables (reference: q_mu, q_sqrt, lengthscales, variance trainable)
    q_mu = tf.Variable(np.zeros((M, L)), dtype=F64)
    q_sqrt = tf.Variable(np.tile(np.eye(M), (L, 1, 1)), dtype=F64)
    ls_u = tf.Variable(np.log(np.expm1(ls0)), dtype=F64)
    var_u = tf.Variable(np.log(np.expm1(var0 - 0.1)) * np.ones(L), dtype=F64)
    variables = [q_mu, q_sqrt, ls_u, var_u]

    sigma_obs = tf.constant(np.full(P, sigma_obs0), F64)
    alpha = tf.constant(alpha0, F64)
    opt = tf.keras.optimizers.Adam(lr, beta_1=0.8, beta_2=0.95)  # vgpmp.py:77

    sqrt5 = math.sqrt(5.0)

    def matern52(a, b, l, v):
        r = tf.abs(a[:, None] - b[None, :]) / l
        return v * (1 + sqrt5 * r + 5.0 / 3.0 * r * r) * tf.exp(-sqrt5 * r)

    def dh_mats(q):
        """[dof, 4, 4] DH transforms for one config (sampler.py:143-168)."""
        theta = q + twist_t
        d, a, al = dh_t[:, 0], dh_t[:, 1], dh_t[:, 2]
        ct, st = tf.cos(theta), tf.sin(theta)
        ca, sa = tf.cos(al), tf.sin(al)
        z = tf.zeros_like(ct)
        o = tf.ones_like(ct)
        if craig:  # Craig-modified (robot_mixin.py)
            rows = [
                tf.stack([ct, -st, z, a], -1),
                tf.stack([st * ca, ct * ca, -sa, -d * sa], -1),
                tf.stack([st * sa, ct * sa, ca, d * ca], -1),
                tf.stack([z, z, z, o], -1),
            ]
        else:
            rows = [
                tf.stack([ct, -st * ca, st * sa, a * ct], -1),
                tf.stack([st, ct * ca, -ct * sa, a * st], -1),
                tf.stack([z, sa, ca, d], -1),
                tf.stack([z, z, z, o], -1),
            ]
        return tf.stack(rows, axis=1)  # [dof, 4, 4]

    def fk_spheres(q):
        """One config -> [P, 3] sphere centers (sampler.py:216-235)."""
        mats = dh_mats(q)
        chain = tf.scan(tf.matmul, mats, initializer=base_T)  # sampler.py:118
        frames = tf.concat([base_T[None], chain], axis=0)     # [dof+1, 4, 4]
        frames = tf.gather(frames, fk_slice)
        per_sphere = tf.gather(frames, sphere_frame)          # [P, 4, 4]
        world = tf.matmul(per_sphere, sphere_off_t)
        return world[:, :3, 3]

    def sdf_distance_with_grad(pos):
        """Nearest-cell SDF + central-difference custom grad
        (sdf_utils.py:73-136, likelihood.py:146-176)."""

        @tf.custom_gradient
        def _d(p):
            idx = tf.cast(tf.round((p - origin) / delta), tf.int64)
            idx = tf.clip_by_value(idx, 0, dims)
            val = tf.gather_nd(data, idx)

            def grad(upstream):
                gs = []
                for ax in range(3):
                    off = tf.one_hot(ax, 3, dtype=tf.int64)
                    ip = tf.clip_by_value(idx + off, 0, dims)
                    im = tf.clip_by_value(idx - off, 0, dims)
                    g = (tf.gather_nd(data, ip) - tf.gather_nd(data, im)) / (2 * delta)
                    gs.append(g)
                g = tf.stack(gs, axis=-1)
                # zero-gradient -> 0.1 replacement hack (sdf_utils.py:125-130)
                g = tf.where(tf.equal(g, 0.0), tf.fill(tf.shape(g), tf.constant(0.1, F64)), g)
                return upstream[..., None] * g

            return val, grad

        return _d(pos)

    def log_prob(configs):
        """[S*N, L] constrained configs -> [S*N] (likelihood.py:57-125)."""
        spheres = tf.vectorized_map(fk_spheres, configs)  # likelihood.py:122
        pos = spheres - scene_off_t
        d = sdf_distance_with_grad(pos) - radii_t
        cost = tf.maximum(eps - d, 0.0)
        return -0.5 * tf.reduce_sum(cost * cost / sigma_obs, axis=-1)

    def softplus(x):
        return tf.math.softplus(x)

    def paths_and_kl(key_seed, X, num_s):
        """Pathwise samples at X + the conditioned KL (both re-Cholesky)."""
        ls = softplus(ls_u)
        var = softplus(var_u) + 0.1
        Zy = tf.concat([ny[:, None], tf.constant(Zg, F64)[:, None]], axis=0)[:, 0]

        # per-latent conditioned Gram + chol (multioutput/Kuus.py)
        K = tf.stack([matern52(Zy, Zy, ls[i], var[i]) for i in range(L)])
        K += 1e-6 * tf.eye(M + C, dtype=F64)[None]
        chol = tf.linalg.cholesky(K)  # [L, Mc, Mc]

        # RFF prior paths (GPflowSampling; Matern-5/2 = Student-t(5) spectral)
        def seed(i):
            return tf.stack([key_seed, tf.constant(i, tf.int64)])

        nrm = tf.random.stateless_normal((L, B), seed(0), dtype=F64)
        chi2 = tf.reduce_sum(
            tf.square(tf.random.stateless_normal((L, B, 5), seed(1), dtype=F64)), -1
        )
        theta = nrm * tf.sqrt(5.0 / chi2) / ls[:, None]
        bias = tf.random.stateless_uniform((L, B), seed(2), 0.0, 2 * np.pi, dtype=F64)
        w = tf.random.stateless_normal((L, B, num_s), seed(3), dtype=F64)

        def phi(x):  # [L, n, B]
            f = x[None, :, None] * theta[:, None, :] + bias[:, None, :]
            return tf.sqrt(2.0 * var / B)[:, None, None] * tf.cos(f)

        # u-samples: q_mu + q_sqrt @ eps, prepend clamped query rows
        epsu = tf.random.stateless_normal((L, M, num_s), seed(4), dtype=F64)
        u = tf.transpose(q_mu)[:, :, None] + tf.matmul(q_sqrt, epsu)  # [L, M, S]
        qrows = tf.zeros((L, C, num_s), F64)  # latent start/goal rows
        u_full = tf.concat([qrows, u], axis=1)  # [L, Mc, S]

        prior_Z = tf.matmul(phi(Zy), w)               # [L, Mc, S]
        v = tf.linalg.cholesky_solve(chol, u_full - prior_Z)
        Kfu = tf.stack([matern52(X, Zy, ls[i], var[i]) for i in range(L)])
        f = tf.matmul(phi(X), w) + tf.matmul(Kfu, v)  # [L, N, S]
        f = tf.transpose(f, [2, 1, 0])                # [S, N, L]

        # conditioned prior KL (prior_kl.py:17-35)
        Lnn = chol[:, :C, :C]
        p_mu = tf.matmul(
            K[:, :, :C], tf.linalg.cholesky_solve(Lnn, tf.zeros((L, C, 1), F64))
        )
        q_full = tf.concat([tf.zeros((L, C, 1), F64), tf.transpose(q_mu)[:, :, None]], 1)
        white = tf.linalg.triangular_solve(chol, q_full - p_mu)[:, C:, :]
        # gauss_kl(white, q_sqrt) with whitened prior
        Lq = tf.linalg.band_part(q_sqrt, -1, 0)
        mah = tf.reduce_sum(tf.square(white))
        logdet = -2.0 * tf.reduce_sum(tf.math.log(tf.abs(tf.linalg.diag_part(Lq))))
        trace = tf.reduce_sum(tf.square(Lq))
        kl = 0.5 * (mah + logdet + trace - tf.cast(L * M, F64))
        return f, kl

    X = tf.constant(np.linspace(0, 1, N), F64)
    Xnew = tf.constant(np.linspace(0, 1, Nnew), F64)

    def sigmoid_box(f):
        return lo_t + (hi_t - lo_t) * tf.sigmoid(f)

    def train_step(seed):
        """optimization_step (miscellaneous.py:68-84) + elbo (vgpmp.py:265-289)."""
        with tf.GradientTape() as tape:
            f, kl = paths_and_kl(seed, X, S)
            gcfg = sigmoid_box(f)
            lik = log_prob(tf.reshape(gcfg, (S * N, L)))
            lik = tf.reshape(lik, (S, N))
            elbo = alpha * tf.reduce_sum(tf.reduce_mean(lik, 0)) - kl
            loss = -elbo
        grads = tape.gradient(loss, variables)
        opt.apply_gradients(zip(grads, variables))
        return loss

    def extract(seed):
        """sample_from_posterior (vgpmp.py:313-339): 150 samples + argmax."""
        f, _ = paths_and_kl(seed, Xnew, 150)
        gcfg = sigmoid_box(f)
        lik = tf.reshape(log_prob(tf.reshape(gcfg, (150 * Nnew, L))), (150, Nnew))
        scores = tf.reduce_sum(lik, axis=-1)
        return tf.gather(gcfg, tf.argmax(scores))

    return train_step, extract, num_steps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="franka")
    ap.add_argument("--env", default="industrial")
    ap.add_argument("--timed-steps", type=int, default=20)
    args = ap.parse_args()

    assets = ROOT / "vgpmp_tpu" / "assets"
    spec = json.loads((assets / "robots" / f"{args.robot}.json").read_text())
    pset = json.loads((assets / "problemsets" / f"{args.robot}.json").read_text())[args.env]
    ps = pset["planner_params"]
    sdf = np.load(assets / "scenes" / f"{args.env}.npz")

    from vgpmp_tpu.session import base_pose_matrix

    base_pose = base_pose_matrix(pset["robot_position"], pset["robot_orientation_xyzw"])
    scene_offset = np.asarray(pset["environment_position"], np.float64)

    results = {}
    for jit in (False, True):
        step, extract, num_steps = build_reference_step(
            spec, {"data": sdf["data"], "origin": sdf["origin"], "delta": sdf["delta"]},
            ps, base_pose, scene_offset,
        )
        step_fn = tf.function(step, jit_compile=jit)
        extract_fn = tf.function(extract, jit_compile=jit)
        try:
            t0 = time.time()
            step_fn(tf.constant(0, tf.int64))
            trace_s = time.time() - t0
            t0 = time.time()
            for i in range(args.timed_steps):
                step_fn(tf.constant(i + 1, tf.int64))
            per_step = (time.time() - t0) / args.timed_steps
            extract_fn(tf.constant(99, tf.int64))  # trace
            t0 = time.time()
            extract_fn(tf.constant(100, tf.int64))
            extract_s = time.time() - t0
        except Exception as e:  # jit_compile=True may reject vectorized_map
            results[f"jit={jit}"] = {"error": str(e)[:200]}
            continue
        per_problem = per_step * num_steps + extract_s
        results[f"jit={jit}"] = {
            "trace_seconds": round(trace_s, 2),
            "per_step_seconds": round(per_step, 4),
            "extract_seconds": round(extract_s, 3),
            "per_problem_seconds": round(per_problem, 2),
            "solves_per_sec": round(1.0 / per_problem, 4),
        }
        print(f"jit={jit}: {per_step*1e3:.1f} ms/step, extract {extract_s:.2f} s, "
              f"{per_problem:.1f} s/problem")

    best = min(
        (v["per_problem_seconds"] for v in results.values() if "per_problem_seconds" in v),
        default=None,
    )
    out = {
        "description": "shape/op-faithful TF re-timing of the reference hot loop "
        "(see tools/baseline_tf_retime.py docstring)",
        "robot": args.robot,
        "env": args.env,
        "budget": {k: ps[k] for k in ("num_steps", "num_samples", "num_inducing",
                                       "time_spacing_X", "time_spacing_Xnew")},
        "tf_version": tf.__version__,
        "cpu_count": os.cpu_count(),
        "variants": results,
        "reference_per_problem_seconds": best,
        "reference_solves_per_sec": round(1.0 / best, 4) if best else None,
    }
    (ROOT / "BASELINE_MEASURED.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
