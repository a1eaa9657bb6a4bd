"""Velocity-conditioned inducing variant tests.

The decisive properties: the extended Gram is a valid covariance (PSD), its
derivative blocks match autodiff of the Matérn kernel, and sampled paths
clamp BOTH endpoint positions and endpoint velocities.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgpmp_tpu.engine import solver
from vgpmp_tpu.engine.analysis import ee_path_uncertainty
from vgpmp_tpu.gp import conditioned, pathwise, velocity
from vgpmp_tpu.models import vgpmp as planner
from vgpmp_tpu.ops import kernels as K
from vgpmp_tpu.session import PlanningSession

L, M, C = 2, 5, 2


@pytest.fixture(scope="module")
def setup():
    r = np.random.default_rng(99)
    ls = jnp.asarray(r.uniform(0.8, 1.5, L))
    s2 = jnp.asarray(r.uniform(0.3, 0.8, L))
    ny = jnp.asarray([0.0, 1.0])
    Z = jnp.asarray(np.sort(r.uniform(0.15, 0.85, (M, L)), axis=0))
    return ls, s2, ny, Z


def test_kuu_velocity_psd_and_blocks(setup):
    ls, s2, ny, Z = setup
    Kmm = velocity.kuu_velocity(ny, Z, ls, s2, jitter=1e-8)
    assert Kmm.shape == (L, 2 * C + M, 2 * C + M)
    np.testing.assert_allclose(
        np.asarray(Kmm), np.asarray(Kmm).transpose(0, 2, 1), atol=1e-12
    )
    eig = np.linalg.eigvalsh(np.asarray(Kmm))
    assert eig.min() > -1e-10, f"not PSD: min eig {eig.min()}"
    # value-value block must equal the vanilla conditioned Gram
    K_vanilla = conditioned.kuu(K.matern52, ny, Z, ls, s2, jitter=0.0)
    np.testing.assert_allclose(
        np.asarray(Kmm[:, C:, C:]) - 1e-8 * np.eye(C + M),
        np.asarray(K_vanilla),
        atol=1e-10,
    )


def test_cross_block_matches_autodiff(setup):
    """cov(f'(s), f(t)) must equal d/ds k(s, t) from autodiff."""
    ls, s2, ny, Z = setup
    Kmm = velocity.kuu_velocity(ny, Z, ls, s2, jitter=0.0)

    def k_scalar(s, t, l_, v_):
        return K.matern52(s[None, None], t[None, None], l_[None], v_[None])[0, 0, 0]

    zy = np.asarray(conditioned.zy(ny, Z))
    for l_ in range(L):
        for i in range(C):
            for j in range(C + M):
                s, t = float(ny[i]), zy[l_, j]
                if abs(s - t) < 1e-9:
                    continue  # abs() kink
                want = jax.grad(k_scalar, argnums=0)(
                    jnp.float64(s), jnp.float64(t), ls[l_], s2[l_]
                )
                got = float(Kmm[l_, i, C + j])
                np.testing.assert_allclose(got, float(want), rtol=1e-6)


def test_paths_clamp_positions_and_velocities(setup):
    ls, s2, ny, Z = setup
    Kmm = velocity.kuu_velocity(ny, Z, ls, s2, jitter=1e-6)
    chol = jnp.linalg.cholesky(Kmm)
    r = np.random.default_rng(3)
    query = jnp.asarray(r.normal(size=(C, L)) * 0.4)
    vel = jnp.zeros((C, L))
    q_mu_full = velocity.extend_q_mu(vel, query, jnp.zeros((M, L)))
    q_sqrt = jnp.eye(M)[None].repeat(L, 0)
    mask = velocity.deriv_mask(C, M)

    state = pathwise.draw_paths(
        jax.random.PRNGKey(0), ny, Z, ls, s2, chol, q_mu_full, q_sqrt,
        48, 4096, deriv_mask=mask,
    )
    # evaluate paths on a fine grid near the endpoints
    h = 1e-3
    X = jnp.asarray([0.0, h, 1.0 - h, 1.0])
    Kuf = velocity.kuf_velocity(ny, Z, X, ls, s2)
    f = pathwise.eval_paths(state, Kuf, X)  # [S, 4, L]
    f = np.asarray(f)
    # positions clamp
    pos_err = np.abs(np.stack([f[:, 0], f[:, 3]], 1) - np.asarray(query)[None])
    assert pos_err.max() < 2e-2, pos_err.max()
    # velocities clamp to ~0: finite differences at both ends
    v0 = (f[:, 1] - f[:, 0]) / h
    v1 = (f[:, 3] - f[:, 2]) / h
    assert np.abs(v0).max() < 0.12, np.abs(v0).max()
    assert np.abs(v1).max() < 0.12, np.abs(v1).max()


def test_velocity_mode_solver_runs():
    """End-to-end: tiny solve with velocity_constrained=True stays finite and
    starts/ends at rest."""
    sess = PlanningSession(
        "franka", "industrial", dtype=jnp.float64,
        overrides=dict(num_steps=10, num_samples=3, num_bases=64,
                       time_spacing_X=12, time_spacing_Xnew=40),
    )
    model = sess.model.replace(velocity_constrained=True)
    starts, goals = sess.queries()
    start, goal = jnp.asarray(starts[0]), jnp.asarray(goals[0])
    pp = sess.planner_params
    params = planner.init_params(
        model, start, goal, lengthscales=pp["lengthscales"],
        variance=pp["variance"], sigma_obs=pp["sigma_obs"], alpha=pp["alpha"],
    )
    cfg = sess.train_config.replace(num_steps=10, time_spacing_X=12, time_spacing_Xnew=40,
                                    num_posterior_samples=8)
    solve = jax.jit(solver.make_single_solver(model, cfg))
    _, res = solve(params, start, goal, jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(res.elbo_history)))
    best = np.asarray(res.best)
    # endpoint velocity ~ 0: first/last steps of the dense trajectory are flat
    dt = 1.0 / 39
    v_start = np.abs(best[1] - best[0]).max() / dt
    v_mid = np.abs(np.diff(best, axis=0)).max() / dt
    assert v_start < 0.35 * max(v_mid, 1e-6) + 0.05
