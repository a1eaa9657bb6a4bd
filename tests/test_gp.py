"""GP core tests: kernels, conditioned covariances, KL, pathwise sampler.

Key checks:
- closed-form kernel derivatives vs autodiff (the reference's own technique,
  ``tests/unit_test.py:8-54``);
- conditioned prior KL vs an independent numpy transcription of the
  reference equations (``kullback_leiblers/prior_kl.py:17-35``);
- RFF prior covariance vs the exact Matérn-5/2 Gram (validates spectral
  sampling);
- pathwise sample moments vs the analytic conditioned posterior — the
  decisive correctness test for the decoupled sampler;
- conditioning: sampled paths pass (almost) exactly through the clamped
  start/goal rows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgpmp_tpu.gp import conditioned, kl, pathwise, posterior
from vgpmp_tpu.ops import kernels as K

L, M, C = 3, 6, 2
JITTER = 1e-6


@pytest.fixture(scope="module")
def hypers():
    # module-local deterministic rng: the session-scoped ``rng`` fixture's
    # state depends on test order, which must not change these fixtures
    r = np.random.default_rng(1234)
    ls = jnp.asarray(r.uniform(0.5, 3.0, L))
    s2 = jnp.asarray(r.uniform(0.2, 1.0, L))
    return ls, s2


@pytest.fixture(scope="module")
def inducing():
    r = np.random.default_rng(5678)
    ny = jnp.asarray([0.0, 1.0])
    Z = jnp.asarray(np.sort(r.uniform(0.09, 0.91, (M, L)), axis=0))
    return ny, Z


def test_matern52_matches_reference_formula(rng, hypers):
    ls, s2 = hypers
    x1 = jnp.asarray(rng.uniform(0, 1, (L, 5)))
    x2 = jnp.asarray(rng.uniform(0, 1, (L, 7)))
    got = K.matern52(x1, x2, ls, s2)
    r = np.abs(np.asarray(x1)[:, :, None] - np.asarray(x2)[:, None, :]) / np.asarray(ls)[:, None, None]
    want = np.asarray(s2)[:, None, None] * (1 + np.sqrt(5) * r + 5 / 3 * r**2) * np.exp(-np.sqrt(5) * r)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12)


@pytest.mark.parametrize("name", ["matern52", "se"])
def test_kernel_grads_match_autodiff(rng, hypers, name):
    """First/second closed-form derivatives vs jax autodiff (rtol 1e-5,
    with a small shift off r=0 to dodge the Matérn abs() nondifferentiability —
    same dodge as the reference test (``unit_test.py``)."""
    ls, s2 = hypers
    kfn, gfn, ggfn = K.KERNELS[name]
    x1 = jnp.asarray(rng.uniform(0, 1, (L, 4))) + 1e-5
    x2 = jnp.asarray(rng.uniform(0, 1, (L, 5)))

    def scalar_k(a, b, l_, v_):
        return kfn(a[None, None], b[None, None], l_[None], v_[None])[0, 0, 0]

    got_g = gfn(x1, x2, ls, s2)
    got_gg = ggfn(x1, x2, ls, s2)
    for l_ in range(L):
        for i in range(4):
            for j in range(5):
                a, b = x1[l_, i], x2[l_, j]
                dk = jax.grad(scalar_k, argnums=0)(a, b, ls[l_], s2[l_])
                d2k = jax.grad(jax.grad(scalar_k, argnums=0), argnums=1)(a, b, ls[l_], s2[l_])
                sign = -1.0 if name == "matern52" else 1.0
                # reference sign convention for matern52_grad is -d/dx1
                np.testing.assert_allclose(float(got_g[l_, i, j]), sign * float(dk), rtol=1e-5)
                np.testing.assert_allclose(float(got_gg[l_, i, j]), float(d2k), rtol=1e-5)


def test_kuu_kuf_shapes_and_symmetry(hypers, inducing):
    ls, s2 = hypers
    ny, Z = inducing
    Kuu = conditioned.kuu(K.matern52, ny, Z, ls, s2, jitter=JITTER)
    assert Kuu.shape == (L, C + M, C + M)
    np.testing.assert_allclose(np.asarray(Kuu), np.asarray(Kuu).transpose(0, 2, 1), atol=1e-12)
    chol = jnp.linalg.cholesky(Kuu)
    assert np.all(np.isfinite(np.asarray(chol)))
    X = jnp.linspace(0, 1, 11)
    Kuf = conditioned.kuf(K.matern52, ny, Z, X, ls, s2)
    assert Kuf.shape == (L, C + M, 11)
    # first C rows of Kuf equal k(ny, X)
    ny_b = jnp.broadcast_to(ny, (L, C))
    Xb = jnp.broadcast_to(X, (L, 11))
    np.testing.assert_allclose(
        np.asarray(Kuf[:, :C]), np.asarray(K.matern52(ny_b, Xb, ls, s2)), atol=1e-12
    )


def test_gauss_kl_white_vs_dense(rng):
    q_mu = rng.normal(size=(M, L))
    q_sqrt = np.tril(rng.normal(size=(L, M, M))) + 3 * np.eye(M)
    got = float(kl.gauss_kl_white(jnp.asarray(q_mu), jnp.asarray(q_sqrt)))
    want = 0.0
    for l_ in range(L):
        S = q_sqrt[l_] @ q_sqrt[l_].T
        want += 0.5 * (
            q_mu[:, l_] @ q_mu[:, l_]
            + np.trace(S)
            - M
            - np.linalg.slogdet(S)[1]
        )
    np.testing.assert_allclose(got, want, rtol=1e-10)


def _numpy_prior_kl(Kuu, q_mu, q_sqrt, query):
    """Independent numpy transcription of ``prior_kl.py:17-35``."""
    total = 0.0
    Cc = query.shape[0]
    for l_ in range(Kuu.shape[0]):
        Kl = Kuu[l_]
        Ll = np.linalg.cholesky(Kl)
        p_mu = Kl[:, :Cc] @ np.linalg.solve(Kl[:Cc, :Cc], query[:, l_])
        q_full = np.concatenate([query[:, l_], q_mu[:, l_]])
        w = np.linalg.solve(Ll, q_full - p_mu)[Cc:]
        S = q_sqrt[l_] @ q_sqrt[l_].T
        total += 0.5 * (w @ w + np.trace(S) - (len(q_full) - Cc) - np.linalg.slogdet(S)[1])
    return total


def test_prior_kl_matches_numpy_transcription(rng, hypers, inducing):
    ls, s2 = hypers
    ny, Z = inducing
    Kuu, chol = conditioned.cholesky_kuu(K.matern52, ny, Z, ls, s2, jitter=JITTER)
    q_mu = rng.normal(size=(M, L))
    q_sqrt = np.tril(0.1 * rng.normal(size=(L, M, M))) + np.eye(M)
    query = rng.normal(size=(C, L))
    got = float(
        kl.prior_kl(Kuu, chol, jnp.asarray(q_mu), jnp.asarray(q_sqrt), jnp.asarray(query))
    )
    want = _numpy_prior_kl(np.asarray(Kuu), q_mu, q_sqrt, query)
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_rff_prior_covariance_matches_matern(rng, hypers, inducing):
    """Empirical covariance of Φ(x) w over samples/bases ≈ Matérn Gram."""
    ls, s2 = hypers
    ny, Z = inducing
    Kuu, chol = conditioned.cholesky_kuu(K.matern52, ny, Z, ls, s2, jitter=JITTER)
    Mc = C + M
    q_mu_full = jnp.zeros((Mc, L))
    q_sqrt = jnp.eye(M)[None].repeat(L, 0)
    S, B = 4000, 4096
    state = pathwise.draw_paths(
        jax.random.PRNGKey(0), ny, Z, ls, s2, chol, q_mu_full, q_sqrt, S, B
    )
    X = jnp.linspace(0, 1, 9)
    Xb = jnp.broadcast_to(X, (L, 9))
    phi = pathwise._rff_features(Xb, state.omega, state.phase) * state.rff_scale[..., None]
    f_prior = jnp.einsum("lnb,slb->sln", phi, state.w)  # [S, L, N]
    emp = np.einsum("sln,slm->lnm", np.asarray(f_prior), np.asarray(f_prior)) / S
    exact = np.asarray(K.matern52(Xb, Xb, ls, s2))
    np.testing.assert_allclose(emp, exact, atol=0.12)


def test_pathwise_moments_match_analytic_posterior(rng, hypers, inducing):
    """Decisive test: sample mean/var at X vs ``posterior.predict_f``."""
    ls, s2 = hypers
    ny, Z = inducing
    Kuu, chol = conditioned.cholesky_kuu(K.matern52, ny, Z, ls, s2, jitter=JITTER)
    query = jnp.asarray(rng.normal(size=(C, L)) * 0.5)
    q_mu = jnp.asarray(rng.normal(size=(M, L)) * 0.5)
    q_sqrt = jnp.asarray(np.tril(0.05 * rng.normal(size=(L, M, M))) + 0.3 * np.eye(M))
    q_mu_full = jnp.concatenate([query, q_mu], axis=0)

    X = jnp.linspace(0, 1, 13)
    Kuf = conditioned.kuf(K.matern52, ny, Z, X, ls, s2)
    kff = jnp.broadcast_to(s2[:, None], (L, 13))
    mean, var = posterior.predict_f(chol, Kuf, kff, q_mu_full, q_sqrt, jitter=JITTER)

    S, B = 6000, 8192
    state = pathwise.draw_paths(
        jax.random.PRNGKey(1), ny, Z, ls, s2, chol, q_mu_full, q_sqrt, S, B
    )
    f = pathwise.eval_paths(state, Kuf, X)  # [S, N, L]
    emp_mean = np.mean(np.asarray(f), axis=0)
    emp_var = np.var(np.asarray(f), axis=0)
    np.testing.assert_allclose(emp_mean, np.asarray(mean), atol=0.06)
    np.testing.assert_allclose(emp_var, np.asarray(var), atol=0.08)


def test_paths_clamp_query_states(rng, hypers, inducing):
    """At t=0 and t=1, every sampled path must hit the query states to
    within jitter-level tolerance — the conditioning mechanism."""
    ls, s2 = hypers
    ny, Z = inducing
    Kuu, chol = conditioned.cholesky_kuu(K.matern52, ny, Z, ls, s2, jitter=JITTER)
    query = jnp.asarray(rng.normal(size=(C, L)))
    q_mu_full = jnp.concatenate([query, jnp.zeros((M, L))], axis=0)
    q_sqrt = jnp.eye(M)[None].repeat(L, 0)
    state = pathwise.draw_paths(
        jax.random.PRNGKey(2), ny, Z, ls, s2, chol, q_mu_full, q_sqrt, 64, 2048
    )
    Kuf = conditioned.kuf(K.matern52, ny, Z, ny, ls, s2)
    f_ends = pathwise.eval_paths(state, Kuf, ny)  # [S, 2, L]
    err = np.asarray(f_ends) - np.asarray(query)[None]
    # Clamping softness is EXACTLY -jitter * v at the conditioned rows:
    # f(ny_i) = f_prior + (row_i(Kuu) - jitter e_i)^T v = u_i - jitter v_i,
    # and u_i = query_i (+O(jitter) sampling noise). The magnitude depends on
    # the Gram conditioning (the reference shares this structure at the same
    # jitter); the invariant to test is the identity itself. The state stores
    # half-whitened coefficients a = L^T v, so recover v = L^{-T} a.
    a = np.asarray(state.a)  # [S, L, Mc]
    LT = np.transpose(np.asarray(state.chol), (0, 2, 1))  # [L, Mc, Mc]
    v = np.linalg.solve(LT[None], a[..., None])[..., 0]  # [S, L, Mc]
    predicted = -JITTER * np.transpose(v[..., :C], (0, 2, 1))  # [S, C, L]
    np.testing.assert_allclose(err, predicted, atol=5e-5)
    # and the softness stays below jitter * ||v||_inf (sanity bound)
    assert np.abs(err).max() <= JITTER * np.abs(v).max() * 1.01 + 1e-4


def test_se_kernel_rff_covariance(inducing):
    """SE spectral sampling (Gaussian frequencies) reproduces the SE Gram."""
    ls = jnp.asarray([0.7, 1.3, 2.0])
    s2 = jnp.asarray([0.5, 0.9, 0.4])
    ny, Z = inducing
    Kuu, chol = conditioned.cholesky_kuu(K.squared_exponential, ny, Z, ls, s2, jitter=JITTER)
    q_mu_full = jnp.zeros((C + M, L))
    q_sqrt = jnp.eye(M)[None].repeat(L, 0)
    state = pathwise.draw_paths(
        jax.random.PRNGKey(5), ny, Z, ls, s2, chol, q_mu_full, q_sqrt,
        3000, 4096, kernel="se",
    )
    X = jnp.linspace(0, 1, 7)
    Xb = jnp.broadcast_to(X, (L, 7))
    phi = pathwise._rff_features(Xb, state.omega, state.phase) * state.rff_scale[..., None]
    f_prior = jnp.einsum("lnb,slb->sln", phi, state.w)
    emp = np.einsum("sln,slm->lnm", np.asarray(f_prior), np.asarray(f_prior)) / 3000
    exact = np.asarray(K.squared_exponential(Xb, Xb, ls, s2))
    np.testing.assert_allclose(emp, exact, atol=0.1)


def test_bailey_student_t_distribution():
    """Bailey's closed-form polar sampler must reproduce the Student-t(5)
    distribution that ``jax.random.t`` (gamma-rejection based) draws: matched
    low-order moments and matched empirical quantiles."""
    n = 400_000
    df = 5.0
    x = np.asarray(pathwise.student_t(jax.random.PRNGKey(7), df, (n,), jnp.float64))
    assert np.all(np.isfinite(x))
    # exact t(5) moments: mean 0, var df/(df-2) = 5/3, excess kurtosis 6
    assert abs(x.mean()) < 0.02
    np.testing.assert_allclose(x.var(), df / (df - 2.0), rtol=0.03)
    y = np.asarray(jax.random.t(jax.random.PRNGKey(8), df, (n,), jnp.float64))
    qs = [1, 5, 25, 50, 75, 95, 99]
    np.testing.assert_allclose(
        np.percentile(x, qs), np.percentile(y, qs), atol=0.05
    )


def test_shared_kernel_broadcasting():
    """[1]-shaped hyperparameters broadcast across latents (SharedIndependent
    kernel semantics, reference models/vgpmp.py:132-133)."""
    ls1 = jnp.asarray([1.5])
    s21 = jnp.asarray([0.4])
    x1 = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (3, 4)))
    got = K.matern52(x1, x1, ls1, s21)
    want = K.matern52(x1, x1, jnp.full(3, 1.5), jnp.full(3, 0.4))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)


def test_antithetic_draws_pair_cancellation():
    """Antithetic mode: prior-basis weights come in +/- pairs, so the
    sample-mean of any odd functional of the prior noise is exactly zero."""
    import jax

    from vgpmp_tpu.gp import conditioned, pathwise
    from vgpmp_tpu.ops import kernels as kops

    L, M, S, B = 3, 6, 8, 32
    ny = jnp.asarray([0.0, 1.0])
    Z = jnp.linspace(0.1, 0.9, M)[:, None].repeat(L, axis=1)
    ls = jnp.full((L,), 1.0)
    var = jnp.full((L,), 0.3)
    kfn = kops.KERNELS["matern52"][0]
    _, chol = conditioned.cholesky_kuu(kfn, ny, Z, ls, var, jitter=1e-8)
    q_mu_full = jnp.zeros((M + 2, L))
    q_sqrt = jnp.eye(M)[None].repeat(L, axis=0) * 0.1
    st = pathwise.draw_paths(
        jax.random.PRNGKey(0), ny, Z, ls, var, chol, q_mu_full, q_sqrt,
        S, B, antithetic=True,
    )
    np.testing.assert_allclose(np.asarray(st.w[: S // 2]), -np.asarray(st.w[S // 2:]), atol=1e-12)
    # mean over samples of w (odd functional) is exactly zero
    np.testing.assert_allclose(np.asarray(st.w.mean(axis=0)), 0.0, atol=1e-12)
