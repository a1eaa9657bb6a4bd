"""Unrolled small-matrix linalg vs jax.scipy/numpy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgpmp_tpu.ops import linalg


@pytest.fixture(scope="module")
def spd(rng):
    n, batch = 12, 7
    A = rng.normal(size=(batch, n, n))
    K = A @ A.transpose(0, 2, 1) + n * np.eye(n)
    return jnp.asarray(K)


def test_cholesky_unrolled_matches_lax(spd):
    got = linalg.cholesky_unrolled(spd)
    want = jnp.linalg.cholesky(spd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-10)


def test_solve_lower_matches(spd, rng):
    L = jnp.linalg.cholesky(spd)
    B = jnp.asarray(rng.normal(size=(7, 12, 3)))
    got = linalg.solve_lower_unrolled(L, B)
    want = jax.scipy.linalg.solve_triangular(L, B, lower=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-10)


def test_cho_solve_matches(spd, rng):
    L = jnp.linalg.cholesky(spd)
    B = jnp.asarray(rng.normal(size=(7, 12, 5)))
    got = linalg.cho_solve_unrolled(L, B)
    want = jax.scipy.linalg.cho_solve((L, True), B)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-9)
    # residual check
    res = np.asarray(spd @ got - B)
    assert np.abs(res).max() < 1e-8


def test_cholesky_unrolled_nan_on_indefinite():
    K = jnp.asarray(np.diag([1.0, -1.0, 2.0]))[None]
    got = linalg.cholesky_unrolled(K)
    assert np.isnan(np.asarray(got)).any()


def test_grad_flows_through_unrolled(spd):
    def f(K):
        L = linalg.cholesky_unrolled(K)
        return jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))

    g = jax.grad(f)(spd)
    # d/dK logdet(K)/2 = K^{-1}/2 (symmetrized)
    want = 0.5 * jnp.linalg.inv(spd)
    # gradient through cholesky gives the full derivative including the
    # triangular structure; compare symmetrized
    sym = 0.5 * (np.asarray(g) + np.asarray(g).transpose(0, 2, 1))
    np.testing.assert_allclose(sym, np.asarray(want), atol=1e-8)
