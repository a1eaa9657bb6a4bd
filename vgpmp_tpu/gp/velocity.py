"""Velocity-conditioned (first-derivative) inducing structure.

Completes the reference's partially-wired velocity-constraint variant
(``FirstOrderDerivativeInducingPoints``,
``inducing_variables/inducing_variables.py:85-113``; derivative Gram blocks
``covariances/multioutput/Kuus.py:18-41`` and ``Kufs.py:15-24`` — several of
its dispatch paths raise NotImplementedError upstream). The extended inducing
set is

    rows = [ f'(ny) (C rows) ; f(ny) (C rows) ; f(Z) (M rows) ]

so endpoint *velocities* (typically 0) are clamped alongside positions. Gram
blocks use the exact covariances of a differentiated GP:

    cov(f'(s), f'(t)) = d2k/ds dt      (``matern52_grad_grad``)
    cov(f'(s), f(t))  = dk/ds          (= -``matern52_grad`` under its
                                        documented -d/dx1 sign convention)

Everything is PSD by construction (it *is* the joint covariance of (f', f)),
verified in tests together with endpoint-velocity clamping of sampled paths.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from vgpmp_tpu.gp.conditioned import zy as zy_fn
from vgpmp_tpu.ops import kernels as K

__all__ = ["kuu_velocity", "kuf_velocity", "deriv_mask", "extend_q_mu"]


def _cast(solve_dtype, *arrays):
    if solve_dtype is None:
        return arrays
    return tuple(a.astype(solve_dtype) for a in arrays)


def deriv_mask(C: int, M: int) -> jnp.ndarray:
    """``[2C + M]`` bool mask flagging the derivative rows (first C)."""
    return jnp.arange(2 * C + M) < C


def kuu_velocity(
    ny: jnp.ndarray,
    Z: jnp.ndarray,
    lengthscales: jnp.ndarray,
    variance: jnp.ndarray,
    jitter: float = 1e-6,
    solve_dtype=None,
) -> jnp.ndarray:
    """Extended conditioned Gram ``[L, 2C+M, 2C+M]``.

    Block layout (cf. ``covariances/multioutput/Kuus.py:29-38``):
    ``[[K_dd(ny,ny), K_d(ny,Zy)], [K_d(ny,Zy)^T, K(Zy,Zy)]]``.
    """
    ny, Z, lengthscales, variance = _cast(solve_dtype, ny, Z, lengthscales, variance)
    L = Z.shape[-1]
    zy_ = zy_fn(ny, Z)  # [L, C+M]
    ny_b = jnp.broadcast_to(ny, (L, ny.shape[0]))

    k_vv = K.matern52(zy_, zy_, lengthscales, variance)          # [L, C+M, C+M]
    k_dd = K.matern52_grad_grad(ny_b, ny_b, lengthscales, variance)  # [L, C, C]
    # cov(f'(ny), f(Zy)) = dk/ds = -matern52_grad (sign convention)
    k_dv = -K.matern52_grad(ny_b, zy_, lengthscales, variance)   # [L, C, C+M]

    top = jnp.concatenate([k_dd, k_dv], axis=-1)
    bottom = jnp.concatenate([jnp.swapaxes(k_dv, -1, -2), k_vv], axis=-1)
    Kmm = jnp.concatenate([top, bottom], axis=-2)
    return Kmm + jitter * jnp.eye(Kmm.shape[-1], dtype=Kmm.dtype)


def kuf_velocity(
    ny: jnp.ndarray,
    Z: jnp.ndarray,
    X: jnp.ndarray,
    lengthscales: jnp.ndarray,
    variance: jnp.ndarray,
    solve_dtype=None,
) -> jnp.ndarray:
    """Extended cross-covariance ``[L, 2C+M, N]``: derivative rows on top
    (cf. ``covariances/multioutput/Kufs.py:15-24``)."""
    ny, Z, X, lengthscales, variance = _cast(
        solve_dtype, ny, Z, X, lengthscales, variance
    )
    L = Z.shape[-1]
    zy_ = zy_fn(ny, Z)
    ny_b = jnp.broadcast_to(ny, (L, ny.shape[0]))
    Xb = jnp.broadcast_to(X, (L, X.shape[0]))
    k_df = -K.matern52_grad(ny_b, Xb, lengthscales, variance)  # cov(f'(ny), f(X))
    k_vf = K.matern52(zy_, Xb, lengthscales, variance)
    return jnp.concatenate([k_df, k_vf], axis=-2)


def extend_q_mu(
    velocities: jnp.ndarray, query_states: jnp.ndarray, q_mu: jnp.ndarray
) -> jnp.ndarray:
    """``[C,L], [C,L], [M,L] -> [2C+M, L]`` full mean with clamped rows."""
    return jnp.concatenate([velocities, query_states, q_mu], axis=0)
