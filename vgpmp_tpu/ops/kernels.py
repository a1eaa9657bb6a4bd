"""Stationary kernels over scalar inputs, batched per latent GP.

The planner places one independent GP per joint over scalar time
(``models/vgpmp.py:135-142`` in the reference), so every kernel here is
vectorized over a leading latent axis L with per-latent hyperparameters:
inputs ``[L, A]`` x ``[L, B]`` -> Gram ``[L, A, B]``. That layout maps the
whole multi-joint Gram assembly onto one fused XLA program instead of the
reference's per-kernel Python loop + ``tf.stack``
(``kernel_conditioning/multioutput/cond_kernel.py:18-26``).

Closed-form first/second input-derivatives reimplement
``derivatives/first_order.py:17-43`` and ``derivatives/second_order.py:23-63``
(used by velocity-constrained inducing variants), verified against autodiff in
tests — the reference's own test technique (``tests/unit_test.py``).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "matern52",
    "matern52_grad",
    "matern52_grad_grad",
    "squared_exponential",
    "se_grad",
    "se_grad_grad",
    "KERNELS",
]

SQRT_5 = 2.2360679774997898
FIVE_THIRDS = 5.0 / 3.0


def _pairwise_diff(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """``[L, A] x [L, B] -> [L, A, B]`` signed differences."""
    return x1[..., :, None] - x2[..., None, :]


def _bcast_hyp(h: jnp.ndarray) -> jnp.ndarray:
    """Per-latent hyperparameter ``[L]`` (or scalar) -> broadcastable [L,1,1]."""
    h = jnp.asarray(h)
    if h.ndim == 0:
        return h
    return h[..., None, None]


def matern52(x1, x2, lengthscales, variance) -> jnp.ndarray:
    """Matérn-5/2: ``k(r) = s2 (1 + √5 r/l + 5 r²/(3 l²)) exp(-√5 r/l)``."""
    l = _bcast_hyp(lengthscales)
    s2 = _bcast_hyp(variance)
    r = jnp.abs(_pairwise_diff(x1, x2)) / l
    s5r = SQRT_5 * r
    return s2 * (1.0 + s5r + (5.0 / 3.0) * r * r) * jnp.exp(-s5r)


def matern52_grad(x1, x2, lengthscales, variance) -> jnp.ndarray:
    """∂k/∂x1 for Matérn-5/2 (parity: ``first_order.py:20-27``).

    ``dk/dx1 = -s2 * 5/3 * (1 + √5 r/l) exp(-√5 r/l) * diff / l²``
    with ``diff = x1 - x2``; the reference returns the negated product
    (its ``-dkernel_dr_over_r * dr_dXn_times_r``), i.e. a positive slope for
    x1 < x2 — we match that sign convention exactly.
    """
    l = _bcast_hyp(lengthscales)
    s2 = _bcast_hyp(variance)
    diff = _pairwise_diff(x1, x2)
    s5r = SQRT_5 * jnp.abs(diff) / l
    return s2 * FIVE_THIRDS * (1.0 + s5r) * jnp.exp(-s5r) * diff / (l * l)


def matern52_grad_grad(x1, x2, lengthscales, variance) -> jnp.ndarray:
    """∂²k/∂x1∂x2 for Matérn-5/2 (parity: ``second_order.py:23-45``).

    ``= -s2 * 5/3 * (5 r² - √5 r - 1) exp(-√5 r) / l²`` with ``r = |diff|/l``;
    the removable r=0 singularity evaluates to ``s2 * 5/(3 l²)``. Unlike the
    reference's ``tf.where(res == 0, ...)`` patch (which drops the variance
    factor), we compute the exact limit.
    """
    l = _bcast_hyp(lengthscales)
    s2 = _bcast_hyp(variance)
    diff = _pairwise_diff(x1, x2)
    r = jnp.abs(diff) / l
    s5r = SQRT_5 * r
    return -s2 * FIVE_THIRDS * (5.0 * r * r - s5r - 1.0) * jnp.exp(-s5r) / (l * l)


def squared_exponential(x1, x2, lengthscales, variance) -> jnp.ndarray:
    l = _bcast_hyp(lengthscales)
    s2 = _bcast_hyp(variance)
    diff = _pairwise_diff(x1, x2)
    return s2 * jnp.exp(-0.5 * (diff / l) ** 2)


def se_grad(x1, x2, lengthscales, variance) -> jnp.ndarray:
    """∂k/∂x1 for SE — note the reference's sign convention
    (``first_order.py:13-17``): it returns ``+diff/l² * k`` which is the
    *negative* of the true derivative; kept mathematically correct here
    (−diff/l² k is d/dx1), with the reference sign available by negation."""
    l = _bcast_hyp(lengthscales)
    diff = _pairwise_diff(x1, x2)
    return -(diff / (l * l)) * squared_exponential(x1, x2, lengthscales, variance)


def se_grad_grad(x1, x2, lengthscales, variance) -> jnp.ndarray:
    """∂²k/∂x1∂x2 for SE: ``(l² - diff²)/l⁴ * k`` (``second_order.py:47-58``)."""
    l = _bcast_hyp(lengthscales)
    diff = _pairwise_diff(x1, x2)
    return (l * l - diff * diff) / (l ** 4) * squared_exponential(
        x1, x2, lengthscales, variance
    )


KERNELS = {
    "matern52": (matern52, matern52_grad, matern52_grad_grad),
    "se": (squared_exponential, se_grad, se_grad_grad),
}
