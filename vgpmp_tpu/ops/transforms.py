"""Parameter bijectors: unconstrained optimization space <-> constrained space.

Functional JAX equivalents of the GPflow/TFP transforms the reference model
relies on: ``positive`` softplus with lower bound (kernel variance
``models/vgpmp.py:139``, sigma_obs ``likelihood.py:41``, alpha
``models/vgpmp.py:82``), ``Sigmoid(low, high)`` box bounds (inducing locations
``models/vgpmp.py:29-42``, joint limits ``likelihood.py:49-52``), and the
``triangular`` lower-triangular constraint on q_sqrt (``models/vgpmp.py:263``).

All transforms are stateless pairs ``forward(u) -> c`` / ``inverse(c) -> u``;
optimizers step in unconstrained space and the model applies ``forward``
inside the jitted loss, exactly mirroring GPflow Parameter semantics.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "softplus",
    "softplus_inverse",
    "positive",
    "positive_inverse",
    "sigmoid_box",
    "sigmoid_box_inverse",
    "lower_triangular",
]


def softplus(x):
    return jnp.logaddexp(x, 0.0)


def softplus_inverse(y):
    # log(expm1(y)), stable for large y: y + log1p(-exp(-y))
    y = jnp.asarray(y)
    return y + jnp.log(-jnp.expm1(-y))


def positive(u, lower: float = 0.0):
    """Unconstrained -> (lower, inf), GPflow ``positive(lower)`` semantics."""
    return softplus(u) + lower


def positive_inverse(c, lower: float = 0.0):
    return softplus_inverse(c - lower)


def sigmoid_box(u, low, high):
    """Unconstrained -> (low, high) via scaled logistic (TFP Sigmoid(low, high))."""
    return low + (high - low) * jnp.reciprocal(1.0 + jnp.exp(-u))


def sigmoid_box_inverse(c, low, high):
    t = (c - low) / (high - low)
    return jnp.log(t) - jnp.log1p(-t)


def lower_triangular(u):
    """Project a square (or batch of square) matrices to lower-triangular."""
    return jnp.tril(u)


# numpy twins for offline initialization code
def sigmoid_box_inverse_np(c, low, high):
    t = (np.asarray(c) - low) / (high - low)
    return np.log(t) - np.log1p(-t)


def positive_inverse_np(c, lower: float = 0.0):
    y = np.asarray(c, dtype=np.float64) - lower
    return y + np.log1p(-np.exp(-y))
