"""Conditioned-inducing-set covariance assembly.

The reference clamps trajectory start/goal by *conditioning the inducing set*:
the effective inducing inputs are ``Zy = [ny; Z]`` where ``ny`` are two fixed
timesteps (t=0, t=1) whose function values are pinned to the query states
(``inducing_variables/inducing_variables.py:50-82``). The covariance ops here
assemble the corresponding Gram blocks, batched over L latent GPs in a single
fused program (vs the reference's per-latent Python loop + ``tf.stack``,
``kernel_conditioning/multioutput/cond_kernel.py:18-26``; block layout per
``covariances/multioutput/Kuus.py:44-55`` and ``Kufs.py:26-36``).

Shapes: ``C`` conditioned timesteps (2), ``M`` trainable inducing points,
``L`` latents; ``Mc = C + M``.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from vgpmp_tpu.ops import linalg

__all__ = ["zy", "kuu", "kuf", "cholesky_kuu"]

KernelFn = Callable[..., jnp.ndarray]  # (x1 [L,A], x2 [L,B], l, s2) -> [L,A,B]


def zy(ny: jnp.ndarray, Z: jnp.ndarray) -> jnp.ndarray:
    """Conditioned inducing inputs per latent: ``[C], [M, L] -> [L, C+M]``.

    ``ny`` is shared across latents (t=0, t=1); ``Z`` is per-latent trainable
    (column l of the reference's [M, L] inducing matrix, consumed per latent
    as ``Z[..., idx]``; ``cond_kernel.py:22-25``).
    """
    L = Z.shape[-1]
    ny_b = jnp.broadcast_to(ny, (L, ny.shape[0]))
    return jnp.concatenate([ny_b, Z.T], axis=-1)


def kuu(
    kernel: KernelFn,
    ny: jnp.ndarray,
    Z: jnp.ndarray,
    lengthscales: jnp.ndarray,
    variance: jnp.ndarray,
    jitter: float = 1e-6,
    solve_dtype=None,
) -> jnp.ndarray:
    """Conditioned Gram ``[L, Mc, Mc]`` with jitter on the diagonal.

    ``solve_dtype`` (default: input dtype) upcasts the assembly — on TPU the
    conditioned Gram is too ill-conditioned for f32 Cholesky (long
    lengthscales over [0,1] give cond ~1e7-1e9), so the planner assembles and
    factorizes these tiny [L, Mc, Mc] matrices in emulated f64 while all bulk
    tensors stay f32. See models/vgpmp.py.
    """
    if solve_dtype is not None:
        ny = ny.astype(solve_dtype)
        Z = Z.astype(solve_dtype)
        lengthscales = lengthscales.astype(solve_dtype)
        variance = variance.astype(solve_dtype)
    zy_ = zy(ny, Z)
    K = kernel(zy_, zy_, lengthscales, variance)
    return K + jitter * jnp.eye(K.shape[-1], dtype=K.dtype)


def kuf(
    kernel: KernelFn,
    ny: jnp.ndarray,
    Z: jnp.ndarray,
    X: jnp.ndarray,
    lengthscales: jnp.ndarray,
    variance: jnp.ndarray,
    solve_dtype=None,
) -> jnp.ndarray:
    """Cross-covariance ``k(Zy, X)``: ``[L, Mc, N]``.

    ``X`` is the shared scalar time grid ``[N]`` (the reference carries it as
    N x dof with identical columns and slices column l per latent;
    ``miscellaneous.py:115-127``).
    """
    if solve_dtype is not None:
        ny = ny.astype(solve_dtype)
        Z = Z.astype(solve_dtype)
        X = X.astype(solve_dtype)
        lengthscales = lengthscales.astype(solve_dtype)
        variance = variance.astype(solve_dtype)
    L = Z.shape[-1]
    Xb = jnp.broadcast_to(X, (L, X.shape[0]))
    return kernel(zy(ny, Z), Xb, lengthscales, variance)


def cholesky_kuu(
    *args, escalations: int = 0, with_info: bool = False, **kwargs
) -> Tuple[jnp.ndarray, ...]:
    """Convenience: (Kuu, chol(Kuu)) — both ``[L, Mc, Mc]``.

    ``escalations``: Cholesky-failure sanitizer — if the factorization
    produces non-finite values, retry with 10x (then 100x, ...) jitter, as a
    compiled ``where``-select chain (each retry is one extra tiny batched
    Cholesky; no host round-trip). The reference has no equivalent guard —
    a failed Cholesky NaNs its whole step silently.

    ``with_info``: also return the number of latent rows whose factorization
    needed at least one escalation (int32 scalar) — escalation *telemetry*,
    surfaced per step by ``elbo_with_aux`` so runs can report when the
    sanitizer actually fired instead of hiding it.
    """
    K = kuu(*args, **kwargs)
    chol = linalg.chol(K)
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)
    jitter = kwargs.get("jitter", 1e-6)
    ever_bad = jnp.zeros((K.shape[0],), dtype=bool)
    for e in range(escalations):
        bad = ~jnp.all(jnp.isfinite(chol), axis=(-2, -1))  # [L]
        ever_bad = ever_bad | bad
        K_retry = K + (10.0 ** (e + 1)) * jitter * eye
        chol_retry = linalg.chol(K_retry)
        chol = jnp.where(bad[:, None, None], chol_retry, chol)
        K = jnp.where(bad[:, None, None], K_retry, K)
    if with_info:
        return K, chol, jnp.sum(ever_bad.astype(jnp.int32))
    return K, chol
