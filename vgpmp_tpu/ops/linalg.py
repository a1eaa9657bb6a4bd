"""Unrolled small-matrix linear algebra for the conditioned-Gram hot path.

The planner factorizes thousands of tiny ``(Mc x Mc)`` Grams per step
(Mc = M + 2 is 9-26). XLA's generic ``cholesky``/``triangular_solve`` lower
to sequential LAPACK-style loops that are latency-bound at these sizes —
especially under TPU f64 emulation. Here the factorization and substitutions
are *statically unrolled* over the (compile-time) matrix dimension: every
step is a batched vector op over the ``[..., n]`` row axis, so the whole
factorization is ~n fused VPU passes over the batch.

Correctness is checked against numpy/``jax.scipy`` in tests; the GP core
switches to these automatically for ``n <= MAX_UNROLL``.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "cholesky_unrolled",
    "solve_lower_unrolled",
    "solve_upper_T_unrolled",
    "cho_solve_unrolled",
    "MAX_UNROLL",
]

MAX_UNROLL = 40  # beyond this, unrolling bloats compile time; use lax paths


def cholesky_unrolled(K: jnp.ndarray) -> jnp.ndarray:
    """Batched lower Cholesky of ``[..., n, n]`` via unrolled outer-product
    (Cholesky-Banachiewicz column updates).

    Equivalent to ``jnp.linalg.cholesky`` for SPD input (garbage-in-NaN-out
    semantics preserved: a negative pivot produces NaN via sqrt).
    """
    n = K.shape[-1]
    A = K
    cols = []
    for j in range(n):
        pivot = jnp.sqrt(A[..., j, j])
        col = A[..., :, j] / pivot[..., None]          # [..., n] (rows < j are stale)
        # zero the strictly-upper part of this column
        mask = jnp.arange(n) >= j
        col = jnp.where(mask, col, 0.0)
        cols.append(col)
        # rank-1 downdate of the trailing submatrix
        A = A - col[..., :, None] * col[..., None, :]
    return jnp.stack(cols, axis=-1)


def solve_lower_unrolled(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Forward substitution: solve ``L X = B`` with lower-tri ``L``.

    Shapes: ``L [..., n, n]``, ``B [..., n, k]`` -> ``X [..., n, k]``.
    """
    n = L.shape[-1]
    rows = []
    acc = B
    for i in range(n):
        xi = acc[..., i, :] / L[..., i, i, None]  # [..., k]
        rows.append(xi)
        acc = acc - L[..., :, i, None] * xi[..., None, :]
    return jnp.stack(rows, axis=-2)


def solve_upper_T_unrolled(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Back substitution with the *transpose* of lower-tri ``L``:
    solve ``L^T X = B`` -> ``X [..., n, k]``."""
    n = L.shape[-1]
    rows = [None] * n
    acc = B
    for i in reversed(range(n)):
        xi = acc[..., i, :] / L[..., i, i, None]
        rows[i] = xi
        # L^T has entries L[j, i] at row j<i of column i... subtract from
        # remaining rows j < i: (L^T)[j, :] includes L[i-ish]; concretely
        # acc_j -= L[i, j] * x_i for j < i
        acc = acc - L[..., i, :, None] * xi[..., None, :]
    return jnp.stack(rows, axis=-2)


def cho_solve_unrolled(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve ``(L L^T) X = B`` given the lower Cholesky factor."""
    return solve_upper_T_unrolled(L, solve_lower_unrolled(L, B))


# ------------------------- size-dispatched entry points ----------------------


def chol(K: jnp.ndarray) -> jnp.ndarray:
    """Batched Cholesky; unrolled for small static n, lax otherwise."""
    if K.shape[-1] <= MAX_UNROLL:
        return cholesky_unrolled(K)
    return jnp.linalg.cholesky(K)


def cho_solve(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve ``(L L^T) X = B``; unrolled for small static n."""
    if L.shape[-1] <= MAX_UNROLL:
        return cho_solve_unrolled(L, B)
    import jax.scipy.linalg as jsl

    return jsl.cho_solve((L, True), B)


def solve_lower(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve ``L X = B`` (lower-triangular); unrolled for small static n."""
    if L.shape[-1] <= MAX_UNROLL:
        return solve_lower_unrolled(L, B)
    import jax.scipy.linalg as jsl

    return jsl.solve_triangular(L, B, lower=True)


def solve_upper_T(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve ``L^T X = B`` given lower-tri ``L``; unrolled for small static n."""
    if L.shape[-1] <= MAX_UNROLL:
        return solve_upper_T_unrolled(L, B)
    import jax.scipy.linalg as jsl

    return jsl.solve_triangular(L, B, lower=True, trans=1)
