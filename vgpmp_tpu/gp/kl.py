"""Conditioned prior KL divergence.

Reimplements the reference's ``prior_kl`` dispatcher
(``kullback_leiblers/prior_kl.py:17-35``) as one batched JAX function:

1. compute the conditioned prior mean at the inducing locations,
   ``p_mu = K[:, :C] @ K[:C, :C]^{-1} @ query_states``;
2. whiten the full variational mean shift with ``L = chol(Kuu)``;
3. drop the C conditioned rows and evaluate the whitened Gaussian KL
   against a standard-normal prior (GPflow ``gauss_kl`` with K=None).

Everything is batched over L latent GPs; the per-latent (Mc x Mc) Cholesky
is shared with the pathwise sampler by passing it in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vgpmp_tpu.ops import linalg

__all__ = ["gauss_kl_white", "prior_kl"]


def gauss_kl_white(q_mu: jnp.ndarray, q_sqrt: jnp.ndarray) -> jnp.ndarray:
    """KL( N(q_mu, q_sqrt q_sqrtᵀ) || N(0, I) ), summed over latents.

    Args:
        q_mu: ``[M, L]`` whitened means.
        q_sqrt: ``[L, M, M]`` lower-triangular scale factors.
    """
    M = q_mu.shape[0]
    tril = jnp.tril(q_sqrt)
    mahal = jnp.sum(q_mu * q_mu)
    trace = jnp.sum(tril * tril)
    diag = jnp.abs(jnp.diagonal(tril, axis1=-2, axis2=-1))
    logdet = 2.0 * jnp.sum(jnp.log(diag))
    const = q_mu.shape[0] * q_mu.shape[1]
    return 0.5 * (mahal + trace - const - logdet)


def prior_kl(
    kuu: jnp.ndarray,
    chol_kuu: jnp.ndarray,
    q_mu: jnp.ndarray,
    q_sqrt: jnp.ndarray,
    query_states: jnp.ndarray,
) -> jnp.ndarray:
    """Conditioned prior KL (parity: ``prior_kl.py:17-35``).

    Args:
        kuu: ``[L, Mc, Mc]`` conditioned Gram (Mc = C + M).
        chol_kuu: its Cholesky.
        q_mu: ``[M, L]`` free variational means (latent space).
        q_sqrt: ``[L, M, M]`` free lower-triangular factors.
        query_states: ``[C, L]`` latent-space start/goal rows.
    """
    C = query_states.shape[0]
    # p_mu = K[..., :C] @ (K_CC)^{-1} @ query  per latent: [L, Mc, 1]
    q_t = query_states.T[..., None]  # [L, C, 1]
    p_mu = kuu[..., :C] @ linalg.cho_solve(chol_kuu[..., :C, :C], q_t)
    q_mu_full = jnp.concatenate([query_states, q_mu], axis=0)  # [Mc, L]
    diff = q_mu_full.T[..., None] - p_mu  # [L, Mc, 1]
    whitened = linalg.solve_lower(chol_kuu, diff)
    whitened = whitened[..., C:, 0].T  # [M, L]
    return gauss_kl_white(whitened, q_sqrt)
