"""Analytic SVGP posterior marginals for the conditioned parameterization.

Equivalent of GPflow's ``posterior().predict_f`` as used by the reference for
the mean trajectory (``models/vgpmp.py:316``), specialized to whiten=False
with the conditioned mean/scale overrides (``models/vgpmp.py:200-218``):

    mean = Kfuᵀ Kuu^{-1} m,      m = [query_states; q_mu]
    var  = kff_diag - diag(Kfuᵀ Kuu^{-1} Kuf) + diag(Kfuᵀ Kuu^{-1} Λ Λᵀ Kuu^{-1} Kuf)

with Λ the conditioned scale ``chol(Kuu) @ pad(q_sqrt) + jitter-pad``.
Computed in HALF-WHITENED form (round 5): with ``A = L^{-1} Kuf``,

    mean = Aᵀ L^{-1} m
    var  = kff - Σ_m A² + Σ_k (padᵀ A)² + jitter² Σ ((L^{-ᵀ}A)[:C])²

— three tiny triangular solves instead of dense ``Kuu^{-1}``/Λ products, and
every factor is cancellation-free (mirrors ``gp/pathwise.py``'s PathState).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vgpmp_tpu.ops import linalg

__all__ = ["predict_f"]


def predict_f(
    chol_kuu: jnp.ndarray,
    kuf: jnp.ndarray,
    kff_diag: jnp.ndarray,
    q_mu_full: jnp.ndarray,
    q_sqrt: jnp.ndarray,
    jitter: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Marginal mean and variance at the evaluation grid.

    Args:
        chol_kuu: ``[L, Mc, Mc]``; kuf: ``[L, Mc, N]``; kff_diag: ``[L, N]``.
        q_mu_full: ``[Mc, L]`` (query rows first); q_sqrt: ``[L, M, M]``.
    Returns:
        (mean ``[N, L]``, var ``[N, L]``).
    """
    C = chol_kuu.shape[-1] - q_sqrt.shape[-1]
    A = linalg.solve_lower(chol_kuu, kuf)  # L^{-1} Kuf: [L, Mc, N]
    m_w = linalg.solve_lower(chol_kuu, q_mu_full.T[..., None])  # [L, Mc, 1]
    mean = jnp.einsum("lmn,lm->nl", A, m_w[..., 0])
    # Λᵀ Kuu^{-1} Kuf = padᵀ A + jitter (L^{-ᵀ} A)[:C]  (padᵀA rows < C are 0)
    projq = jnp.einsum("lmk,lmn->lkn", jnp.tril(q_sqrt), A[:, C:, :])  # [L, M, N]
    extra = jitter * linalg.solve_upper_T(chol_kuu, A)[:, :C, :]       # [L, C, N]
    var = (
        kff_diag
        - jnp.einsum("lmn,lmn->ln", A, A)
        + jnp.einsum("lkn,lkn->ln", projq, projq)
        + jnp.einsum("lkn,lkn->ln", extra, extra)
    )
    return mean, var.T
