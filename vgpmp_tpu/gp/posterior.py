"""Analytic SVGP posterior marginals for the conditioned parameterization.

Equivalent of GPflow's ``posterior().predict_f`` as used by the reference for
the mean trajectory (``models/vgpmp.py:316``), specialized to whiten=False
with the conditioned mean/scale overrides (``models/vgpmp.py:200-218``):

    mean = Kfuᵀ Kuu^{-1} m,      m = [query_states; q_mu]
    var  = kff_diag - diag(Kfuᵀ Kuu^{-1} Kuf) + diag(Kfuᵀ Kuu^{-1} Λ Λᵀ Kuu^{-1} Kuf)

with Λ the conditioned scale from :func:`vgpmp_tpu.gp.pathwise.whitened_scale`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vgpmp_tpu.ops import linalg

from vgpmp_tpu.gp.pathwise import whitened_scale

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
    A = linalg.cho_solve(chol_kuu, kuf)  # Kuu^{-1} Kuf: [L, Mc, N]
    mean = jnp.einsum("lmn,ml->nl", A, q_mu_full)
    lam = whitened_scale(chol_kuu, q_sqrt, jitter)  # [L, Mc, Mc]
    proj = jnp.einsum("lmk,lmn->lkn", lam, A)  # Λᵀ Kuu^{-1} Kuf: [L, Mc, N]
    var = (
        kff_diag
        - jnp.einsum("lmn,lmn->ln", kuf, A)
        + jnp.einsum("lkn,lkn->ln", proj, proj)
    )
    return mean, var.T
