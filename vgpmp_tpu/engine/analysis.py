"""Post-hoc analysis & debug probes on planner outputs.

Covers the reference's diagnostic surface:

- end-effector path uncertainty from posterior samples
  (``models/vgpmp.py:322-328`` — there a nested Python loop per sample per
  timestep; here one batched FK + variance reduction);
- Jacobian-based per-config EE uncertainty propagation
  (``utils/sampler.py:246-273``);
- ``debug_likelihood`` (``models/vgpmp.py:291-304``) and the SDF-gradient
  probe behind the interactive loop's ``sdf`` command
  (``utils/simulation_manager.py:146-152``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vgpmp_tpu.kinematics.dh import FkModel, fk_frames, sphere_positions
from vgpmp_tpu.likelihoods.collision import CollisionModel
from vgpmp_tpu.models.vgpmp import PlannerModel, PlannerParams, constrain

__all__ = [
    "ee_positions",
    "ee_path_uncertainty",
    "ee_jacobian_uncertainty",
    "debug_likelihood",
    "sdf_gradient_at_config",
]


def ee_positions(fk: FkModel, configs: jnp.ndarray) -> jnp.ndarray:
    """``[..., L] -> [..., 3]`` end-effector (last chain frame) positions."""
    return fk_frames(fk, configs)[..., -1, :3, 3]


def ee_path_uncertainty(fk: FkModel, samples: jnp.ndarray) -> jnp.ndarray:
    """2-sigma EE position spread across posterior samples.

    Args:
        samples: ``[S, N, L]`` constrained joint trajectories.
    Returns:
        ``[N, 3]`` twice the per-axis standard deviation — what the reference
        visualizes as the EE uncertainty tube.
    """
    ee = ee_positions(fk, samples)  # [S, N, 3]
    return 2.0 * jnp.std(ee, axis=0)


def ee_jacobian_uncertainty(
    fk: FkModel, config: jnp.ndarray, config_sigma: jnp.ndarray
) -> jnp.ndarray:
    """First-order propagation of joint-space sigma to EE position sigma.

    ``sigma_pos_k = sqrt(sum_j (dEE_k/dq_j * sigma_j)^2)`` — parity with
    ``sampler.compute_joint_pos_uncertainty`` (``sampler.py:246-273``).
    """
    J = jax.jacfwd(lambda q: ee_positions(fk, q))(config)  # [3, L]
    return jnp.sqrt(jnp.sum((J * config_sigma[None, :]) ** 2, axis=-1))


def debug_likelihood(
    params: PlannerParams, model: PlannerModel, configs: jnp.ndarray
) -> jnp.ndarray:
    """Total collision log-density of given constrained configs ``[..., L]``.

    Parity with ``VGPMP.debug_likelihood`` — used to eyeball the effect of
    sigma_obs / epsilon on the objective at a specific pose.
    """
    c = constrain(params, model.variance_lower)
    return jnp.sum(model.collision.log_prob(configs, c["sigma_obs"]))


def sdf_gradient_at_config(
    collision: CollisionModel, config: jnp.ndarray
) -> jnp.ndarray:
    """Spatial SDF gradient at every collision-sphere center for one config.

    Returns ``[P, 3]`` — the interactive-loop ``sdf`` probe.
    """
    pos = sphere_positions(collision.fk, config)  # [P, 3]
    return jax.vmap(jax.grad(lambda p: collision.scene.distance(p)))(pos)
