"""vGPMP planner model: variational state, MC-ELBO, posterior extraction.

TPU-native reimplementation of the reference ``VGPMP`` model
(``gpflow_vgpmp/models/vgpmp.py:59-339``) as pure functions over explicit
pytrees:

- :class:`PlannerParams` holds the *unconstrained* trainable leaves (GPflow
  Parameter semantics: optimizers step in unconstrained space, transforms are
  applied inside the loss);
- :class:`PlannerModel` holds static hyperparameters + per-problem constants;
- :func:`elbo` mirrors ``VGPMP.elbo`` (``models/vgpmp.py:265-289``): S
  decoupled posterior samples -> joint sigmoid -> collision log-prob, minus
  the conditioned prior KL, with the likelihood term scaled by alpha;
- :func:`sample_from_posterior` mirrors ``models/vgpmp.py:313-339``.

Everything here is single-problem; the engine layer vmaps/shards over a
problem batch and runs the whole Adam loop in one ``lax.scan``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from vgpmp_tpu.gp import conditioned, kl, pathwise, posterior, velocity
from vgpmp_tpu.likelihoods.collision import (
    CollisionModel,
    joint_sigmoid,
    joint_sigmoid_inverse,
)
from vgpmp_tpu.ops import kernels as kernel_ops
from vgpmp_tpu.ops import transforms as tf_ops

__all__ = ["PlannerParams", "PlannerModel", "init_params", "elbo", "sample_from_posterior"]

# transform lower bounds (GPflow positive(lower) shifts), matching the
# reference parameterization sites
VARIANCE_LOWER = 1e-1      # kernel variance, models/vgpmp.py:139
SIGMA_OBS_LOWER = 1e-5     # likelihood.py:30,41
ALPHA_LOWER = 1e-4         # models/vgpmp.py:82
Z_LOW, Z_HIGH = 0.09, 0.91  # models/vgpmp.py:37-42


@struct.dataclass
class PlannerParams:
    """Unconstrained trainable state (one problem)."""

    q_mu: jnp.ndarray          # [M, L] latent-space mean (no transform)
    q_sqrt: jnp.ndarray        # [L, M, M] lower-tri via tril projection
    lengthscales_u: jnp.ndarray  # [L] softplus
    variance_u: jnp.ndarray    # [L] softplus + 0.1
    z_u: jnp.ndarray           # [M, L] sigmoid box (0.09, 0.91)
    sigma_obs_u: jnp.ndarray   # [P] softplus + 1e-5
    alpha_u: jnp.ndarray       # [] softplus + 1e-4


@struct.dataclass
class PlannerModel:
    """Static configuration + per-(robot, scene) constants."""

    collision: CollisionModel
    ny: jnp.ndarray            # [C] conditioned timesteps (0, 1)
    limits_low: jnp.ndarray    # [L] joint sigmoid bounds
    limits_high: jnp.ndarray   # [L]
    num_samples: int = struct.field(pytree_node=False, default=7)
    num_bases: int = struct.field(pytree_node=False, default=1024)
    num_inducing: int = struct.field(pytree_node=False, default=14)
    jitter: float = struct.field(pytree_node=False, default=1e-6)
    # dtype for the conditioned-Gram linalg island (Cholesky + solves).
    # f32 TPU runs need f64 here (requires jax_enable_x64): the Gram's
    # condition number (1e7-1e9 at benchmark lengthscales) exceeds f32
    # headroom and the Cholesky NaNs out. None -> use the bulk dtype.
    solve_dtype: object = struct.field(pytree_node=False, default=None)
    # clamp endpoint velocities (first-derivative conditioning) in addition
    # to positions — the reference's partially-wired
    # FirstOrderDerivativeInducingPoints variant, completed (gp/velocity.py).
    # Endpoint velocities are fixed to zero (the reference initializes them
    # to ~N(1e-5, 1e-5), i.e. effectively zero; models/vgpmp.py:72-73).
    velocity_constrained: bool = struct.field(pytree_node=False, default=False)
    # Cholesky-failure sanitizer: number of 10x-jitter escalation retries
    # compiled into the Gram factorization (see gp/conditioned.cholesky_kuu)
    jitter_escalations: int = struct.field(pytree_node=False, default=0)
    # stationary prior kernel: 'matern52' (reference default) or 'se'
    kernel: str = struct.field(pytree_node=False, default="matern52")
    # antithetic pathwise draws (+g/-g pairs): halves MC-gradient variance at
    # equal sample budget; the reference draws i.i.d. samples
    antithetic: bool = struct.field(pytree_node=False, default=False)
    # lower bound of the kernel-variance positive() transform. The reference
    # hard-codes 0.1 (models/vgpmp.py:139) — but two of its own problemsets
    # initialize variance at or below that bound (wam/lab 0.05, ur10
    # industrial 0.1), which makes the inverse transform NaN/-inf. We default
    # to min(0.1, variance_init/2), set by the session.
    variance_lower: float = struct.field(pytree_node=False, default=VARIANCE_LOWER)

    @property
    def num_latent(self) -> int:
        return self.limits_low.shape[0]


def constrain(params: PlannerParams, variance_lower: float = VARIANCE_LOWER) -> dict:
    """Apply all bijectors: unconstrained leaves -> model-space values."""
    return {
        "q_mu": params.q_mu,
        "q_sqrt": jnp.tril(params.q_sqrt),
        "lengthscales": tf_ops.positive(params.lengthscales_u),
        "variance": tf_ops.positive(params.variance_u, variance_lower),
        "Z": tf_ops.sigmoid_box(params.z_u, Z_LOW, Z_HIGH),
        "sigma_obs": tf_ops.positive(params.sigma_obs_u, SIGMA_OBS_LOWER),
        "alpha": tf_ops.positive(params.alpha_u, ALPHA_LOWER),
    }


def init_params(
    model: PlannerModel,
    start: np.ndarray,
    goal: np.ndarray,
    lengthscales,
    variance: float,
    sigma_obs: float,
    alpha: float,
    interpolation: str = "linear",
    waypoint: np.ndarray | None = None,
) -> PlannerParams:
    """Initialize the variational state for one problem.

    Mirrors ``VGPMP.initialize`` (``models/vgpmp.py:84-198``): q_sqrt
    identity, Z an even grid in (0.1, 0.9), and q_mu per ``interpolation``
    (the reference's ``interpolation_method``, ``models/vgpmp.py:164-177``):

    - ``'linear'`` (default): start -> goal interpolation over M rows;
    - ``'zeros'``: latent zeros (mid-range joint values after the sigmoid);
    - ``'waypoint'``: start -> waypoint -> goal piecewise-linear; ``waypoint``
      defaults to the midpoint (the reference hard-codes 0.5 blending).
    """
    L = model.num_latent
    M = model.num_inducing
    P = model.collision.fk.sphere_radii.shape[0]
    lo, hi = model.limits_low, model.limits_high
    dtype = lo.dtype  # explicit: under x64 the default would promote to f64

    start = jnp.asarray(start, dtype=dtype)
    goal = jnp.asarray(goal, dtype=dtype)
    if interpolation == "linear":
        frac = jnp.arange(M, dtype=dtype)[:, None] / M
        q_mu_c = start[None, :] + (goal - start)[None, :] * frac
        q_mu = joint_sigmoid_inverse(q_mu_c, lo, hi)
    elif interpolation == "zeros":
        q_mu = jnp.zeros((M, L), dtype=dtype)
    elif interpolation == "waypoint":
        wp = (
            jnp.asarray(waypoint, dtype=dtype)
            if waypoint is not None
            else 0.5 * (start + goal)
        )
        frac = jnp.arange(M, dtype=dtype)[:, None] / max(M - 1, 1)
        first = start[None, :] + (wp - start)[None, :] * jnp.minimum(frac * 2, 1.0)
        q_mu_c = jnp.where(
            frac < 0.5, first,
            wp[None, :] + (goal - wp)[None, :] * jnp.maximum(frac * 2 - 1.0, 0.0),
        )
        q_mu = joint_sigmoid_inverse(q_mu_c, lo, hi)
    else:
        raise ValueError(f"unknown q_mu interpolation {interpolation!r}")

    z_grid = jnp.linspace(0.1, 0.9, M, dtype=dtype)[:, None].repeat(L, axis=1)
    return PlannerParams(
        q_mu=q_mu,
        q_sqrt=jnp.eye(M, dtype=dtype)[None].repeat(L, axis=0),
        lengthscales_u=tf_ops.positive_inverse(jnp.asarray(lengthscales, dtype=q_mu.dtype)),
        variance_u=tf_ops.positive_inverse(
            jnp.full((L,), variance, dtype=q_mu.dtype), model.variance_lower
        ),
        z_u=tf_ops.sigmoid_box_inverse(z_grid, Z_LOW, Z_HIGH),
        sigma_obs_u=tf_ops.positive_inverse(
            jnp.full((P,), sigma_obs, dtype=q_mu.dtype), SIGMA_OBS_LOWER
        ),
        alpha_u=tf_ops.positive_inverse(jnp.asarray(alpha, dtype=q_mu.dtype), ALPHA_LOWER),
    )


@jax.jit
def init_params_batch(
    model: PlannerModel,
    starts: jnp.ndarray,      # [B, L] constrained joint space
    goals: jnp.ndarray,       # [B, L]
    mode_ids: jnp.ndarray,    # [B] int32: 0=linear, 1=zeros, 2=waypoint
    waypoints: jnp.ndarray,   # [B, L] via-points (used where mode_ids == 2)
    lengthscales: jnp.ndarray,
    variance: jnp.ndarray,
    sigma_obs: jnp.ndarray,
    alpha: jnp.ndarray,
) -> PlannerParams:
    """Batched :func:`init_params` with the q_mu init mode as DATA.

    One jitted program initializes a whole problem batch with per-row init
    modes — all three q_mu variants are computed (cheap ``[M, L]`` math) and
    selected per row. This exists because the adaptive restart engine packs
    heterogeneous init modes into one batch every round, and building inits
    eagerly (one vmap'd ``init_params`` per mode group) costs seconds per op
    through the remote-TPU dispatch tunnel — measured 40+ s/round of pure
    init overhead vs ~1 ms for this fused program.
    """
    L = model.num_latent
    M = model.num_inducing
    P = model.collision.fk.sphere_radii.shape[0]
    lo, hi = model.limits_low, model.limits_high
    dtype = lo.dtype
    B = starts.shape[0]
    starts = starts.astype(dtype)
    goals = goals.astype(dtype)
    waypoints = waypoints.astype(dtype)

    frac_lin = jnp.arange(M, dtype=dtype)[None, :, None] / M          # [1,M,1]
    lin = starts[:, None, :] + (goals - starts)[:, None, :] * frac_lin
    frac_wp = jnp.arange(M, dtype=dtype)[None, :, None] / max(M - 1, 1)
    first = starts[:, None, :] + (waypoints - starts)[:, None, :] * jnp.minimum(
        frac_wp * 2, 1.0
    )
    second = waypoints[:, None, :] + (goals - waypoints)[:, None, :] * jnp.maximum(
        frac_wp * 2 - 1.0, 0.0
    )
    way = jnp.where(frac_wp < 0.5, first, second)

    mid = jnp.broadcast_to(mode_ids[:, None, None], (B, M, L))
    q_mu_c = jnp.where(mid == 0, lin, way)  # constrained-space candidates
    q_mu = jnp.where(
        mid == 1,
        jnp.zeros((B, M, L), dtype),
        joint_sigmoid_inverse(q_mu_c, lo, hi),
    )

    z_grid = jnp.linspace(0.1, 0.9, M, dtype=dtype)[:, None].repeat(L, axis=1)
    rep = lambda x: jnp.broadcast_to(x, (B,) + x.shape)
    return PlannerParams(
        q_mu=q_mu,
        q_sqrt=rep(jnp.eye(M, dtype=dtype)[None].repeat(L, axis=0)),
        lengthscales_u=rep(
            tf_ops.positive_inverse(jnp.asarray(lengthscales, dtype=dtype))
        ),
        variance_u=rep(tf_ops.positive_inverse(
            jnp.full((L,), variance, dtype=dtype), model.variance_lower
        )),
        z_u=rep(tf_ops.sigmoid_box_inverse(z_grid, Z_LOW, Z_HIGH)),
        sigma_obs_u=rep(tf_ops.positive_inverse(
            jnp.full((P,), sigma_obs, dtype=dtype), SIGMA_OBS_LOWER
        )),
        alpha_u=rep(
            tf_ops.positive_inverse(jnp.asarray(alpha, dtype=dtype), ALPHA_LOWER)
        ),
    )


def query_latent(model: PlannerModel, start: jnp.ndarray, goal: jnp.ndarray) -> jnp.ndarray:
    """Start/goal rows in latent space: ``[C, L]`` (``models/vgpmp.py:75-76``)."""
    q = jnp.stack([start, goal], axis=0)
    return joint_sigmoid_inverse(q, model.limits_low, model.limits_high)


def _kernel_fn(model: PlannerModel):
    return kernel_ops.KERNELS[model.kernel][0]


def _gram(model: PlannerModel, c: dict, with_info: bool = False):
    if model.velocity_constrained:
        assert model.kernel == "matern52", "velocity conditioning supports matern52 only"
        Kuu = velocity.kuu_velocity(
            model.ny, c["Z"], c["lengthscales"], c["variance"],
            jitter=model.jitter, solve_dtype=model.solve_dtype,
        )
        from vgpmp_tpu.ops import linalg as _lin

        chol = _lin.chol(Kuu)
        if with_info:
            return Kuu, chol, jnp.zeros((), jnp.int32)
        return Kuu, chol
    return conditioned.cholesky_kuu(
        _kernel_fn(model), model.ny, c["Z"], c["lengthscales"], c["variance"],
        jitter=model.jitter, solve_dtype=model.solve_dtype,
        escalations=model.jitter_escalations, with_info=with_info,
    )


def _kuf(model: PlannerModel, c: dict, X: jnp.ndarray) -> jnp.ndarray:
    if model.velocity_constrained:
        return velocity.kuf_velocity(
            model.ny, c["Z"], X, c["lengthscales"], c["variance"],
            solve_dtype=model.solve_dtype,
        )
    return conditioned.kuf(
        _kernel_fn(model), model.ny, c["Z"], X, c["lengthscales"], c["variance"],
        solve_dtype=model.solve_dtype,
    )


def _q_mu_full(model: PlannerModel, c: dict, q_lat: jnp.ndarray) -> jnp.ndarray:
    if model.velocity_constrained:
        zeros_vel = jnp.zeros_like(q_lat)
        return velocity.extend_q_mu(zeros_vel, q_lat, c["q_mu"])
    return jnp.concatenate([q_lat, c["q_mu"]], axis=0)


def _deriv_mask(model: PlannerModel):
    if model.velocity_constrained:
        return velocity.deriv_mask(model.ny.shape[0], model.num_inducing)
    return None


def elbo(
    params: PlannerParams,
    model: PlannerModel,
    start: jnp.ndarray,
    goal: jnp.ndarray,
    X: jnp.ndarray,
    key: jax.Array,
    sample_axis: str | None = None,
    sigma_scale: jnp.ndarray | float = 1.0,
) -> jnp.ndarray:
    """Monte-Carlo ELBO (parity: ``models/vgpmp.py:265-289``).

    ``sigma_scale``: multiplier on sigma_obs for continuation/annealing
    schedules (1.0 = the exact reference objective). Softening the collision
    penalty early and tightening geometrically avoids hinge-plateau local
    minima at a fixed step budget; see ``TrainConfig.sigma_anneal``.

    ``sample_axis``: when running under ``shard_map`` with the MC-sample axis
    sharded across devices, pass the mesh axis name — each device draws
    ``model.num_samples`` *local* samples (the caller folds the axis index
    into ``key``) and the sample-mean of the likelihood is psum-averaged over
    the axis. Gradients of the collective are handled by JAX automatically,
    so the whole training step stays one SPMD program.
    """
    c = constrain(params, model.variance_lower)
    q_lat = query_latent(model, start, goal)
    Kuu, chol = _gram(model, c)
    q_mu_full = _q_mu_full(model, c, q_lat)

    state = pathwise.draw_paths(
        key, model.ny, c["Z"], c["lengthscales"], c["variance"], chol,
        q_mu_full, c["q_sqrt"], model.num_samples, model.num_bases,
        jitter=model.jitter, deriv_mask=_deriv_mask(model), kernel=model.kernel,
        antithetic=model.antithetic,
    )
    Kuf = _kuf(model, c, X)
    f = pathwise.eval_paths(state, Kuf, X)  # [S, N, L]
    g = joint_sigmoid(f, model.limits_low, model.limits_high)

    lik = model.collision.log_prob(g, c["sigma_obs"] * sigma_scale)  # [S, N]
    lik_mean = jnp.mean(lik, axis=0)
    if sample_axis is not None:
        lik_mean = jax.lax.pmean(lik_mean, sample_axis)
    sd = chol.dtype
    # the KL's "fixed rows" are all clamped rows: [velocities;] query states
    n_free = c["q_mu"].shape[0]
    fixed_rows = q_mu_full[: q_mu_full.shape[0] - n_free]
    kl_term = kl.prior_kl(
        Kuu, chol, c["q_mu"].astype(sd), c["q_sqrt"].astype(sd),
        fixed_rows.astype(sd),
    )
    return jnp.sum(lik_mean) * c["alpha"] - kl_term.astype(lik.dtype)


def elbo_with_aux(
    params: PlannerParams,
    model: PlannerModel,
    start: jnp.ndarray,
    goal: jnp.ndarray,
    X: jnp.ndarray,
    key: jax.Array,
    sample_axis: str | None = None,
    sigma_scale: jnp.ndarray | float = 1.0,
):
    """ELBO plus structured per-step metrics (KL, likelihood, min clearance).

    Costs one extra clearance reduction vs :func:`elbo`; used by the solver's
    ``log_level >= 1`` mode for observability (the reference exposes only the
    scalar ELBO via tqdm; ``miscellaneous.py:99-103``).
    """
    c = constrain(params, model.variance_lower)
    q_lat = query_latent(model, start, goal)
    Kuu, chol, esc = _gram(model, c, with_info=True)
    q_mu_full = _q_mu_full(model, c, q_lat)
    state = pathwise.draw_paths(
        key, model.ny, c["Z"], c["lengthscales"], c["variance"], chol,
        q_mu_full, c["q_sqrt"], model.num_samples, model.num_bases,
        jitter=model.jitter, deriv_mask=_deriv_mask(model), kernel=model.kernel,
        antithetic=model.antithetic,
    )
    Kuf = _kuf(model, c, X)
    f = pathwise.eval_paths(state, Kuf, X)
    g = joint_sigmoid(f, model.limits_low, model.limits_high)
    clearance = model.collision.sphere_clearance(g)  # [S, N, P]
    cost = jnp.maximum(model.collision.epsilon - clearance, 0.0)
    lik = -0.5 * jnp.sum(cost * cost / (c["sigma_obs"] * sigma_scale), axis=-1)
    lik_mean = jnp.mean(lik, axis=0)
    if sample_axis is not None:
        lik_mean = jax.lax.pmean(lik_mean, sample_axis)
    sd = chol.dtype
    n_free = c["q_mu"].shape[0]
    fixed_rows = q_mu_full[: q_mu_full.shape[0] - n_free]
    kl_term = kl.prior_kl(
        Kuu, chol, c["q_mu"].astype(sd), c["q_sqrt"].astype(sd), fixed_rows.astype(sd)
    )
    lik_total = jnp.sum(lik_mean)
    value = lik_total * c["alpha"] - kl_term.astype(lik.dtype)
    aux = {
        "kl": kl_term.astype(lik.dtype),
        "expected_log_lik": lik_total,
        "min_clearance": jnp.min(clearance),
        "mean_hinge_cost": jnp.mean(cost),
        "jitter_escalations": esc,
    }
    return value, aux


def sample_from_posterior(
    params: PlannerParams,
    model: PlannerModel,
    start: jnp.ndarray,
    goal: jnp.ndarray,
    Xnew: jnp.ndarray,
    key: jax.Array,
    num_samples: int = 150,
    sample_axis: str | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Posterior extraction (parity: ``models/vgpmp.py:313-339``).

    Returns (mean trajectory ``[Nnew, L]``, best sample ``[Nnew, L]``,
    all samples ``[num_samples, Nnew, L]``, per-sample log-prob ``[num_samples]``).
    Best = argmax of the summed collision log-density over the trajectory.

    Under ``sample_axis`` sharding, ``num_samples`` is the per-device count
    and the best sample is selected globally: per-device argmax, then an
    all-gather of the (score, trajectory) winners over the axis.
    """
    c = constrain(params, model.variance_lower)
    q_lat = query_latent(model, start, goal)
    Kuu, chol = _gram(model, c)
    q_mu_full = _q_mu_full(model, c, q_lat)
    Kuf = _kuf(model, c, Xnew)

    sd = chol.dtype
    mean_lat, _ = posterior.predict_f(
        chol, Kuf,
        jnp.broadcast_to(c["variance"].astype(sd)[:, None], Kuf.shape[::2]),
        q_mu_full.astype(sd), c["q_sqrt"].astype(sd), jitter=model.jitter,
    )
    mean_lat = mean_lat.astype(q_lat.dtype)
    mean = joint_sigmoid(mean_lat, model.limits_low, model.limits_high)

    state = pathwise.draw_paths(
        key, model.ny, c["Z"], c["lengthscales"], c["variance"], chol,
        q_mu_full, c["q_sqrt"], num_samples, model.num_bases, jitter=model.jitter,
        deriv_mask=_deriv_mask(model), kernel=model.kernel,
    )
    f = pathwise.eval_paths(state, Kuf, Xnew)
    samples = joint_sigmoid(f, model.limits_low, model.limits_high)

    # score samples in chunks: materializing FK sphere positions for all
    # S x Nnew x P at once is O(GB) when the engine vmaps many problems
    # (observed: 55-problem batch OOM'd 16G HBM); lax.map bounds the live set
    scores = jax.lax.map(
        lambda s: jnp.sum(model.collision.log_prob(s, c["sigma_obs"])),
        samples,
        batch_size=16,
    )
    local_idx = jnp.argmax(scores)
    best = samples[local_idx]
    if sample_axis is not None:
        best_all = jax.lax.all_gather(best, sample_axis)      # [n_sp, Nnew, L]
        score_all = jax.lax.all_gather(scores[local_idx], sample_axis)  # [n_sp]
        best = best_all[jnp.argmax(score_all)]
    return mean, best, samples, scores
