"""Sharded batch solver: problems over ``dp``, MC samples over ``sp``.

One ``shard_map`` wraps the vmapped single-problem solver:

- each ``dp`` row of the mesh owns a contiguous slab of the problem batch
  (no cross-problem communication at all — planning problems are
  independent, so scaling over dp is communication-free except metrics);
- within a row, ``sp`` devices cooperate on one problem's Monte-Carlo
  estimator: each draws ``S/n_sp`` pathwise samples and the likelihood mean
  (forward) / gradients (backward) are ``pmean``'d over ICI per step, and the
  final best-sample selection all-gathers the per-device winners.

Success metrics are aggregated with ``pmean`` over the whole mesh inside the
same program, so a multi-host run reports global solve rates without host
round-trips.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vgpmp_tpu.engine import solver as solver_mod
from vgpmp_tpu.engine.validator import validate_trajectory
from vgpmp_tpu.models import vgpmp as planner
from vgpmp_tpu.parallel.mesh import DP_AXIS, SP_AXIS

__all__ = ["make_sharded_solver", "make_sharded_round_solver", "pad_problems"]


def pad_problems(
    starts: np.ndarray, goals: np.ndarray, multiple: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad a problem list to a multiple of the dp-shard count.

    Returns (starts, goals, valid_mask); padded rows repeat problem 0 and are
    masked out of metrics (per-problem failure isolation — the reference just
    appends to ``failed_indices``, ``benchmarking.py:88-90``).
    """
    q = len(starts)
    padded = -(-q // multiple) * multiple
    mask = np.zeros(padded, dtype=bool)
    mask[:q] = True
    pad = padded - q
    starts = np.concatenate([starts, np.repeat(starts[:1], pad, 0)], axis=0)
    goals = np.concatenate([goals, np.repeat(goals[:1], pad, 0)], axis=0)
    return starts, goals, mask


def make_sharded_round_solver(
    model: planner.PlannerModel,
    cfg: solver_mod.TrainConfig,
    mesh,
    trainable: Optional[dict] = None,
):
    """dp-sharded :func:`engine.solver.make_round_solver` — same signature
    ``solve(params_b, starts, goals, keys) -> (best, reports)``, problems
    split over the mesh's ``dp`` axis (B must be divisible by dp; use
    :func:`pad_problems`), MC samples over ``sp`` when present.

    Drop-in for :func:`engine.solver.solve_adaptive`'s ``solve=`` argument,
    so the adaptive restart engine — the path every headline benchmark
    number flows through — runs multi-device: restart packing and merging
    stay on the host, each round's B slots shard over dp communication-free
    (metrics and the executed verdict are per-row), and equality with the
    single-device engine is testable row-for-row
    (``tests/test_adaptive.py``).
    """
    from vgpmp_tpu.engine.validator import ValidationReport, execute_and_validate

    n_sp = mesh.shape[SP_AXIS]
    sample_axis = SP_AXIS if n_sp > 1 else None
    cfg_r = cfg.replace(ee_uncertainty=False)

    def solve_row(m, p, s, g, k):
        single = solver_mod.make_single_solver(
            m, cfg_r, trainable, sample_axis=sample_axis
        )
        _, res = single(p, s, g, k)
        rep = execute_and_validate(
            m.collision, res.best, s, g, m.limits_low, m.limits_high
        )
        return res.best, rep

    def local(m, params_b, starts_b, goals_b, keys_b):
        return jax.vmap(solve_row, in_axes=(None, 0, 0, 0, 0))(
            m, params_b, starts_b, goals_b, keys_b
        )

    rep_spec = ValidationReport(*([P(DP_AXIS)] * len(ValidationReport._fields)))
    # the model rides as a REPLICATED shard_map argument (P() prefix spec),
    # not a closure: closure grids serialize into the XLA module as
    # constants, which at round-5 grid sizes exceeds the remote-compile
    # request limit (see engine.solver.make_batch_solver)
    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(),) + (P(DP_AXIS),) * 4,
        out_specs=(P(DP_AXIS), rep_spec),
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    def fn(params_b, starts_b, goals_b, keys_b):
        return jitted(model, params_b, starts_b, goals_b, keys_b)

    # advertise the dp extent so solve_adaptive rounds its restart-bucket
    # sizes to mesh-divisible shapes (advisor r4 finding: the default B//4
    # tail bucket need not divide dp and crashed shard_map)
    fn.dp_size = int(mesh.shape[DP_AXIS])
    return fn


def make_sharded_solver(
    model: planner.PlannerModel,
    cfg: solver_mod.TrainConfig,
    mesh,
    trainable: Optional[dict] = None,
    validate: bool = True,
):
    """Build the mesh-sharded batch solver.

    Returns ``solve(params_b, starts, goals, keys, mask)`` where every array
    has leading problem axis B (divisible by the dp size; use
    :func:`pad_problems`). Per-device MC sample counts are
    ``model.num_samples`` (so the *effective* sample budget is
    ``num_samples * sp``). Output: (results stacked over B, metrics dict of
    mesh-global scalars).
    """
    n_sp = mesh.shape[SP_AXIS]
    sample_axis = SP_AXIS if n_sp > 1 else None

    def local_batch(m, params_b, starts_b, goals_b, keys_b, mask_b):
        single = solver_mod.make_single_solver(
            m, cfg, trainable, sample_axis=sample_axis
        )
        _, res = jax.vmap(single)(params_b, starts_b, goals_b, keys_b)
        if validate:
            reps = jax.vmap(
                lambda t, a, b: validate_trajectory(
                    m.collision, t, a, b, m.limits_low, m.limits_high
                )
            )(res.best, starts_b, goals_b)
            w = mask_b.astype(res.best.dtype)
            denom = jax.lax.psum(jnp.sum(w), DP_AXIS)
            solved = jax.lax.psum(jnp.sum(reps.success * w), DP_AXIS)
            # per-problem failure isolation: a diverged (NaN) row is counted,
            # not propagated — clearance aggregates exclude it
            wf = w * (1.0 - res.failed.astype(w.dtype))
            metrics = {
                "success_rate": solved / denom,
                "num_problems": denom,
                "num_failed": jax.lax.psum(
                    jnp.sum(res.failed.astype(w.dtype) * w), DP_AXIS
                ),
                "mean_min_clearance": jax.lax.psum(
                    jnp.sum(jnp.nan_to_num(reps.min_clearance) * wf), DP_AXIS
                )
                / jnp.maximum(jax.lax.psum(jnp.sum(wf), DP_AXIS), 1.0),
                "success": reps.success,
                "min_clearance": reps.min_clearance,
                "failed": res.failed,
            }
        else:
            metrics = {}
        return res, metrics

    in_spec = (P(), P(DP_AXIS), P(DP_AXIS), P(DP_AXIS), P(DP_AXIS), P(DP_AXIS))
    out_spec = (
        P(DP_AXIS),
        {
            "success_rate": P(),
            "num_problems": P(),
            "num_failed": P(),
            "mean_min_clearance": P(),
            "success": P(DP_AXIS),
            "min_clearance": P(DP_AXIS),
            "failed": P(DP_AXIS),
        }
        if validate
        else {},
    )
    sharded = jax.shard_map(
        local_batch, mesh=mesh, in_specs=in_spec, out_specs=out_spec,
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    def solve(params_b, starts_b, goals_b, keys_b, mask_b):
        return jitted(model, params_b, starts_b, goals_b, keys_b, mask_b)

    return solve
