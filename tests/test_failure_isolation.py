"""Per-problem failure isolation: a poisoned batch row is flagged and
contained — neighbors solve normally and aggregate metrics stay finite.

The reference has no runtime failure handling at all (a NaN'd step silently
corrupts the whole solve; SURVEY §5 "Failure detection: None"). Here:

- ``SolveResult.failed`` flags non-finite trajectories per problem;
- the sharded solver reports ``num_failed`` and excludes failed rows from
  clearance aggregates;
- jitter-escalation telemetry counts how often the Cholesky sanitizer fired.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgpmp_tpu.engine import solver as solver_mod
from vgpmp_tpu.session import PlanningSession

TINY = dict(num_steps=8, num_samples=3, num_bases=32, num_inducing=6,
            time_spacing_X=8, time_spacing_Xnew=10)


@pytest.fixture(scope="module")
def sess():
    return PlanningSession(
        "franka", "industrial", dtype=jnp.float64, sdf_mode="nearest",
        overrides=TINY, use_tuned=False,
    )


def _tiny_cfg(sess):
    return sess.train_config.replace(num_posterior_samples=4)


def test_poisoned_row_is_flagged_and_contained(sess):
    starts, goals = sess.queries()
    B = 3
    params_b = solver_mod.init_batch(sess.model, starts[:B], goals[:B], sess.planner_params)
    # poison problem 1's variational state with NaN (models e.g. a corrupted
    # warm start or a diverged restart)
    q_mu = np.array(params_b.q_mu)
    q_mu[1] = np.nan
    params_b = params_b.replace(q_mu=jnp.asarray(q_mu))

    solve_b = solver_mod.make_batch_solver(sess.model, _tiny_cfg(sess))
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, res = solve_b(
        params_b,
        jnp.asarray(starts[:B], jnp.float64),
        jnp.asarray(goals[:B], jnp.float64),
        keys,
    )
    failed = np.asarray(res.failed)
    assert failed.tolist() == [False, True, False]
    # healthy rows are untouched by the poisoned neighbor
    best = np.asarray(res.best)
    assert np.isfinite(best[0]).all() and np.isfinite(best[2]).all()
    assert not np.isfinite(best[1]).all()


def test_sharded_metrics_isolate_failed_rows(sess):
    from vgpmp_tpu.parallel import mesh as mesh_mod
    from vgpmp_tpu.parallel.sharded import make_sharded_solver, pad_problems

    mesh = mesh_mod.make_mesh(1)
    n_dp = mesh.shape[mesh_mod.DP_AXIS]
    starts, goals = sess.queries()
    starts, goals, mask = pad_problems(starts[:5], goals[:5], n_dp)
    B = len(starts)
    params_b = solver_mod.init_batch(sess.model, starts, goals, sess.planner_params)
    q_mu = np.array(params_b.q_mu)
    q_mu[2] = np.nan
    params_b = params_b.replace(q_mu=jnp.asarray(q_mu))

    solve = make_sharded_solver(sess.model, _tiny_cfg(sess), mesh)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, metrics = solve(
        params_b,
        jnp.asarray(starts, jnp.float64),
        jnp.asarray(goals, jnp.float64),
        keys,
        jnp.asarray(mask),
    )
    assert float(metrics["num_failed"]) == 1.0
    assert np.isfinite(float(metrics["mean_min_clearance"]))
    assert np.isfinite(float(metrics["success_rate"]))
    failed = np.asarray(metrics["failed"])[np.asarray(mask)]
    assert failed.sum() == 1 and failed[2]


def test_jitter_escalation_telemetry(sess):
    """elbo_with_aux surfaces the escalation count; a well-conditioned
    problem reports zero."""
    from vgpmp_tpu.models import vgpmp as planner

    starts, goals = sess.queries()
    params = jax.tree.map(
        lambda x: x[0],
        solver_mod.init_batch(sess.model, starts[:1], goals[:1], sess.planner_params),
    )
    X = jnp.linspace(0.0, 1.0, 8, dtype=jnp.float64)
    _, aux = planner.elbo_with_aux(
        params, sess.model,
        jnp.asarray(starts[0], jnp.float64), jnp.asarray(goals[0], jnp.float64),
        X, jax.random.PRNGKey(0),
    )
    assert "jitter_escalations" in aux
    assert int(aux["jitter_escalations"]) == 0
