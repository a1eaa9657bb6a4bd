"""Receding-horizon replanning + observability + checkpoint tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgpmp_tpu.engine import replan, solver
from vgpmp_tpu.engine.solver import TrainConfig
from vgpmp_tpu.models import vgpmp as planner
from vgpmp_tpu.session import PlanningSession

TINY = dict(num_steps=8, num_samples=3, num_bases=64, num_inducing=5,
            time_spacing_X=10, time_spacing_Xnew=30)


@pytest.fixture(scope="module")
def session():
    return PlanningSession("franka", "industrial", dtype=jnp.float64, overrides=TINY)


@pytest.fixture(scope="module")
def batch(session):
    starts, goals = session.queries()
    starts, goals = starts[:2], goals[:2]
    params = solver.init_batch(session.model, starts, goals, session.planner_params)
    return params, jnp.asarray(starts), jnp.asarray(goals)


def test_receding_horizon_reaches_goal(session, batch):
    params, starts, goals = batch
    full = TrainConfig(num_steps=8, learning_rate=0.05, time_spacing_X=10,
                       time_spacing_Xnew=30, num_posterior_samples=6)
    quick = full.replace(num_steps=4)
    res = replan.run_receding_horizon(
        session.model, full, quick, params, starts, goals,
        jax.random.PRNGKey(0), cycles=3, advance=8,
    )
    assert res.executed.shape[0] == 2
    assert np.all(np.isfinite(np.asarray(res.executed)))
    # each plan is goal-clamped, and the last cycle executes to the end
    assert np.all(np.asarray(res.final_error) < 0.05), np.asarray(res.final_error)
    assert bool(res.reached_goal.all())
    # the executed path starts at the query start
    np.testing.assert_allclose(
        np.asarray(res.executed[:, 0, :]), np.asarray(starts), atol=1e-9
    )


def test_log_level_metrics(session, batch):
    params, starts, goals = batch
    cfg = TrainConfig(num_steps=6, learning_rate=0.05, time_spacing_X=10,
                      time_spacing_Xnew=30, num_posterior_samples=4, log_level=1)
    solve = jax.jit(solver.make_single_solver(session.model, cfg))
    _, res = solve(jax.tree.map(lambda x: x[0], params), starts[0], goals[0],
                   jax.random.PRNGKey(0))
    assert res.logs is not None
    for k in ["kl", "expected_log_lik", "min_clearance", "mean_hinge_cost"]:
        assert res.logs[k].shape == (6,), k
        assert np.all(np.isfinite(np.asarray(res.logs[k])))
    # elbo identity: elbo = alpha * E[loglik] - kl
    c = planner.constrain(jax.tree.map(lambda x: x[0], params))
    # (identity holds per-step up to the shared randomness; check consistency
    # of recorded history instead)
    np.testing.assert_allclose(
        np.asarray(res.elbo_history),
        np.asarray(res.logs["expected_log_lik"]) * float(c["alpha"])
        - np.asarray(res.logs["kl"]),
        rtol=1e-6,
    )


def test_jitter_escalation_recovers():
    """A Gram too ill-conditioned for its jitter must produce finite Cholesky
    after escalation."""
    from vgpmp_tpu.gp import conditioned
    from vgpmp_tpu.ops import kernels as K

    # nearly-duplicate inducing inputs in f32 -> Cholesky failure at 1e-12
    ny = jnp.asarray([0.0, 1.0], jnp.float32)
    Z = jnp.asarray(np.full((8, 2), 0.5) + 1e-7 * np.arange(16).reshape(8, 2),
                    jnp.float32)
    ls = jnp.asarray([2.0, 2.0], jnp.float32)
    s2 = jnp.asarray([0.3, 0.3], jnp.float32)
    _, chol0 = conditioned.cholesky_kuu(K.matern52, ny, Z, ls, s2, jitter=1e-12)
    assert not bool(jnp.all(jnp.isfinite(chol0))), "expected failure without escalation"
    _, chol = conditioned.cholesky_kuu(
        K.matern52, ny, Z, ls, s2, jitter=1e-12, escalations=8
    )
    assert bool(jnp.all(jnp.isfinite(chol)))


def test_checkpoint_roundtrip(tmp_path, session, batch):
    from vgpmp_tpu.utils.checkpoint import restore_solver_state, save_solver_state

    params, starts, goals = batch
    ids = np.array([3, 7])
    save_solver_state(tmp_path / "ckpt", params, ids, extras={"note": "r1"})
    restored, rids, extras = restore_solver_state(tmp_path / "ckpt")
    np.testing.assert_array_equal(rids, ids)
    assert extras["note"] == "r1"
    np.testing.assert_allclose(
        np.asarray(params.q_mu), restored["q_mu"], atol=0
    )


def test_resumable_solver_chunked_equals_oneshot(tmp_path, session):
    """Mid-run checkpointing: full budget as 2 chunks with an orbax
    save/restore of TrainState between them reproduces the single-chunk
    result exactly (same per-step keys)."""
    from vgpmp_tpu.utils.checkpoint import restore_train_state, save_train_state

    sess = session
    cfg = sess.train_config.replace(
        num_steps=10, lr_peak=0.1, warmup_steps=3, sigma_anneal=5.0,
        num_posterior_samples=4, time_spacing_X=8, time_spacing_Xnew=10,
    )
    starts, goals = sess.queries()
    s0 = jnp.asarray(starts[0], jnp.float64)
    g0 = jnp.asarray(goals[0], jnp.float64)
    p0 = jax.tree.map(
        lambda x: x[0],
        solver.init_batch(sess.model, starts[:1], goals[:1], sess.planner_params),
    )
    init_state, train_chunk, extract = solver.make_resumable_solver(sess.model, cfg)
    train_j = jax.jit(train_chunk)
    step_keys = jax.random.split(jax.random.PRNGKey(7), cfg.num_steps)
    extract_key = jax.random.PRNGKey(8)

    # one shot
    st = init_state(p0)
    st, hist_full = train_j(st, s0, g0, step_keys)
    res_full = extract(st, s0, g0, extract_key)

    # two chunks + checkpoint between
    st2 = init_state(p0)
    st2, h1 = train_j(st2, s0, g0, step_keys[:5])
    save_train_state(tmp_path / "mid", st2)
    st2 = restore_train_state(tmp_path / "mid", template=init_state(p0))
    st2, h2 = train_j(st2, s0, g0, step_keys[5:])
    res_chunked = extract(st2, s0, g0, extract_key)

    np.testing.assert_array_equal(
        np.concatenate([np.asarray(h1), np.asarray(h2)]), np.asarray(hist_full)
    )
    np.testing.assert_array_equal(np.asarray(res_full.best), np.asarray(res_chunked.best))


def test_receding_horizon_corrects_disturbances(session, batch):
    """With execution noise, closed-loop replanning still reaches the goal
    while the open-loop endpoint is off by the accumulated disturbance —
    the warm start demonstrably earns its keep."""
    params, starts, goals = batch
    full = TrainConfig(num_steps=8, learning_rate=0.05, time_spacing_X=10,
                       time_spacing_Xnew=30, num_posterior_samples=6)
    quick = full.replace(num_steps=6)
    noise = 0.15  # rad per cycle: way beyond the 0.05 goal tolerance
    res = replan.run_receding_horizon(
        session.model, full, quick, params, starts, goals,
        jax.random.PRNGKey(0), cycles=3, advance=8, noise_scale=noise,
    )
    # closed loop absorbs the disturbances (the final cycle replans from the
    # last disturbed state, and plans are goal-clamped)
    assert np.all(np.asarray(res.final_error) < 0.05), np.asarray(res.final_error)

    # open loop: execute the cycle-0 plan to the end, then apply the same
    # number of disturbances without replanning — endpoint error >> tol
    key = jax.random.PRNGKey(0)
    _, res0 = jax.jit(jax.vmap(
        solver.make_single_solver(session.model, full)
    ))(params, starts, goals, jax.random.split(jax.random.PRNGKey(1), 2))
    end = np.asarray(res0.best[:, -1, :])
    rng = np.random.default_rng(0)
    for _ in range(2):
        end = end + noise * rng.standard_normal(end.shape)
    open_err = np.abs(end - np.asarray(goals)).max(-1)
    assert np.all(open_err > 0.05)
