"""Adaptive restart engine: correctness, determinism, multi-device equality.

``solver.solve_adaptive`` is the path every headline benchmark number flows
through since round 4 (it replaced the fixed-K ensemble; VERDICT r3 next #2):
round 0 solves every problem once, later rounds pack all B program slots with
restarts for still-unsolved problems. These tests pin

- report shapes / bookkeeping (k_eff, rounds, early stop);
- monotone improvement: more rounds never lose an executed problem;
- determinism in the seed;
- row-for-row equality of the dp-sharded round solver with the single-device
  one through the full adaptive engine (VERDICT r3 next #7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgpmp_tpu.engine import solver as solver_mod
from vgpmp_tpu.session import PlanningSession

TINY = dict(num_steps=10, num_samples=3, num_bases=32, num_inducing=6,
            time_spacing_X=8, time_spacing_Xnew=12)


@pytest.fixture(scope="module")
def sess():
    return PlanningSession(
        "franka", "industrial", dtype=jnp.float64, sdf_mode="nearest",
        overrides=TINY, use_tuned=False,
    )


def _cfg(sess):
    return sess.train_config.replace(num_posterior_samples=4)


@pytest.fixture(scope="module")
def queries(sess):
    starts, goals = sess.queries()
    return starts[:8], goals[:8]


def test_adaptive_shapes_and_bookkeeping(sess, queries):
    starts, goals = queries
    B = len(starts)
    best, reps, info = solver_mod.solve_adaptive(
        sess.model, _cfg(sess), starts, goals, sess.planner_params,
        inits=("linear", "zeros"), max_rounds=3, seed=0,
    )
    assert best.shape == (B, 12, 7)
    for f in ("executed", "success", "min_clearance"):
        assert getattr(reps, f).shape == (B,)
    assert 1 <= info["rounds"] <= 3
    assert info["spent"] == info["rounds"] * B
    assert info["k_eff"] == pytest.approx(info["spent"] / B)
    assert len(info["restarts_per_problem"]) == B
    # an executed row carries a finite trajectory
    ex = np.asarray(reps.executed)
    assert np.isfinite(best[ex]).all()
    # tiny budget cannot solve everything -> if anything is unsolved the
    # engine must have spent its extra rounds
    if not ex.all():
        assert info["rounds"] == 3


def test_adaptive_monotone_vs_single_round(sess, queries):
    """Round 0 of the adaptive engine IS the plain batched solve; extra
    rounds may only add executed problems, never lose one."""
    starts, goals = queries
    solve = solver_mod.make_round_solver(sess.model, _cfg(sess))
    _, reps1, info1 = solver_mod.solve_adaptive(
        sess.model, _cfg(sess), starts, goals, sess.planner_params,
        inits=("linear",), max_rounds=1, seed=0, solve=solve,
    )
    assert info1["rounds"] == 1
    _, reps3, _ = solver_mod.solve_adaptive(
        sess.model, _cfg(sess), starts, goals, sess.planner_params,
        inits=("linear", "zeros"), max_rounds=3, seed=0, solve=solve,
    )
    e1, e3 = np.asarray(reps1.executed), np.asarray(reps3.executed)
    assert (e3 | ~e1).all(), "adaptive rounds lost an executed problem"
    # scores are monotone too (the merge keeps the per-problem best)
    s1 = np.asarray(solver_mod.ensemble_score(
        reps1.executed, reps1.success, reps1.min_clearance))
    s3 = np.asarray(solver_mod.ensemble_score(
        reps3.executed, reps3.success, reps3.min_clearance))
    assert (s3 >= s1 - 1e-6).all()


def test_adaptive_deterministic(sess, queries):
    starts, goals = queries
    solve = solver_mod.make_round_solver(sess.model, _cfg(sess))
    out = [
        solver_mod.solve_adaptive(
            sess.model, _cfg(sess), starts, goals, sess.planner_params,
            inits=("linear", "zeros"), max_rounds=2, seed=7, solve=solve,
        )
        for _ in range(2)
    ]
    np.testing.assert_array_equal(out[0][0], out[1][0])
    np.testing.assert_array_equal(
        np.asarray(out[0][1].executed), np.asarray(out[1][1].executed)
    )
    assert out[0][2] == out[1][2]


def test_adaptive_sharded_round_solver_matches_single_device(sess, queries):
    """VERDICT r3 next #7: the adaptive engine (the headline path) must
    produce identical results when its round program shards over dp."""
    from vgpmp_tpu.parallel import mesh as mesh_mod
    from vgpmp_tpu.parallel.sharded import make_sharded_round_solver

    starts, goals = queries  # 8 problems over dp=8 mesh
    mesh = mesh_mod.make_mesh(1)
    sharded = make_sharded_round_solver(sess.model, _cfg(sess), mesh)
    plain = solver_mod.make_round_solver(sess.model, _cfg(sess))

    best_s, reps_s, info_s = solver_mod.solve_adaptive(
        sess.model, _cfg(sess), starts, goals, sess.planner_params,
        inits=("linear", "zeros"), max_rounds=2, seed=3, solve=sharded,
    )
    best_p, reps_p, info_p = solver_mod.solve_adaptive(
        sess.model, _cfg(sess), starts, goals, sess.planner_params,
        inits=("linear", "zeros"), max_rounds=2, seed=3, solve=plain,
    )
    assert info_s == info_p
    # trajectories agree to XLA fusion-order noise (different programs ->
    # different summation orders; measured ~1e-10 in f64)
    np.testing.assert_allclose(best_s, best_p, rtol=0, atol=1e-7)
    np.testing.assert_array_equal(
        np.asarray(reps_s.executed), np.asarray(reps_p.executed)
    )
    np.testing.assert_allclose(
        np.asarray(reps_s.min_clearance), np.asarray(reps_p.min_clearance),
        rtol=0, atol=1e-6,
    )


def test_init_params_batch_matches_reference_init(sess, queries):
    """The fused mode-as-data batch init must reproduce init_params exactly
    for every mode (it replaced per-mode eager init on the dispatch-tunnel
    hot path)."""
    from vgpmp_tpu.models import vgpmp as planner

    starts, goals = queries
    pp = sess.planner_params
    kw = dict(
        lengthscales=np.asarray(pp["lengthscales"], np.float64),
        variance=float(pp["variance"]),
        sigma_obs=float(pp["sigma_obs"]),
        alpha=float(pp["alpha"]),
    )
    modes = ["linear", "zeros", "waypoint", "linear", "zeros", "waypoint",
             "linear", "zeros"]
    fused = solver_mod.init_slots(sess.model, starts, goals, pp, modes)
    for j, m in enumerate(modes):
        ref = planner.init_params(
            sess.model, starts[j], goals[j], interpolation=m, **kw
        )
        got = jax.tree.map(lambda x: np.asarray(x[j]), fused)
        for f in ("q_mu", "q_sqrt", "lengthscales_u", "variance_u", "z_u",
                  "sigma_obs_u", "alpha_u"):
            np.testing.assert_allclose(
                np.asarray(getattr(ref, f)), getattr(got, f),
                rtol=0, atol=1e-12, err_msg=f"row {j} mode {m} field {f}",
            )

    # frand rows go through the same via-point draw as before
    fr = solver_mod.init_slots(sess.model, starts, goals, pp, ["frand3"] * 8)
    w = solver_mod.restart_waypoints(sess.model, starts, goals, "frand3")
    ref = planner.init_params(
        sess.model, starts[0], goals[0], interpolation="waypoint",
        waypoint=w[0], **kw
    )
    np.testing.assert_allclose(
        np.asarray(ref.q_mu), np.asarray(fr.q_mu[0]), rtol=0, atol=1e-12
    )
