"""Analysis/debug-probe tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgpmp_tpu.engine import analysis
from vgpmp_tpu.models import vgpmp as planner
from vgpmp_tpu.session import PlanningSession


@pytest.fixture(scope="module")
def session():
    return PlanningSession("franka", "industrial", dtype=jnp.float64,
                           overrides=dict(num_inducing=5))


def test_ee_positions_match_fk_chain(session, rng):
    q = jnp.asarray(rng.uniform(-1, 1, (4, session.spec.dof)))
    ee = analysis.ee_positions(session.model.collision.fk, q)
    assert ee.shape == (4, 3)
    from vgpmp_tpu.kinematics import dh

    for i in range(4):
        frames = dh.fk_frames_np(session.spec, session.base_pose, np.asarray(q[i]))
        np.testing.assert_allclose(np.asarray(ee[i]), frames[-1, :3, 3], atol=1e-10)


def test_ee_path_uncertainty_zero_for_identical_samples(session):
    q = jnp.zeros((6, 10, session.spec.dof))
    unc = analysis.ee_path_uncertainty(session.model.collision.fk, q)
    np.testing.assert_allclose(np.asarray(unc), 0.0, atol=1e-12)
    assert unc.shape == (10, 3)


def test_ee_jacobian_uncertainty_scales_linearly(session):
    q = jnp.asarray(session.spec.default_pose)
    s1 = analysis.ee_jacobian_uncertainty(session.model.collision.fk, q,
                                          jnp.full(session.spec.dof, 0.01))
    s2 = analysis.ee_jacobian_uncertainty(session.model.collision.fk, q,
                                          jnp.full(session.spec.dof, 0.02))
    np.testing.assert_allclose(np.asarray(s2), 2 * np.asarray(s1), rtol=1e-9)
    assert np.all(np.asarray(s1) >= 0)


def test_debug_likelihood_finite_and_negative_near_collision(session):
    starts, goals = session.queries()
    params = planner.init_params(
        session.model, starts[0], goals[0],
        lengthscales=session.planner_params["lengthscales"],
        variance=session.planner_params["variance"],
        sigma_obs=session.planner_params["sigma_obs"],
        alpha=session.planner_params["alpha"],
    )
    lp = analysis.debug_likelihood(params, session.model, jnp.asarray(starts[:3]))
    assert np.isfinite(float(lp))
    assert float(lp) <= 0.0


def test_sdf_gradient_probe_shapes(session):
    g = analysis.sdf_gradient_at_config(
        session.model.collision, jnp.asarray(session.spec.default_pose)
    )
    assert g.shape == (session.spec.num_spheres, 3)
    assert np.all(np.isfinite(np.asarray(g)))


def test_debug_loop_commands(session):
    """REPL parity with the reference's interactive loop
    (``simulation_manager.py:124-152``): all probe commands run and the
    final configuration reflects the edits."""
    import io

    import numpy as np

    from vgpmp_tpu.engine.repl import debug_loop
    from vgpmp_tpu.engine import solver as solver_mod

    sess = session
    starts, goals = sess.queries()
    params = solver_mod.init_batch(
        sess.model, starts[:1], goals[:1], sess.planner_params
    )
    params = jax.tree.map(lambda x: x[0], params)
    fin = io.StringIO("c\nset 0 0.3\nsdf\nfk\nlik\nee\nbogus\nq\n")
    fout = io.StringIO()
    q = debug_loop(sess.model, params, stdin=fin, stdout=fout)
    out = fout.getvalue()
    assert "collision log-density" in out
    assert "sdf grad per sphere" in out
    assert "ee position" in out
    assert "commands:" in out  # unknown command help
    np.testing.assert_allclose(q[0], 0.3, atol=1e-12)
