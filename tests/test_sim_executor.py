"""Kinematic contact-blocking executor: the simulator-free physical metric.

Covers the semantics the reference gets from PyBullet PD control
(``utils/robot.py:416-453``): free-space trajectories execute, trajectories
through obstacles are blocked and fail, and sphere-model penetration is
tolerated exactly as deep as the query states themselves require (phantom
penetration of grasp poses — the benchmark's own start/goal configurations
are physically valid in the reference's world, so their negative sphere
clearance is over-approximation artifact, not contact), never deeper.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgpmp_tpu.session import PlanningSession
from vgpmp_tpu.sim import kinematic_execute_trajectory


@pytest.fixture(scope="module")
def sess():
    return PlanningSession("franka", "industrial", dtype=jnp.float64, sdf_mode="nearest")


def _lin(a, b, n=40):
    w = np.linspace(0, 1, n)[:, None]
    return jnp.asarray(np.asarray(a) * (1 - w) + np.asarray(b) * w)


def test_free_space_trajectory_executes(sess):
    states = sess.states
    # small joint-space motion around a known problemset state: stays clear
    a = states[0]
    b = a + 0.05
    ok, reached, qf = jax.jit(
        lambda t: kinematic_execute_trajectory(sess.model.collision, t)
    )(_lin(a, b))
    assert bool(ok)
    assert bool(np.all(np.asarray(reached)))
    assert np.allclose(np.asarray(qf), b, atol=0.05)


def test_colliding_trajectory_is_blocked(sess):
    """Force a waypoint deep inside the scene: executor must fail it."""
    states = sess.states
    a = np.asarray(states[0])
    # drive the arm downward into the floor/table region of the industrial
    # scene by cranking the shoulder joint toward its limit
    bad = a.copy()
    lo = np.asarray(sess.model.limits_low)
    bad[1] = lo[1] * 0.98  # shoulder full dip
    bad[3] = lo[3] * 0.98
    traj = _lin(a, bad)
    clear = np.asarray(
        jax.vmap(lambda q: jnp.min(sess.model.collision.sphere_clearance(q)))(traj)
    )
    assert clear.min() < -0.01, "test premise: the path truly penetrates"
    ok, reached, _ = jax.jit(
        lambda t: kinematic_execute_trajectory(sess.model.collision, t)
    )(traj)
    assert not bool(ok)
    assert not bool(np.asarray(reached)[-1])


def test_grazing_contact_tolerated(sess):
    """A trajectory that starts at its worst penetration and retreats is
    executable (the grasp-pose case the endpoint-relative margin covers)."""
    states = sess.states
    a = np.asarray(states[0])
    lo = np.asarray(sess.model.limits_low)
    graze = a.copy()
    graze[1] = lo[1] * 0.98
    graze[3] = lo[3] * 0.98
    # find the first config along the dip that penetrates slightly (~<2cm)
    path = np.asarray(_lin(a, graze, 200))
    clear = np.asarray(
        jax.vmap(lambda q: jnp.min(sess.model.collision.sphere_clearance(q)))(
            jnp.asarray(path)
        )
    )
    idx = int(np.argmax(clear < -0.002))
    assert idx > 0
    start = path[idx]
    traj = _lin(start, a)  # retreat to free space
    ok, reached, _ = jax.jit(
        lambda t: kinematic_execute_trajectory(sess.model.collision, t)
    )(traj)
    assert bool(ok)


def test_execution_success_metric(sess):
    """The headline benchmark metric: executor traversal AND endpoint match.
    A perfectly executable free-space trajectory still fails the metric when
    its endpoints miss the query."""
    from vgpmp_tpu.engine.validator import execution_success

    states = sess.states
    a = np.asarray(states[0])
    b = a + 0.05
    traj = _lin(a, b)
    f = jax.jit(
        lambda t, s, g: execution_success(sess.model.collision, t, s, g)
    )
    assert bool(f(traj, jnp.asarray(a), jnp.asarray(b)))
    # same trajectory, wrong goal: the metric must fail even though the
    # executor reaches every waypoint
    assert not bool(f(traj, jnp.asarray(a), jnp.asarray(b + 0.2)))
    # colliding trajectory: metric fails through the executor leg
    lo = np.asarray(sess.model.limits_low)
    bad = a.copy()
    bad[1] = lo[1] * 0.98
    bad[3] = lo[3] * 0.98
    assert not bool(f(_lin(a, bad), jnp.asarray(a), jnp.asarray(bad)))


def test_phantom_endpoint_goal_reachable(sess):
    """A goal whose sphere model penetrates the scene (grasp pose) is
    reachable by the metric — the penetration floor is grounded in the QUERY
    states — while (a) the raw executor from a free-space start still blocks
    it and (b) a trajectory diving DEEPER than the query requires still
    fails (the floor cannot be gamed by the candidate trajectory)."""
    from vgpmp_tpu.engine.validator import execution_success

    states = sess.states
    a = np.asarray(states[0])
    lo = np.asarray(sess.model.limits_low)
    dip = a.copy()
    dip[1] = lo[1] * 0.98
    dip[3] = lo[3] * 0.98
    path = np.asarray(_lin(a, dip, 2000))
    clear = np.asarray(
        jax.vmap(lambda q: jnp.min(sess.model.collision.sphere_clearance(q)))(
            jnp.asarray(path)
        )
    )
    cross = int(np.argmax(clear < -0.03))
    assert cross > 0, "test premise: the dip reaches 3 cm penetration"
    gi = int(np.argmin(clear[: cross + 1]))
    goal = path[gi]
    assert clear[: gi + 1].min() >= clear[gi] - 1e-9  # goal is deepest en route
    block = int(np.argmax(clear < -6e-3))  # just past the 5 mm contact slack
    assert np.max(np.abs(path[block] - goal)) > 0.06, (
        "test premise: where a zero-floor executor blocks is outside the "
        "0.05 rad waypoint tolerance of the goal"
    )

    traj = _lin(a, goal)
    ok_raw, _, _ = jax.jit(
        lambda t: kinematic_execute_trajectory(sess.model.collision, t)
    )(traj)
    assert not bool(ok_raw)  # free-space start => floor ~ 0 => blocked

    f = jax.jit(lambda t, s, g: execution_success(sess.model.collision, t, s, g))
    assert bool(f(traj, jnp.asarray(a), jnp.asarray(goal)))

    # anti-gaming: a via-point 5 cm deeper than anything the query requires
    deep = int(np.argmax(clear < clear[gi] - 0.05))
    if deep > 0:
        via = path[deep]
        traj2 = jnp.concatenate([_lin(a, via), _lin(via, goal)], axis=0)
        assert not bool(f(traj2, jnp.asarray(a), jnp.asarray(goal)))


def test_validator_velocity_limits(sess):
    """velocity_ok gates success: a trajectory executed too fast violates the
    RobotSpec velocity limits; slow enough, it passes."""
    from vgpmp_tpu.engine.validator import validate_trajectory

    states = sess.states
    a = np.asarray(states[0])
    b = a + 0.3
    traj = _lin(a, b, 20)
    vlim = jnp.asarray(np.asarray(sess.spec.velocity_limits))
    kw = dict(
        limits_low=sess.model.limits_low, limits_high=sess.model.limits_high,
        velocity_limits=vlim,
    )
    fast = validate_trajectory(sess.model.collision, traj, traj[0], traj[-1],
                               duration=0.001, **kw)
    slow = validate_trajectory(sess.model.collision, traj, traj[0], traj[-1],
                               duration=10.0, **kw)
    assert not bool(fast.velocity_ok) and not bool(fast.success)
    assert bool(slow.velocity_ok)
