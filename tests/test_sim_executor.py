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


def test_dense_executor_matches_stepped(sess):
    """The closed-form executor must agree with the literal while-loop PD
    transcription (same dynamics, computed analytically) on a mixed pool of
    free-space, colliding and grazing trajectories under the same global
    floor."""
    from vgpmp_tpu.sim import kinematic_execute_trajectory_stepped

    states = sess.states
    lo = np.asarray(sess.model.limits_low)
    trajs = []
    for i, j in [(0, 1), (2, 5), (3, 7)]:
        trajs.append(_lin(states[i], states[j]))  # typical query pairs
    a = np.asarray(states[0])
    bad = a.copy()
    bad[1], bad[3] = lo[1] * 0.98, lo[3] * 0.98
    trajs.append(_lin(a, bad))                    # deep collision
    trajs.append(_lin(a, a + 0.05))               # free space
    trajs.append(_lin(a, a))                      # degenerate (no motion)
    dense_f = jax.jit(
        lambda t: kinematic_execute_trajectory(sess.model.collision, t)[0]
    )
    step_f = jax.jit(
        lambda t: kinematic_execute_trajectory_stepped(sess.model.collision, t)[0]
    )
    for k, t in enumerate(trajs):
        d, s = bool(dense_f(t)), bool(step_f(t))
        assert d == s, f"trajectory {k}: dense={d} stepped={s}"


def test_dense_executor_final_config(sess):
    """Free-space run: the closed-form exit config matches the stepped
    executor's to the step resolution."""
    from vgpmp_tpu.sim import kinematic_execute_trajectory_stepped

    a = np.asarray(sess.states[0])
    traj = _lin(a, a + 0.08)
    _, _, qd = jax.jit(
        lambda t: kinematic_execute_trajectory(sess.model.collision, t)
    )(traj)
    _, _, qs = jax.jit(
        lambda t: kinematic_execute_trajectory_stepped(sess.model.collision, t)
    )(traj)
    assert np.allclose(np.asarray(qd), np.asarray(qs), atol=0.5 / 240.0 + 1e-6)


class _PocketCollision:
    """Stub collision model: two penetration pockets along joint 0.

    clearance(q) = 0.1 - depth_A * bump(q0 - 0) - depth_B * bump(q0 - 2)
    with triangular bumps of half-width 0.3 rad — pocket A (3 cm deep) at
    q0=0, pocket B (2 cm deep) at q0=2, free space elsewhere. Lets the taper
    semantics be tested exactly, free of real-scene line-of-sight accidents
    (straight lines between benchmark states all sweep deeper than any
    query's own depth, so no natural global-floor exploit exists there).
    """

    def sphere_clearance(self, q):
        q0, q1 = q[..., 0], q[..., 1]
        # pockets are localized in the (q0, q1) plane so a q1-detour clears B
        def bump(c0):
            d = jnp.maximum(jnp.abs(q0 - c0), jnp.abs(q1))
            return jnp.maximum(0.0, 1.0 - d / 0.3)

        clear = 0.1 - (0.03 + 0.1) * bump(0.0) - (0.02 + 0.1) * bump(2.0)
        return clear[..., None]  # [..., P=1]


def test_tapered_floor_blocks_midroute_dive():
    """ADVICE r3 (medium): under the global floor, a mid-route sweep through
    a DIFFERENT obstacle at depth <= the query's own phantom depth counted
    as success. The tapered floor must block it while still allowing the
    legitimate approach into the penetrating query endpoint."""
    from vgpmp_tpu.engine.validator import execution_success

    col = _PocketCollision()
    L = 4
    start = np.zeros(L)          # center of pocket A: depth 0.03
    goal = np.zeros(L); goal[0] = 4.0   # free space
    mid = np.zeros(L); mid[0] = 2.0     # pocket B: depth 0.02, 2 rad from both
    assert float(np.asarray(col.sphere_clearance(jnp.asarray(start))).min()) == pytest.approx(-0.03)
    assert float(np.asarray(col.sphere_clearance(jnp.asarray(mid))).min()) == pytest.approx(-0.02)

    direct = _lin(start, goal, 60)   # passes straight through pocket B
    f_taper = jax.jit(lambda t, s, g: execution_success(col, t, s, g))
    f_global = jax.jit(
        lambda t, s, g: execution_success(col, t, s, g, taper_radius=None)
    )
    s, g = jnp.asarray(start), jnp.asarray(goal)
    # round-3 global floor: pocket B (0.02) is shallower than the start's
    # tolerated depth (0.03) -> the sweep through it counted as success
    assert bool(f_global(direct, s, g))
    # tapered floor: pocket B is 2 rad from both endpoints -> only the 5 mm
    # slack is tolerated there -> blocked
    assert not bool(f_taper(direct, s, g))
    # legitimate semantics retained: departing the penetrating START pocket
    # itself executes (the taper covers the endpoint's own corridor) when
    # the route avoids pocket B
    detour = np.zeros((3, L))
    detour[1, 0], detour[1, 1] = 2.0, 1.0   # around pocket B in joint 1
    way = jnp.asarray(
        np.concatenate([_lin(start, detour[1], 30), _lin(detour[1], goal, 30)])
    )
    assert bool(f_taper(way, s, g))
    # and a dive DEEPER than the endpoint allowance still fails even inside
    # the endpoint corridor: make the goal pocket-B's rim and overshoot it
    g2 = np.zeros(L); g2[0] = 2.3   # rim of pocket B (clearance ~ 0)
    over = _lin(start, mid, 40)     # ends at B's center, 0.02 deep
    # query (start=A-center, goal=B-rim): B-center is 0.3 rad from the goal
    # -> taper allows depth_g * (1 - 0.3/0.5) = 0 (goal depth ~ 0) -> blocked
    assert not bool(f_taper(over, s, jnp.asarray(g2)))


def test_ensemble_score_clearance_tiebreak():
    """Two executed+validated restarts differing by 1 cm worst clearance must
    order by clearance (VERDICT r3 weak #6: the 1e6/1e3 tiers drowned <6 cm
    differences in f32)."""
    from vgpmp_tpu.engine.solver import ensemble_score

    s = np.asarray(
        ensemble_score(
            jnp.asarray([True, True]), jnp.asarray([True, True]),
            jnp.asarray([0.02, 0.03], jnp.float32),
        )
    )
    assert s[1] > s[0]
    # ... and even by 0.1 mm
    s2 = np.asarray(
        ensemble_score(
            jnp.asarray([True, True]), jnp.asarray([True, True]),
            jnp.asarray([0.0201, 0.0202], jnp.float32),
        )
    )
    assert s2[1] > s2[0]
    # tiers still dominate: executed beats any clearance
    s3 = np.asarray(
        ensemble_score(
            jnp.asarray([True, False]), jnp.asarray([False, True]),
            jnp.asarray([-5.0, 5.0], jnp.float32),
        )
    )
    assert s3[0] > s3[1]
    # NaN restart loses to anything
    s4 = np.asarray(
        ensemble_score(
            jnp.asarray([False, False]), jnp.asarray([False, False]),
            jnp.asarray([np.nan, -5.0], jnp.float32),
        )
    )
    assert s4[1] > s4[0]


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
