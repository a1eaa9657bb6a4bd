"""Forward-kinematics tests.

Follows the reference's dual-implementation strategy
(``/root/reference/tests/test_robot.py:97-109``: NumPy FK vs TF FK): here the
JAX implementation is checked against its numpy twin for all four robots, and
against an independent URDF-chain FK for franka (whose sphere offsets carry no
hand corrections, so DH and URDF placements must agree to ~1e-5 m).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgpmp_tpu.kinematics import dh
from vgpmp_tpu.kinematics.urdf import UrdfModel
from vgpmp_tpu.robots import load_robot

REF_DATA = "/root/reference/data"


def random_configs(spec, rng, n):
    low = np.maximum(spec.limits_low, -np.pi)
    high = np.minimum(spec.limits_high, np.pi)
    return rng.uniform(low, high, size=(n, spec.dof))


def test_jax_fk_matches_numpy(robot_name, rng):
    spec = load_robot(robot_name)
    base = np.eye(4)
    base[:3, 3] = [0.1, -0.2, 0.3]
    model = dh.FkModel.from_spec(spec, base, dtype=jnp.float64)
    qs = random_configs(spec, rng, 5)
    jax_pos = np.asarray(jax.jit(dh.sphere_positions)(model, jnp.asarray(qs)))
    for i, q in enumerate(qs):
        np_pos = dh.sphere_positions_np(spec, base, q)
        np.testing.assert_allclose(jax_pos[i], np_pos, atol=1e-10)


def test_jax_fk_frames_match_numpy(robot_name, rng):
    spec = load_robot(robot_name)
    base = np.eye(4)
    model = dh.FkModel.from_spec(spec, base, dtype=jnp.float64)
    q = random_configs(spec, rng, 1)[0]
    frames_jax = np.asarray(dh.fk_frames(model, jnp.asarray(q)))
    frames_np = dh.fk_frames_np(spec, base, q)
    np.testing.assert_allclose(frames_jax, frames_np, atol=1e-10)


def test_batched_shapes(rng):
    spec = load_robot("franka")
    model = dh.FkModel.from_spec(spec, np.eye(4), dtype=jnp.float64)
    q = jnp.asarray(rng.uniform(-1, 1, size=(3, 4, 5, spec.dof)))
    pos = dh.sphere_positions(model, q)
    assert pos.shape == (3, 4, 5, spec.num_spheres, 3)
    # batch entries are independent
    single = dh.sphere_positions(model, q[1, 2, 3])
    np.testing.assert_allclose(np.asarray(pos[1, 2, 3]), np.asarray(single), atol=1e-12)


def test_franka_dh_matches_urdf_chain(rng):
    """DH FK + uncorrected offsets must reproduce the URDF visual placement.

    This validates the whole extraction pipeline (sphere ordering, craig DH
    convention, chain composition) against an independent FK formulation.
    """
    spec = load_robot("franka")
    urdf = UrdfModel(f"{REF_DATA}/robots/franka/franka_spheres.urdf")
    base = np.eye(4)
    for q in random_configs(spec, rng, 3):
        ours = dh.sphere_positions_np(spec, base, q)
        truth = urdf.sphere_world_positions(
            dict(zip(spec.meta["active_joints"], q)), base
        )
        err = np.linalg.norm(ours - truth, axis=-1)
        assert err.max() < 1e-4, f"max sphere error {err.max()}"


def test_sphere_counts(robot_name):
    spec = load_robot(robot_name)
    expected = {"franka": 37, "wam": 25, "kuka": 21, "ur10": 17}[robot_name]
    assert spec.num_spheres == expected
    assert spec.sphere_offsets.shape == (expected, 3)
    assert spec.spheres_per_frame().sum() == expected


def test_wam_arm_coverage():
    """WAM upper-arm spheres must cover the DH upper-arm segment.

    The reference enumerates some equal-radius groups in reverse order vs the
    URDF; the collision geometry (union of spheres) is what matters, so check
    coverage of the segment between shoulder (z=0.346) and elbow (~0.896).
    """
    spec = load_robot("wam")
    base = np.eye(4)
    base[:3, 3] = [0, 0, 0.346]
    pos = dh.sphere_positions_np(spec, base, np.zeros(7))
    upper = pos[:8]  # first 8 spheres: upper arm, radius 0.075
    assert np.all(np.abs(upper[:, :2]) < 0.08)
    assert upper[:, 2].min() > 0.34 and upper[:, 2].max() < 0.91


def test_soa_matches_frame_gather_path(robot_name, rng):
    """The SoA fast path and the frame-gather transcription must agree
    (gradients too) — dual-implementation check for the TPU-optimized FK."""
    spec = load_robot(robot_name)
    base = np.eye(4)
    th = 0.6
    base[:3, :3] = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    base[:3, 3] = [0.05, 0.1, -0.2]
    model = dh.FkModel.from_spec(spec, base, dtype=jnp.float64)
    qs = jnp.asarray(random_configs(spec, rng, 4))
    fast = np.asarray(dh.sphere_positions(model, qs))
    slow = np.asarray(dh.sphere_positions_frames(model, qs))
    np.testing.assert_allclose(fast, slow, atol=1e-12)
    g_fast = np.asarray(
        jax.grad(lambda q: jnp.sum(jnp.sin(dh.sphere_positions(model, q))))(qs)
    )
    g_slow = np.asarray(
        jax.grad(lambda q: jnp.sum(jnp.sin(dh.sphere_positions_frames(model, q))))(qs)
    )
    np.testing.assert_allclose(g_fast, g_slow, atol=1e-12)
