"""Composable-scene tests (reference Scene/BaseObject layer,
``tests/test_scene.py`` in the reference)."""

import jax.numpy as jnp
import numpy as np

from vgpmp_tpu.scene import Primitives, Scene
from vgpmp_tpu.sdf.grid import SdfGrid


def _flat_grid(value=1.0, n=8, delta=0.5):
    return SdfGrid.from_arrays(
        np.full((n, n, n), value), np.array([-n / 2 * delta] * 3), delta,
        dtype=jnp.float64,
    )


def test_primitive_sphere_box_capsule():
    p = Primitives.empty(jnp.float64)
    p = p.replace(
        sphere_centers=jnp.array([[1.0, 0.0, 0.0]]),
        sphere_radii=jnp.array([0.5]),
        box_centers=jnp.array([[-2.0, 0.0, 0.0]]),
        box_rotations=jnp.eye(3)[None],
        box_half_extents=jnp.array([[0.5, 0.5, 0.5]]),
        capsule_a=jnp.array([[0.0, 2.0, 0.0]]),
        capsule_b=jnp.array([[0.0, 3.0, 0.0]]),
        capsule_radii=jnp.array([0.25]),
    )
    pts = jnp.array([
        [1.0, 0.0, 0.0],    # sphere center -> -0.5
        [2.0, 0.0, 0.0],    # 1.0 from sphere center -> 0.5
        [-2.0, 0.0, 0.0],   # box center -> -0.5
        [-2.0, 1.0, 0.0],   # 0.5 beyond box face -> 0.5
        [0.0, 2.5, 0.5],    # 0.5 off capsule axis midpoint -> 0.25
    ])
    d = np.asarray(p.distance(pts))
    np.testing.assert_allclose(d, [-0.5, 0.5, -0.5, 0.5, 0.25], atol=1e-12)


def test_rotated_box():
    rot = np.array([[0, 1, 0], [-1, 0, 0], [0, 0, 1.0]])  # world->box 90deg about z
    p = Primitives.empty(jnp.float64).replace(
        box_centers=jnp.zeros((1, 3)),
        box_rotations=jnp.asarray(rot)[None],
        box_half_extents=jnp.array([[1.0, 0.25, 0.25]]),
    )
    # box long axis lies along world y after rotation
    assert float(p.distance(jnp.array([0.0, 0.9, 0.0]))) < 0
    assert float(p.distance(jnp.array([0.9, 0.0, 0.0]))) > 0


def test_scene_composition_min():
    base = _flat_grid(1.0)
    obj = Primitives.empty(jnp.float64).replace(
        sphere_centers=jnp.array([[0.0, 0.0, 0.0]]), sphere_radii=jnp.array([0.3])
    )
    scene = Scene(
        base=base, base_offset=jnp.zeros(3), primitives=obj, mode="nearest"
    )
    # at origin: base says 1.0, sphere says -0.3 -> min is -0.3
    d = float(scene.distance(jnp.zeros(3)))
    np.testing.assert_allclose(d, -0.3, atol=1e-12)
    # far from sphere: base value wins
    d2 = float(scene.distance(jnp.array([1.5, 1.5, 1.5])))
    np.testing.assert_allclose(d2, 1.0, atol=1e-12)


def test_scene_extra_grid_offset():
    base = _flat_grid(1.0)
    # proper mini-SDF of a 0.2-radius sphere (positive at the grid border —
    # border values clamp for out-of-grid queries, so they must be >= 0)
    n, delta = 9, 0.25
    axes = (np.arange(n) - n // 2) * delta
    X, Y, Z = np.meshgrid(axes, axes, axes, indexing="ij")
    ball = np.sqrt(X**2 + Y**2 + Z**2) - 0.2
    obj = SdfGrid.from_arrays(ball, np.array([axes[0]] * 3), delta, dtype=jnp.float64)
    scene = Scene(
        base=base,
        base_offset=jnp.zeros(3),
        extra_grids=(obj,),
        extra_offsets=jnp.array([[1.0, 0.0, 0.0]]),
        mode="nearest",
    )
    # at the object's world position: inside the ball
    assert float(scene.distance(jnp.array([1.0, 0.0, 0.0]))) < 0
    # far away: clamped object border stays positive; base may or may not win
    assert float(scene.distance(jnp.array([-1.5, 0.0, 0.0]))) > 0


def test_moving_object_no_recompile():
    import jax

    base = _flat_grid(1.0)
    p = Primitives.empty(jnp.float64).replace(
        sphere_centers=jnp.array([[0.0, 0.0, 0.0]]), sphere_radii=jnp.array([0.3])
    )
    scene = Scene(base=base, base_offset=jnp.zeros(3), primitives=p)
    f = jax.jit(lambda s, x: s.distance(x))
    x = jnp.array([0.5, 0.0, 0.0])
    d1 = float(f(scene, x))
    moved = scene.replace(
        primitives=p.replace(sphere_centers=jnp.array([[0.5, 0.0, 0.0]]))
    )
    d2 = float(f(moved, x))  # same compiled fn, new pose
    np.testing.assert_allclose(d1, 0.2, atol=1e-12)
    np.testing.assert_allclose(d2, -0.3, atol=1e-12)
    assert f._cache_size() == 1


# ---------------------------------------------------------------------------
# Named-object registry (reference Scene.add_object/remove_object surface,
# utils/scene.py:61-138 + bullet_object.py object_mapping)
# ---------------------------------------------------------------------------


import pytest


def _tiny_grid(dtype=jnp.float64):
    # small all-free-space base grid
    return _flat_grid(value=1.0, n=8, delta=0.25)


def test_scene_builder_registry_roundtrip():
    import numpy as np
    from vgpmp_tpu.scene import OBJECT_LIBRARY, SceneBuilder

    b = SceneBuilder(base=_tiny_grid(), dtype=jnp.float64)
    b.add_object("cube", [2.0, 0.0, 0.0])
    b.add_object("pringles", [0.0, 2.0, 0.0])
    b.add_object("duck", [0.0, -2.0, 0.0])
    assert b.names == ["cube", "pringles", "duck"]
    assert b.get_object_index_by_name("pringles") == 1
    assert b.get_object_by_index(2).name == "duck"

    scene = b.build()
    # point inside the cube: negative distance; far point: positive
    d_in = float(scene.distance(jnp.asarray([2.0, 0.0, 0.0])))
    d_out = float(scene.distance(jnp.asarray([0.0, 0.0, 0.9])))
    assert d_in < 0 < d_out

    # removal by name restores the base-only field
    b.remove_object("cube")
    b.remove_object_by_index(0)  # pringles
    b.remove_object("duck")
    assert b.names == []
    scene2 = b.build()
    assert float(scene2.distance(jnp.asarray([2.0, 0.0, 0.0]))) > 0

    with pytest.raises(KeyError):
        b.add_object("teapot", [0, 0, 0])
    assert "pringles" in OBJECT_LIBRARY


def test_scene_builder_move_preserves_pytree_structure():
    """Moving an object is array-data only: the rebuilt Scene has the same
    treedef (no recompile), and the SDF follows the object."""
    import jax
    from vgpmp_tpu.scene import SceneBuilder

    b = SceneBuilder(base=_tiny_grid(), dtype=jnp.float64)
    b.add_object("duck", [2.0, 0.0, 0.0])
    s1 = b.build()
    b.move_object("duck", [-2.0, 0.0, 0.0])
    s2 = b.build()
    assert jax.tree.structure(s1) == jax.tree.structure(s2)
    p = jnp.asarray([-2.0, 0.0, 0.05])
    assert float(s2.distance(p)) < 0 < float(s1.distance(p))
