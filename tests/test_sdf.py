"""SDF grid + voxelizer tests.

Covers: lookup parity with numpy twins (the reference's dual-implementation
strategy, cf. ``sdf_utils.py``'s paired tf/np ops), the custom-VJP gradient
routing (parity with ``likelihood.py:146-176``), trilinear autodiff, and the
native C++ voxelizer against both an analytic cube SDF and the numpy twin.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgpmp_tpu.sdf import grid as sdf_grid
from vgpmp_tpu.sdf.gen import load_obj, mesh_to_sdf
from vgpmp_tpu.sdf.grid import SdfGrid


@pytest.fixture(scope="module")
def toy_grid(rng):
    data = rng.normal(size=(12, 14, 16))
    origin = np.array([-0.5, -0.6, -0.7])
    delta = 0.11
    return SdfGrid.from_arrays(data, origin, delta, dtype=jnp.float64), data, origin, delta


def _points(rng, n=64):
    # include points outside the grid to exercise clipping
    return rng.uniform(-1.2, 1.2, size=(n, 3))


def test_nearest_matches_numpy(toy_grid, rng):
    g, data, origin, delta = toy_grid
    pts = _points(rng)
    got = np.asarray(sdf_grid.nearest_distance(g, jnp.asarray(pts)))
    want = sdf_grid.nearest_distance_np(data, origin, delta, pts)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_central_difference_grad_matches_numpy(toy_grid, rng):
    g, data, origin, delta = toy_grid
    pts = _points(rng)
    got = np.asarray(sdf_grid.central_difference_grad(g, jnp.asarray(pts)))
    want = sdf_grid.central_difference_grad_np(data, origin, delta, pts)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_nearest_custom_vjp_routes_central_difference(toy_grid, rng):
    """d/dp sum(w * sdf(p)) must equal w * central_diff_grad(p)."""
    g, data, origin, delta = toy_grid
    pts = jnp.asarray(_points(rng, 8))
    w = jnp.asarray(rng.normal(size=(8,)))

    grad = jax.grad(lambda p: jnp.sum(w * sdf_grid.nearest_distance(g, p)))(pts)
    want = w[:, None] * sdf_grid.central_difference_grad_np(
        data, origin, delta, np.asarray(pts)
    )
    np.testing.assert_allclose(np.asarray(grad), want, atol=1e-12)


def test_trilinear_interpolates_exactly_on_linear_field():
    """Trilinear lookup must reproduce a linear field exactly (inside grid)."""
    n = 8
    origin = np.zeros(3)
    delta = 0.25
    xs = origin[0] + delta * np.arange(n)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    data = 2.0 * X - 3.0 * Y + 0.5 * Z + 1.0
    g = SdfGrid.from_arrays(data, origin, delta, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.05, delta * (n - 1) - 0.05, size=(32, 3))
    got = np.asarray(sdf_grid.trilinear_distance(g, jnp.asarray(pts)))
    want = 2.0 * pts[:, 0] - 3.0 * pts[:, 1] + 0.5 * pts[:, 2] + 1.0
    np.testing.assert_allclose(got, want, atol=1e-12)
    # autodiff gradient equals the field's gradient
    grad = jax.vmap(jax.grad(lambda p: sdf_grid.trilinear_distance(g, p)))(jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(grad), np.tile([2.0, -3.0, 0.5], (32, 1)), atol=1e-12)


def _cube_mesh():
    v = np.array(
        [[x, y, z] for x in (-0.5, 0.5) for y in (-0.5, 0.5) for z in (-0.5, 0.5)],
        dtype=np.float64,
    )

    def quad(a, b, c, d):
        return [[a, b, c], [a, c, d]]

    f = []
    f += quad(0, 1, 3, 2)
    f += quad(4, 6, 7, 5)
    f += quad(0, 4, 5, 1)
    f += quad(2, 3, 7, 6)
    f += quad(0, 2, 6, 4)
    f += quad(1, 5, 7, 3)
    tris = np.asarray(f, dtype=np.int32)
    return v, tris, np.zeros(len(tris), dtype=np.int32)


def test_voxelizer_matches_analytic_cube():
    v, tris, piece = _cube_mesh()
    data, origin, delta = mesh_to_sdf(v, tris, piece, delta=0.05, padding=6)
    nx, ny, nz = data.shape
    xs = origin[0] + delta * np.arange(nx)
    ys = origin[1] + delta * np.arange(ny)
    zs = origin[2] + delta * np.arange(nz)
    P = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), axis=-1)
    q = np.abs(P) - 0.5
    ref = np.linalg.norm(np.maximum(q, 0), axis=-1) + np.minimum(q.max(axis=-1), 0)
    np.testing.assert_allclose(data, ref, atol=1e-6)


def test_native_voxelizer_matches_numpy_twin():
    v, tris, piece = _cube_mesh()
    native, o1, d1 = mesh_to_sdf(v, tris, piece, delta=0.07, padding=4)
    twin, o2, d2 = mesh_to_sdf(v, tris, piece, delta=0.07, padding=4, use_native=False)
    np.testing.assert_allclose(native, twin, atol=1e-6)
    np.testing.assert_allclose(o1, o2)


def test_overlapping_pieces_union_sign():
    """Two overlapping cubes: points inside both must still read as inside."""
    v1, t1, _ = _cube_mesh()
    v2 = v1 + np.array([0.4, 0.0, 0.0])
    verts = np.concatenate([v1, v2])
    tris = np.concatenate([t1, t1 + 8]).astype(np.int32)
    piece = np.concatenate([np.zeros(12), np.ones(12)]).astype(np.int32)
    data, origin, delta = mesh_to_sdf(verts, tris, piece, delta=0.05, padding=4)
    # point in the overlap region (x ~ 0.2, inside both cubes)
    idx = np.round((np.array([0.2, 0.0, 0.0]) - origin) / delta).astype(int)
    assert data[idx[0], idx[1], idx[2]] < 0


def test_scene_assets_exist_and_load():
    for scene in ["industrial", "bookshelves", "lab", "boxes"]:
        g = SdfGrid.load(
            __file__.replace("tests/test_sdf.py", "vgpmp_tpu/assets/scenes/") + f"{scene}.npz"
        )
        assert g.data.ndim == 3
        assert float(g.data.min()) < 0 < float(g.data.max())


def test_real_scene_obj_loads():
    verts, tris, piece = load_obj("/root/reference/data/scenes/industrial/industrial-acd.obj")
    assert len(tris) == 422
    assert piece.max() > 0  # ACD mesh has many convex pieces


def test_packed_matches_nearest_within_bf16(toy_grid, rng):
    """PackedSdfGrid: values/gradients equal the exact nearest-cell path up
    to bfloat16 rounding (<= 2^-9 relative)."""
    g, data, origin, delta = toy_grid
    g32 = SdfGrid.from_arrays(data, origin, delta, dtype=jnp.float32)
    pk = sdf_grid.PackedSdfGrid.pack(g32)
    pts = jnp.asarray(_points(rng, 256), jnp.float32)
    v_exact = np.asarray(sdf_grid.nearest_distance(g32, pts))
    v_pack = np.asarray(sdf_grid.packed_nearest_distance(pk, pts))
    np.testing.assert_allclose(v_pack, v_exact, rtol=2 ** -8, atol=1e-7)

    w = jnp.asarray(rng.normal(size=256), jnp.float32)
    g_exact = np.asarray(
        jax.grad(lambda p: jnp.sum(w * sdf_grid.nearest_distance(g32, p)))(pts)
    )
    g_pack = np.asarray(
        jax.grad(lambda p: jnp.sum(w * sdf_grid.packed_nearest_distance(pk, p)))(pts)
    )
    np.testing.assert_allclose(g_pack, g_exact, rtol=2 ** -7, atol=1e-6)


def test_packed_zero_replacement_hack_preserved(rng):
    """Flat-plateau voxels must pack the reference's 0.1 gradient
    replacement (``sdf_utils.py:124-135``)."""
    data = np.ones((6, 6, 6))  # constant field -> all central diffs zero
    g = SdfGrid.from_arrays(data, np.zeros(3), 0.1, dtype=jnp.float32)
    pk = sdf_grid.PackedSdfGrid.pack(g)
    pts = jnp.asarray(rng.uniform(0.05, 0.45, size=(16, 3)), jnp.float32)
    grad = np.asarray(
        jax.grad(lambda p: jnp.sum(sdf_grid.packed_nearest_distance(pk, p)))(pts)
    )
    np.testing.assert_allclose(grad, 0.1, rtol=2 ** -9)  # bf16 rounding of 0.1
