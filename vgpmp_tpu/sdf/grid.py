"""Voxel signed-distance-field lookups, TPU-first.

Reimplements the reference's dense-grid SDF
(``gpflow_vgpmp/utils/sdf_utils.py:25-136``) as pure JAX:

- lookups are one flat gather (``data.reshape(-1)[flat_idx]``) instead of a
  3-D ``gather_nd`` — a single XLA gather op that fuses with the surrounding
  elementwise work;
- ``mode='nearest'`` reproduces the reference exactly: nearest-cell value with
  a custom VJP routing the upstream gradient through the *central-difference*
  spatial gradient, including the reference's zero-gradient -> 0.1 replacement
  hack (``sdf_utils.py:124-135`` and ``likelihood.py:146-176``);
- ``mode='trilinear'`` is the TPU-native upgrade: C0 interpolation whose
  autodiff gradient is the exact piecewise-constant trilinear derivative — no
  custom VJP needed and no zero-gradient plateaus at cell granularity.

Grids are small pytrees (``data [nx,ny,nz], origin [3], delta []``) so they
batch/shard like any other array.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = [
    "SdfGrid",
    "PackedSdfGrid",
    "nearest_distance",
    "trilinear_distance",
    "packed_nearest_distance",
    "distance",
]


@struct.dataclass
class SdfGrid:
    data: jnp.ndarray    # [nx, ny, nz] signed distances, meters
    origin: jnp.ndarray  # [3] world position of voxel (0,0,0)
    delta: jnp.ndarray   # [] voxel edge length

    @property
    def shape(self):
        return self.data.shape

    @classmethod
    def from_arrays(cls, data, origin, delta, dtype: Any = jnp.float32) -> "SdfGrid":
        return cls(
            data=jnp.asarray(data, dtype=dtype),
            origin=jnp.asarray(origin, dtype=dtype),
            delta=jnp.asarray(delta, dtype=dtype),
        )

    @classmethod
    def load(cls, path, dtype: Any = jnp.float32) -> "SdfGrid":
        """Load a grid from the ``.npz`` artifact written by the asset tools."""
        with np.load(path) as z:
            return cls.from_arrays(z["data"], z["origin"], float(z["delta"]), dtype)

    @staticmethod
    def save_npz(path, data: np.ndarray, origin: np.ndarray, delta: float,
                 meta: dict | None = None, storage_dtype=np.float16):
        """Write a grid artifact. Storage defaults to float16: worst-case
        quantization is ~1.2e-4 m inside the hinge-active band (|d| < 0.25 m)
        — an order of magnitude below voxel pitch, and far finer than the
        bf16 the packed training path quantizes to anyway — while halving
        the on-disk artifact (the finer round-5 grids are 28-54M voxels)."""
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            path, data=data.astype(storage_dtype),
            origin=np.asarray(origin, np.float64), delta=np.float64(delta),
        )
        if meta:
            path.with_suffix(".json").write_text(json.dumps(meta, indent=1))

    # -------- reference-format interop (sdf_utils.py:138-215 equivalents) --

    @classmethod
    def from_sdf_text(cls, path, dtype: Any = jnp.float32) -> "SdfGrid":
        """Parse the reference/SDFGen text format (``from_sdf``,
        ``sdf_utils.py:195-210``): header = dims / origin / delta, then one
        value per line with x fastest."""
        with open(path) as f:
            nx, ny, nz = (int(v) for v in f.readline().split())
            origin = np.asarray([float(v) for v in f.readline().split()])
            delta = float(f.readline().strip())
            vals = np.loadtxt(f, dtype=np.float64)
        data = vals.reshape(nz, ny, nx).transpose(2, 1, 0)  # x fastest -> [x,y,z]
        return cls.from_arrays(data, origin, delta, dtype)

    def to_sdf_text(self, path) -> None:
        """Write the reference/SDFGen text format (inverse of
        :meth:`from_sdf_text`)."""
        data = np.asarray(self.data)
        origin = np.asarray(self.origin, dtype=np.float64)
        with open(path, "w") as f:
            f.write(f"{data.shape[0]} {data.shape[1]} {data.shape[2]}\n")
            f.write(f"{origin[0]} {origin[1]} {origin[2]}\n")
            f.write(f"{float(self.delta)}\n")
            np.savetxt(f, data.transpose(2, 1, 0).reshape(-1), fmt="%.6g")

    def resized(self, ratio: float) -> "SdfGrid":
        """Uniform metric rescale (``sdf_utils.py:46-54``): distances, voxel
        pitch and origin all scale by ``ratio``."""
        return SdfGrid(
            data=self.data * ratio, origin=self.origin * ratio,
            delta=self.delta * ratio,
        )

    def trimmed(self, lo: np.ndarray, hi: np.ndarray) -> "SdfGrid":
        """Crop to cell-index box [lo, hi) (generalizes ``trim``,
        ``sdf_utils.py:138-159``)."""
        lo = np.asarray(lo, dtype=int)
        hi = np.asarray(hi, dtype=int)
        data = self.data[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]]
        return SdfGrid(
            data=data, origin=self.origin + self.delta * jnp.asarray(lo, self.origin.dtype),
            delta=self.delta,
        )


def _cell_index(grid: SdfGrid, points: jnp.ndarray) -> jnp.ndarray:
    """Clipped integer cell index per point: ``[..., 3] -> [..., 3] int32``."""
    nmax = jnp.asarray(
        [grid.data.shape[0] - 1, grid.data.shape[1] - 1, grid.data.shape[2] - 1],
        dtype=jnp.int32,
    )
    idx = jnp.floor((points - grid.origin) / grid.delta).astype(jnp.int32)
    return jnp.clip(idx, 0, nmax)


def _gather(grid: SdfGrid, idx: jnp.ndarray) -> jnp.ndarray:
    """Flat gather of ``data[ix, iy, iz]`` for integer index tensors."""
    nx, ny, nz = grid.data.shape
    flat = (idx[..., 0] * ny + idx[..., 1]) * nz + idx[..., 2]
    return jnp.take(grid.data.reshape(-1), flat, axis=0)


def central_difference_grad(
    grid: SdfGrid, points: jnp.ndarray, zero_replacement: float = 0.1
) -> jnp.ndarray:
    """Central-difference spatial gradient at the nearest cell, ``[..., 3]``.

    Parity with ``sdf_utils.get_distance_grad_tf`` (``sdf_utils.py:100-136``),
    including the reference's replacement of exactly-zero components with
    ``0.1`` (a hand-tuned escape from flat SDF plateaus). Pass
    ``zero_replacement=0.0`` to disable the hack.
    """
    idx = _cell_index(grid, points)
    nmax = jnp.asarray([s - 1 for s in grid.data.shape], dtype=jnp.int32)
    comps = []
    for axis in range(3):
        e = jnp.zeros((3,), dtype=jnp.int32).at[axis].set(1)
        hi = jnp.clip(idx + e, 0, nmax)
        lo = jnp.clip(idx - e, 0, nmax)
        d = (_gather(grid, hi) - _gather(grid, lo)) / (2.0 * grid.delta)
        if zero_replacement:
            d = jnp.where(d == 0, jnp.asarray(zero_replacement, d.dtype), d)
        comps.append(d)
    return jnp.stack(comps, axis=-1)


def _nearest_raw(grid: SdfGrid, points: jnp.ndarray) -> jnp.ndarray:
    return _gather(grid, _cell_index(grid, points))


def nearest_distance(
    grid: SdfGrid, points: jnp.ndarray, zero_replacement: float = 0.1
) -> jnp.ndarray:
    """Nearest-cell SDF value with central-difference custom VJP.

    The lookup itself is non-differentiable (piecewise constant); the VJP
    chains the upstream scalar through the central-difference spatial
    gradient, exactly as the reference's ``@tf.custom_gradient`` does
    (``likelihood.py:146-176``).
    """

    @jax.custom_vjp
    def _lookup(p):
        return _nearest_raw(grid, p)

    def _fwd(p):
        return _nearest_raw(grid, p), central_difference_grad(grid, p, zero_replacement)

    def _bwd(res, g):
        return (g[..., None] * res,)

    _lookup.defvjp(_fwd, _bwd)
    return _lookup(points)


# -------------------------------------------------------- packed fast path


def _round_f32_to_bf16_bits(x: np.ndarray) -> np.ndarray:
    """Top-16-bit (bfloat16) rounding of float32, round-to-nearest-even,
    returned as uint32 with the low 16 bits zeroed."""
    u = np.ascontiguousarray(x, dtype=np.float32).view(np.uint32)
    rounded = u + 0x8000 + ((u >> 16) & 1)
    return rounded & 0xFFFF0000


@struct.dataclass
class PackedSdfGrid:
    """Gather-optimized nearest-cell SDF: value + central-difference gradient
    pre-packed as 4 x bfloat16 in two uint32 words per voxel.

    Motivation (measured, TPU v5e): XLA lowers each ``jnp.take`` with random
    indices to a latency-bound ~8 cycles/element gather, so the reference
    semantics of ``nearest_distance`` (1 value gather forward + 6
    central-difference gathers for the custom VJP; ``sdf_utils.py:100-136``)
    cost 7 gather passes per query point per step. The spatial gradient is a
    *static* function of the grid, so we precompute it per voxel at pack time
    (including the reference's zero->0.1 replacement hack) and quantize
    [d, gx, gy, gz] to bfloat16 — bf16 is the top 16 bits of f32, so packing
    is bit-masking and unpacking is ``bitcast(word & 0xFFFF0000)`` /
    ``bitcast(word << 16)``.

    The two words per voxel live side by side in one ``[ncells, 2]`` array so
    the training-path lookup is ONE 8-byte slice gather — measured on v5e:
    10.55 ns/pt vs 7.84 for a single 4-byte gather and 16.36 for two separate
    gathers, i.e. the fused fetch costs 1.35 single gathers instead of 2.
    Seven gather passes (reference semantics) become ~1.35.

    Accuracy: bf16 keeps 8 mantissa bits — near the surface (|d| ~ hinge
    epsilon, 5 cm) the absolute error is ~2e-4 m, far below voxel pitch; far
    values are hinge-inactive. Exact-parity mode stays available via
    ``nearest_distance`` on the unpacked grid.
    """

    words: jnp.ndarray    # [nx*ny*nz, 2] uint32:
    #   word 0 = bf16(value) | bf16(grad_x) >> 16
    #   word 1 = bf16(grad_y) | bf16(grad_z) >> 16
    origin: jnp.ndarray   # [3]
    delta: jnp.ndarray    # []
    shape: tuple = struct.field(pytree_node=False, default=())

    @classmethod
    def pack(cls, grid: SdfGrid, zero_replacement: float = 0.1) -> "PackedSdfGrid":
        data = np.asarray(grid.data, dtype=np.float32)
        # central-difference gradient per voxel, clipped at the borders —
        # identical to ``central_difference_grad`` evaluated at cell centers
        grads = []
        for axis in range(3):
            hi = np.concatenate(
                [np.take(data, range(1, data.shape[axis]), axis=axis),
                 np.take(data, [-1], axis=axis)], axis=axis)
            lo = np.concatenate(
                [np.take(data, [0], axis=axis),
                 np.take(data, range(0, data.shape[axis] - 1), axis=axis)], axis=axis)
            d = (hi - lo) / (2.0 * float(grid.delta))
            if zero_replacement:
                d = np.where(d == 0, np.float32(zero_replacement), d).astype(np.float32)
            grads.append(d)
        val = _round_f32_to_bf16_bits(data).reshape(-1)
        gx = _round_f32_to_bf16_bits(grads[0]).reshape(-1)
        gy = _round_f32_to_bf16_bits(grads[1]).reshape(-1)
        gz = _round_f32_to_bf16_bits(grads[2]).reshape(-1)
        return cls(
            words=jnp.stack(
                [jnp.asarray(val | (gx >> 16)), jnp.asarray(gy | (gz >> 16))],
                axis=1,
            ),
            origin=grid.origin,
            delta=grid.delta,
            shape=tuple(int(s) for s in grid.data.shape),
        )


def _packed_flat_index(packed: PackedSdfGrid, points: jnp.ndarray) -> jnp.ndarray:
    nx, ny, nz = packed.shape
    nmax = jnp.asarray([nx - 1, ny - 1, nz - 1], dtype=jnp.int32)
    idx = jnp.floor((points - packed.origin) / packed.delta).astype(jnp.int32)
    idx = jnp.clip(idx, 0, nmax)
    return (idx[..., 0] * ny + idx[..., 1]) * nz + idx[..., 2]


def _unpack_hi(w: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(w & jnp.uint32(0xFFFF0000), jnp.float32)


def _unpack_lo(w: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(w << 16, jnp.float32)


def packed_nearest_distance(packed: PackedSdfGrid, points: jnp.ndarray) -> jnp.ndarray:
    """Nearest-cell SDF value from a :class:`PackedSdfGrid`.

    One 8-byte slice gather fetches value AND pre-packed gradient together
    (see the class docstring for the measured costs). Forward: bf16-rounded
    nearest-cell value. Backward: upstream scalar times the per-voxel
    central-difference gradient — the same custom-VJP semantics as
    :func:`nearest_distance` at bf16 precision, with zero backward gathers.
    """

    @jax.custom_vjp
    def _lookup(p):
        flat = _packed_flat_index(packed, p)
        return _unpack_hi(jnp.take(packed.words[:, 0], flat, axis=0))

    def _fwd(p):
        flat = _packed_flat_index(packed, p)
        w = jnp.take(packed.words, flat, axis=0)  # [..., 2] one slice gather
        w0, w1 = w[..., 0], w[..., 1]
        grad = jnp.stack(
            [_unpack_lo(w0), _unpack_hi(w1), _unpack_lo(w1)], axis=-1
        ).astype(p.dtype)
        return _unpack_hi(w0).astype(p.dtype), grad

    def _bwd(res, g):
        return (g[..., None] * res,)

    _lookup.defvjp(_fwd, _bwd)
    return _lookup(points).astype(points.dtype)


def trilinear_distance(grid: SdfGrid, points: jnp.ndarray) -> jnp.ndarray:
    """C0 trilinear SDF interpolation; differentiable by plain autodiff.

    Uses the cell-corner convention: corner (i,j,k) sits at
    ``origin + delta * (i,j,k)``. Points outside the grid clamp to the border
    values (matching the reference's clipping semantics).
    """
    nmax = jnp.asarray([s - 1 for s in grid.data.shape], dtype=points.dtype)
    rel = (points - grid.origin) / grid.delta
    rel = jnp.clip(rel, 0.0, nmax)
    i0 = jnp.clip(jnp.floor(rel).astype(jnp.int32), 0, (nmax - 1).astype(jnp.int32))
    frac = rel - i0.astype(points.dtype)

    def corner(dx, dy, dz):
        return _gather(grid, i0 + jnp.asarray([dx, dy, dz], dtype=jnp.int32))

    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    c00 = corner(0, 0, 0) * (1 - fz) + corner(0, 0, 1) * fz
    c01 = corner(0, 1, 0) * (1 - fz) + corner(0, 1, 1) * fz
    c10 = corner(1, 0, 0) * (1 - fz) + corner(1, 0, 1) * fz
    c11 = corner(1, 1, 0) * (1 - fz) + corner(1, 1, 1) * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


def distance(grid: SdfGrid, points: jnp.ndarray, mode: str = "trilinear") -> jnp.ndarray:
    """Dispatch: ``mode in ('trilinear', 'nearest')``; see module docstring."""
    if mode == "trilinear":
        return trilinear_distance(grid, points)
    if mode == "nearest":
        return nearest_distance(grid, points)
    raise ValueError(f"unknown SDF mode {mode!r}")


# ----------------------------------------------------------------- numpy twins


def nearest_distance_np(data: np.ndarray, origin, delta, points: np.ndarray) -> np.ndarray:
    nmax = np.asarray(data.shape) - 1
    idx = np.clip(np.floor((points - origin) / delta).astype(int), 0, nmax)
    return data[idx[..., 0], idx[..., 1], idx[..., 2]]


def central_difference_grad_np(
    data: np.ndarray, origin, delta, points: np.ndarray, zero_replacement: float = 0.1
) -> np.ndarray:
    nmax = np.asarray(data.shape) - 1
    idx = np.clip(np.floor((points - origin) / delta).astype(int), 0, nmax)
    out = []
    for axis in range(3):
        e = np.zeros(3, dtype=int)
        e[axis] = 1
        hi = np.clip(idx + e, 0, nmax)
        lo = np.clip(idx - e, 0, nmax)
        d = (
            data[hi[..., 0], hi[..., 1], hi[..., 2]]
            - data[lo[..., 0], lo[..., 1], lo[..., 2]]
        ) / (2 * delta)
        if zero_replacement:
            d = np.where(d == 0, zero_replacement, d)
        out.append(d)
    return np.stack(out, axis=-1)
