"""Batched Denavit–Hartenberg forward kinematics, TPU-first.

Reimplements the math of the reference FK engine
(``gpflow_vgpmp/utils/sampler.py:103-244`` and the numpy fallback in
``gpflow_vgpmp/utils/robot_mixin.py:32-58``) as pure JAX over arbitrary batch
dimensions. Design choices for TPU/XLA:

- the dof-long chain of 4x4 products is a *statically unrolled* loop — dof is
  6–8, so unrolling lets XLA fuse the whole chain into one kernel with no
  scan overhead and no dynamic shapes;
- all sphere bookkeeping (frame gather + offset application) is expressed as
  one gather + one einsum so the entire ``[B?, S, N] -> [B?, S, N, P, 3]``
  rollout is a single fused elementwise/contraction program;
- everything is dtype-polymorphic: float32 on TPU by default, float64 under
  ``jax_enable_x64`` for parity tests against the reference's numerics.

A numpy twin of every op is provided for golden tests (the reference's own
test strategy: dual implementation, ``tests/test_robot.py:97-109``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from vgpmp_tpu.robots import RobotSpec

__all__ = ["FkModel", "dh_matrices", "fk_frames", "sphere_positions"]


@struct.dataclass
class FkModel:
    """Static FK constants for one robot, as device arrays.

    ``craig`` selects the Craig/modified DH convention and is a static
    (non-pytree) field so each robot compiles its own specialized program.
    """

    d: jnp.ndarray          # [dof]
    a: jnp.ndarray          # [dof]
    alpha: jnp.ndarray      # [dof]
    twist: jnp.ndarray      # [dof]
    base: jnp.ndarray       # [4, 4] world pose of the FK base frame
    sphere_frame: jnp.ndarray    # [P] int32 index into the (dof+1) chain frames
    sphere_offsets: jnp.ndarray  # [P, 3]
    sphere_radii: jnp.ndarray    # [P]
    craig: bool = struct.field(pytree_node=False, default=False)
    dof: int = struct.field(pytree_node=False, default=7)
    # static (hashable) twins of the constants above, used by the
    # structure-of-arrays fast path (:func:`sphere_positions`) so per-joint
    # DH constants fold into the compiled elementwise program (zero terms
    # vanish). Frame slices: contiguous [s0, s1) sphere ranges per chain
    # frame — valid because robot specs list spheres in kinematic-chain
    # order (asserted in ``from_spec``).
    dh_static: tuple = struct.field(pytree_node=False, default=())
    twist_static: tuple = struct.field(pytree_node=False, default=())
    base_static: tuple = struct.field(pytree_node=False, default=())
    frame_slices: tuple = struct.field(pytree_node=False, default=())
    offsets_static: tuple = struct.field(pytree_node=False, default=())

    @classmethod
    def from_spec(
        cls, spec: RobotSpec, base_pose: np.ndarray, dtype: Any = jnp.float32
    ) -> "FkModel":
        """Bake a :class:`RobotSpec` + world base pose into device constants.

        ``sphere_frame`` is pre-composed with ``fk_slice`` so the runtime does
        a single gather from the full frame chain (the reference gathers
        ``fk_slice`` then repeats per-link counts; ``sampler.py:237-244``).
        """
        frame_global = np.asarray(spec.fk_slice[spec.sphere_frame])
        assert np.all(np.diff(frame_global) >= 0), (
            "sphere frames must be in kinematic-chain order for the SoA FK "
            "fast path (all shipped robot specs are)"
        )
        slices = []
        for f in range(int(spec.dof) + 1):
            idx = np.nonzero(frame_global == f)[0]
            if len(idx):
                slices.append((f, int(idx[0]), int(idx[-1]) + 1))
        base_np = np.asarray(base_pose, dtype=np.float64)
        return cls(
            d=jnp.asarray(spec.dh[:, 0], dtype=dtype),
            a=jnp.asarray(spec.dh[:, 1], dtype=dtype),
            alpha=jnp.asarray(spec.dh[:, 2], dtype=dtype),
            twist=jnp.asarray(spec.twist, dtype=dtype),
            base=jnp.asarray(base_pose, dtype=dtype),
            sphere_frame=jnp.asarray(frame_global, dtype=jnp.int32),
            sphere_offsets=jnp.asarray(spec.sphere_offsets, dtype=dtype),
            sphere_radii=jnp.asarray(spec.sphere_radii, dtype=dtype),
            craig=bool(spec.craig_dh),
            dof=int(spec.dof),
            dh_static=tuple(
                (float(d_), float(a_), float(al_)) for d_, a_, al_ in np.asarray(spec.dh)
            ),
            twist_static=tuple(float(t) for t in np.asarray(spec.twist)),
            base_static=tuple(float(v) for v in base_np.reshape(-1)),
            frame_slices=tuple(slices),
            offsets_static=tuple(
                tuple(float(v) for v in row) for row in np.asarray(spec.sphere_offsets)
            ),
        )


def dh_matrices(thetas: jnp.ndarray, d, a, alpha, craig: bool) -> jnp.ndarray:
    """DH link transforms for a batch of joint angles.

    Args:
        thetas: ``[..., dof]`` joint angles (twist already added).
        d, a, alpha: ``[dof]`` DH constants.
        craig: modified (Craig) vs classic (Spong) convention — matches
            ``robot_mixin.py:60-155``.

    Returns:
        ``[..., dof, 4, 4]`` homogeneous transforms.
    """
    ct, st = jnp.cos(thetas), jnp.sin(thetas)
    ca, sa = jnp.cos(alpha), jnp.sin(alpha)
    zero = jnp.zeros_like(ct)
    one = jnp.ones_like(ct)
    ca = jnp.broadcast_to(ca, ct.shape)
    sa = jnp.broadcast_to(sa, ct.shape)
    a_ = jnp.broadcast_to(a, ct.shape)
    d_ = jnp.broadcast_to(d, ct.shape)
    if craig:
        rows = [
            ct, -st, zero, a_,
            st * ca, ct * ca, -sa, -d_ * sa,
            st * sa, ct * sa, ca, d_ * ca,
            zero, zero, zero, one,
        ]
    else:
        rows = [
            ct, -st * ca, st * sa, a_ * ct,
            st, ct * ca, -ct * sa, a_ * st,
            zero, sa, ca, d_,
            zero, zero, zero, one,
        ]
    flat = jnp.stack(rows, axis=-1)  # [..., dof, 16]
    return flat.reshape(flat.shape[:-1] + (4, 4))


def fk_frames(model: FkModel, thetas: jnp.ndarray) -> jnp.ndarray:
    """Cumulative FK chain: ``[..., dof] -> [..., dof+1, 4, 4]``.

    Frame 0 is the base pose; frame i is ``base @ T_1 @ ... @ T_i`` — the
    same layout as the reference's ``tf.scan(tf.matmul)`` chain
    (``sampler.py:103-120``), but statically unrolled.
    """
    T = dh_matrices(thetas + model.twist, model.d, model.a, model.alpha, model.craig)
    batch_shape = thetas.shape[:-1]
    acc = jnp.broadcast_to(model.base, batch_shape + (4, 4))
    frames = [acc]
    for i in range(model.dof):
        acc = acc @ T[..., i, :, :]
        frames.append(acc)
    return jnp.stack(frames, axis=-3)


def sphere_positions_frames(model: FkModel, thetas: jnp.ndarray) -> jnp.ndarray:
    """Frame-gather sphere rollout (the direct transcription of the
    reference's ``forward_kinematics_cost``, ``sampler.py:216-244``).

    Kept as the cross-check twin of :func:`sphere_positions`; on TPU the
    batched 4x4 matmuls + frame gather materialize ``[..., P, 4, 4]`` in HBM
    and run ~17x slower than the SoA path (measured v5e).
    """
    frames = fk_frames(model, thetas)  # [..., dof+1, 4, 4]
    sel = jnp.take(frames, model.sphere_frame, axis=-3)  # [..., P, 4, 4]
    R = sel[..., :3, :3]
    t = sel[..., :3, 3]
    return jnp.einsum("...pij,pj->...pi", R, model.sphere_offsets) + t


def sphere_positions(model: FkModel, thetas: jnp.ndarray) -> jnp.ndarray:
    """World positions of collision spheres: ``[..., dof] -> [..., P, 3]``.

    Structure-of-arrays fast path: the rotation/translation of each chain
    frame is carried as 12 separate ``[...]``-shaped lanes-resident arrays and
    the DH compose is unrolled with *static* per-joint constants (zero terms
    fold away), so the whole rollout is one fused VPU elementwise program —
    no 4x4 batched matmuls, no ``[..., P, 4, 4]`` frame gather. ~17x faster
    than :func:`sphere_positions_frames` on TPU v5e at benchmark shapes.
    """
    if not model.frame_slices:  # hand-built FkModel without static twins
        return sphere_positions_frames(model, thetas)
    dt = thetas.dtype
    ang = thetas + jnp.asarray(model.twist_static, dt)
    ct = jnp.cos(ang)
    st = jnp.sin(ang)
    bsh = thetas.shape[:-1]
    b = model.base_static
    R = [[jnp.broadcast_to(jnp.asarray(b[4 * i + j], dt), bsh) for j in range(3)]
         for i in range(3)]
    t = [jnp.broadcast_to(jnp.asarray(b[4 * i + 3], dt), bsh) for i in range(3)]
    offs = model.offsets_static
    parts = []

    def emit(fidx):
        for (f, s0, s1) in model.frame_slices:
            if f != fidx:
                continue
            ox = jnp.asarray([offs[p][0] for p in range(s0, s1)], dt)
            oy = jnp.asarray([offs[p][1] for p in range(s0, s1)], dt)
            oz = jnp.asarray([offs[p][2] for p in range(s0, s1)], dt)
            xyz = [
                R[k][0][..., None] * ox + R[k][1][..., None] * oy
                + R[k][2][..., None] * oz + t[k][..., None]
                for k in range(3)
            ]
            parts.append(jnp.stack(xyz, axis=-1))  # [..., s1-s0, 3]

    emit(0)
    last_frame = model.frame_slices[-1][0]
    for i in range(min(model.dof, last_frame)):
        d_, a_, al_ = model.dh_static[i]
        ca, sa = float(np.cos(al_)), float(np.sin(al_))
        c, s = ct[..., i], st[..., i]
        if model.craig:
            # rows of T_i (robot_mixin.py Craig convention), entries are
            # traced (c/s products) or static floats (folded below)
            T = [[c, -s, 0.0], [s * ca, c * ca, -sa], [s * sa, c * sa, ca]]
            p = [a_, -d_ * sa, d_ * ca]
        else:
            T = [[c, -s * ca, s * sa], [s, c * ca, -c * sa], [0.0, sa, ca]]
            p = [a_ * c, a_ * s, d_]
        Rn = [[None] * 3 for _ in range(3)]
        tn = [None] * 3
        for ii in range(3):
            for jj in range(3):
                acc = None
                for kk in range(3):
                    e = T[kk][jj]
                    if isinstance(e, float):
                        if e == 0.0:
                            continue
                        term = R[ii][kk] * e
                    else:
                        term = R[ii][kk] * e
                    acc = term if acc is None else acc + term
                Rn[ii][jj] = acc
            accp = t[ii]
            for kk in range(3):
                e = p[kk]
                if isinstance(e, float):
                    if e == 0.0:
                        continue
                    accp = accp + R[ii][kk] * e
                else:
                    accp = accp + R[ii][kk] * e
            tn[ii] = accp
        R, t = Rn, tn
        emit(i + 1)
    return jnp.concatenate(parts, axis=-2)


# ----------------------------------------------------------------- numpy twins


def dh_matrix_np(theta: float, d: float, a: float, alpha: float, craig: bool) -> np.ndarray:
    ct, st = np.cos(theta), np.sin(theta)
    ca, sa = np.cos(alpha), np.sin(alpha)
    if craig:
        return np.array(
            [
                [ct, -st, 0.0, a],
                [st * ca, ct * ca, -sa, -d * sa],
                [st * sa, ct * sa, ca, d * ca],
                [0.0, 0.0, 0.0, 1.0],
            ]
        )
    return np.array(
        [
            [ct, -st * ca, st * sa, a * ct],
            [st, ct * ca, -ct * sa, a * st],
            [0.0, sa, ca, d],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )


def fk_frames_np(spec: RobotSpec, base_pose: np.ndarray, thetas: np.ndarray) -> np.ndarray:
    """Numpy twin of :func:`fk_frames` for a single config ``[dof]``."""
    frames = np.zeros((spec.dof + 1, 4, 4))
    frames[0] = base_pose
    angles = np.asarray(thetas) + spec.twist
    for i in range(spec.dof):
        d, a, alpha = spec.dh[i]
        frames[i + 1] = frames[i] @ dh_matrix_np(angles[i], d, a, alpha, spec.craig_dh)
    return frames


def sphere_positions_np(spec: RobotSpec, base_pose: np.ndarray, thetas: np.ndarray) -> np.ndarray:
    """Numpy twin of :func:`sphere_positions` for a single config ``[dof]``."""
    frames = fk_frames_np(spec, base_pose, thetas)
    sel = frames[spec.fk_slice[spec.sphere_frame]]
    return np.einsum("pij,pj->pi", sel[:, :3, :3], spec.sphere_offsets) + sel[:, :3, 3]
