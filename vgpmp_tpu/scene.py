"""Composable scene model: base environment + movable objects, all as SDFs.

TPU-native equivalent of the reference's Scene/BaseObject layer
(``utils/scene.py:9-138``, ``utils/bullet_object.py:13-117``): where the
reference manages a deque of PyBullet bodies, here a scene is a *composed
signed-distance field* — one voxelized environment grid plus any number of
extra objects, each either a voxel grid (from the mesh pipeline) or an
analytic primitive (sphere / box / capsule — exact, differentiable, free).
The query is a single fused min-reduction, so adding objects costs a few
elementwise ops, not a second gather pass.

All parts are static pytree data; object *poses* are arrays, so a scene with
moved objects is just a new pytree — no recompilation (shapes unchanged).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from vgpmp_tpu.sdf.grid import (
    PackedSdfGrid,
    SdfGrid,
    nearest_distance,
    packed_nearest_distance,
    trilinear_distance,
)

__all__ = ["Primitives", "Scene", "SceneBuilder", "OBJECT_LIBRARY"]

_BIG = 1e9


@struct.dataclass
class Primitives:
    """Batched analytic SDF primitives (world frame).

    Empty batches (size 0) are allowed and cost nothing — XLA folds the
    min-reduction over a zero-size axis away.
    """

    sphere_centers: jnp.ndarray  # [Ks, 3]
    sphere_radii: jnp.ndarray    # [Ks]
    box_centers: jnp.ndarray     # [Kb, 3]
    box_rotations: jnp.ndarray   # [Kb, 3, 3] world->box
    box_half_extents: jnp.ndarray  # [Kb, 3]
    capsule_a: jnp.ndarray       # [Kc, 3] segment start
    capsule_b: jnp.ndarray       # [Kc, 3] segment end
    capsule_radii: jnp.ndarray   # [Kc]

    @classmethod
    def empty(cls, dtype=jnp.float32) -> "Primitives":
        z = lambda *s: jnp.zeros(s, dtype=dtype)
        return cls(
            sphere_centers=z(0, 3), sphere_radii=z(0),
            box_centers=z(0, 3), box_rotations=z(0, 3, 3), box_half_extents=z(0, 3),
            capsule_a=z(0, 3), capsule_b=z(0, 3), capsule_radii=z(0),
        )

    def distance(self, points: jnp.ndarray) -> jnp.ndarray:
        """``[..., 3] -> [...]`` min signed distance over all primitives."""
        out = jnp.full(points.shape[:-1], _BIG, dtype=points.dtype)
        if self.sphere_radii.shape[0]:
            d = jnp.linalg.norm(
                points[..., None, :] - self.sphere_centers, axis=-1
            ) - self.sphere_radii
            out = jnp.minimum(out, jnp.min(d, axis=-1))
        if self.box_half_extents.shape[0]:
            local = jnp.einsum(
                "kij,...kj->...ki", self.box_rotations,
                points[..., None, :] - self.box_centers,
            )
            q = jnp.abs(local) - self.box_half_extents
            outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
            inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
            out = jnp.minimum(out, jnp.min(outside + inside, axis=-1))
        if self.capsule_radii.shape[0]:
            ab = self.capsule_b - self.capsule_a  # [Kc, 3]
            ap = points[..., None, :] - self.capsule_a
            t = jnp.clip(
                jnp.sum(ap * ab, axis=-1) / jnp.sum(ab * ab, axis=-1), 0.0, 1.0
            )
            closest = self.capsule_a + t[..., None] * ab
            d = jnp.linalg.norm(points[..., None, :] - closest, axis=-1) - self.capsule_radii
            out = jnp.minimum(out, jnp.min(d, axis=-1))
        return out


@struct.dataclass
class Scene:
    """Environment grid + optional extra object grids + primitives."""

    base: SdfGrid
    base_offset: jnp.ndarray  # [3] world position of the env mesh frame
    extra_grids: Tuple[SdfGrid, ...] = ()
    extra_offsets: Optional[jnp.ndarray] = None  # [G, 3]
    primitives: Optional[Primitives] = None
    # 'packed' = nearest-cell semantics via the 2-gather bf16 fast path
    # (PackedSdfGrid; set by :meth:`packed`, which builds the tables);
    # 'nearest' = exact f32 reference parity (7 gathers);
    # 'trilinear' = C0 interpolation (8 gathers, autodiff gradient).
    mode: str = struct.field(pytree_node=False, default="nearest")
    base_packed: Optional[PackedSdfGrid] = None
    extra_packed: Tuple[PackedSdfGrid, ...] = ()

    def packed(self) -> "Scene":
        """Return a copy with the bf16 fast-path tables built (host-side
        packing — call once at session build, never under jit)."""
        return self.replace(
            mode="packed",
            base_packed=PackedSdfGrid.pack(self.base),
            extra_packed=tuple(PackedSdfGrid.pack(g) for g in self.extra_grids),
        )

    def distance(self, points: jnp.ndarray, mode_override: str | None = None) -> jnp.ndarray:
        """World-frame ``[..., 3] -> [...]`` composed signed distance.

        ``mode_override``: evaluate with a different lookup than the scene's
        configured training mode (e.g. ``'trilinear'`` for the
        executor/validator metric path — sub-voxel accuracy — while training
        keeps the packed fast path). The unpacked grids are always retained,
        so any mode is available.
        """
        if mode_override is not None and mode_override != "packed":
            lookup = (
                trilinear_distance if mode_override == "trilinear" else nearest_distance
            )
            d = lookup(self.base, points - self.base_offset)
            for g, grid in enumerate(self.extra_grids):
                d = jnp.minimum(d, lookup(grid, points - self.extra_offsets[g]))
            if self.primitives is not None:
                d = jnp.minimum(d, self.primitives.distance(points))
            return d
        if self.mode == "packed":
            d = packed_nearest_distance(self.base_packed, points - self.base_offset)
            for g, grid in enumerate(self.extra_packed):
                d = jnp.minimum(
                    d, packed_nearest_distance(grid, points - self.extra_offsets[g])
                )
        else:
            lookup = trilinear_distance if self.mode == "trilinear" else nearest_distance
            d = lookup(self.base, points - self.base_offset)
            for g, grid in enumerate(self.extra_grids):
                d = jnp.minimum(d, lookup(grid, points - self.extra_offsets[g]))
        if self.primitives is not None:
            d = jnp.minimum(d, self.primitives.distance(points))
        return d


# ---------------------------------------------------------------------------
# Named-object registry (the reference Scene/BaseObject surface)
# ---------------------------------------------------------------------------

# Reference ``object_mapping`` (``utils/bullet_object.py:13-19``) maps names to
# PyBullet-data URDFs; here each supported name maps to an analytic SDF spec
# (kind, params in the object's local frame) with the same nominal dimensions:
# plane = the ground (z >= 0 half-space is the *free* side, so it contributes
# a box slab), cube = 1 m cube, table = pybullet table tabletop, duck ~ 0.1 m
# ball, pringles = 0.23 m x 0.04 m capsule can (reference
# ``data/objects/pringles.urdf``; its textured.obj mesh is not shipped in the
# reference repo, so the canonical-dimensions capsule is the SDF stand-in).
OBJECT_LIBRARY: Dict[str, Dict[str, Any]] = {
    "cube": {"kind": "box", "half_extents": [0.5, 0.5, 0.5]},
    "table": {"kind": "box", "half_extents": [0.75, 0.5, 0.03], "local_z": 0.625},
    "duck": {"kind": "sphere", "radius": 0.05, "local_z": 0.05},
    "pringles": {"kind": "capsule", "radius": 0.04, "height": 0.23},
}


@dataclass
class _SceneObject:
    name: str
    kind: str            # 'sphere' | 'box' | 'capsule' | 'grid'
    position: np.ndarray  # [3] world
    spec: Dict[str, Any]
    grid: Optional[SdfGrid] = None


@dataclass
class SceneBuilder:
    """Host-side named-object scene registry -> compiled :class:`Scene`.

    Mirrors the reference Scene API (``utils/scene.py:61-138``): objects are
    added/removed/looked up **by name or index**; :meth:`build` composes the
    current object set into the pytree :class:`Scene` the planner consumes.
    Because object *poses* are array data, moving an object and rebuilding
    reuses the compiled planner (same pytree structure); adding/removing an
    object changes primitive batch sizes and recompiles once.
    """

    base: SdfGrid
    base_offset: Any = (0.0, 0.0, 0.0)
    mode: str = "nearest"
    dtype: Any = jnp.float32
    objects: List[_SceneObject] = field(default_factory=list)

    # -- reference Scene.add_object (utils/scene.py:61-83) ------------------
    def add_object(
        self,
        name: str,
        position,
        grid: Optional[SdfGrid] = None,
        spec: Optional[Dict[str, Any]] = None,
    ) -> None:
        """Add a named object at a world position.

        ``name`` may be a library name (``OBJECT_LIBRARY``), or pass an
        explicit analytic ``spec`` / voxel ``grid`` (mesh pipeline output).
        """
        if grid is not None:
            obj = _SceneObject(name, "grid", np.asarray(position, float), {}, grid)
        else:
            s = spec if spec is not None else OBJECT_LIBRARY.get(name)
            if s is None:
                raise KeyError(
                    f"Object {name!r} not found in the object library of supported "
                    f"objects and no explicit spec/grid given; supported: "
                    f"{sorted(OBJECT_LIBRARY)}"
                )  # message parity: bullet_object.py:59
            obj = _SceneObject(name, s["kind"], np.asarray(position, float), dict(s))
        self.objects.append(obj)

    # -- lookups (utils/scene.py:85-112) -------------------------------------
    def get_object_index_by_name(self, name: str) -> int:
        for i, o in enumerate(self.objects):
            if o.name == name:
                return i
        raise KeyError(name)

    def get_object_by_name(self, name: str) -> _SceneObject:
        return self.objects[self.get_object_index_by_name(name)]

    def get_object_by_index(self, index: int) -> _SceneObject:
        return self.objects[index]

    @property
    def names(self) -> List[str]:
        return [o.name for o in self.objects]

    # -- removal (utils/scene.py:114-138) ------------------------------------
    def remove_object(self, name: str) -> None:
        del self.objects[self.get_object_index_by_name(name)]

    def remove_object_by_index(self, index: int) -> None:
        del self.objects[index]

    def move_object(self, name: str, position) -> None:
        self.get_object_by_name(name).position = np.asarray(position, float)

    # -- compose -------------------------------------------------------------
    def build(self) -> Scene:
        dt = self.dtype
        sph_c, sph_r = [], []
        box_c, box_R, box_h = [], [], []
        cap_a, cap_b, cap_r = [], [], []
        grids, offsets = [], []
        for o in self.objects:
            p = o.position.copy()
            p[2] += float(o.spec.get("local_z", 0.0))
            if o.kind == "sphere":
                sph_c.append(p)
                sph_r.append(o.spec["radius"])
            elif o.kind == "box":
                box_c.append(p)
                box_R.append(np.eye(3))
                box_h.append(o.spec["half_extents"])
            elif o.kind == "capsule":
                h = o.spec["height"] - 2 * o.spec["radius"]
                cap_a.append(p + [0, 0, o.spec["radius"]])
                cap_b.append(p + [0, 0, o.spec["radius"] + max(h, 0.0)])
                cap_r.append(o.spec["radius"])
            elif o.kind == "grid":
                grids.append(o.grid)
                offsets.append(p)
            else:
                raise ValueError(o.kind)

        prims = None
        if sph_c or box_c or cap_a:
            e = Primitives.empty(dt)
            as_a = lambda x, s: jnp.asarray(np.asarray(x, float).reshape(s), dt)
            prims = Primitives(
                sphere_centers=as_a(sph_c, (-1, 3)) if sph_c else e.sphere_centers,
                sphere_radii=as_a(sph_r, (-1,)) if sph_c else e.sphere_radii,
                box_centers=as_a(box_c, (-1, 3)) if box_c else e.box_centers,
                box_rotations=as_a(box_R, (-1, 3, 3)) if box_c else e.box_rotations,
                box_half_extents=as_a(box_h, (-1, 3)) if box_c else e.box_half_extents,
                capsule_a=as_a(cap_a, (-1, 3)) if cap_a else e.capsule_a,
                capsule_b=as_a(cap_b, (-1, 3)) if cap_a else e.capsule_b,
                capsule_radii=as_a(cap_r, (-1,)) if cap_a else e.capsule_radii,
            )
        scene = Scene(
            base=self.base,
            base_offset=jnp.asarray(np.asarray(self.base_offset, float), dt),
            extra_grids=tuple(grids),
            extra_offsets=jnp.asarray(np.asarray(offsets, float), dt) if grids else None,
            primitives=prims,
            mode="nearest" if self.mode == "packed" else self.mode,
        )
        if self.mode == "packed":
            scene = scene.packed()
        return scene
