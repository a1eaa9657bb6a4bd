"""Planning session: wires config -> robot spec -> scene SDF -> planner engine.

The TPU-native counterpart of the reference's orchestration layer
(``utils/simulation_manager.py:25-157`` + ``utils/parameter_loader.py``):
where the reference boots a PyBullet client and introspects the world, this
session loads precomputed artifacts (RobotSpec JSON, scene SDF npz,
problemset JSON) and assembles the pure-JAX planner model. No simulator is in
the loop; physics execution is replaced by the geometric validator (an
optional PyBullet executor lives in ``vgpmp_tpu.sim``).
"""

from __future__ import annotations

import itertools
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from vgpmp_tpu.engine.solver import TrainConfig
from vgpmp_tpu.kinematics.dh import FkModel
from vgpmp_tpu.likelihoods.collision import CollisionModel
from vgpmp_tpu.models.vgpmp import PlannerModel
from vgpmp_tpu.robots import ASSET_DIR, RobotSpec, load_robot
from vgpmp_tpu.scene import Scene
from vgpmp_tpu.sdf.grid import SdfGrid

__all__ = ["PlanningSession", "quat_to_rotmat", "base_pose_matrix"]


def quat_to_rotmat(q_xyzw) -> np.ndarray:
    """Quaternion (x, y, z, w — PyBullet convention) to rotation matrix."""
    x, y, z, w = (float(v) for v in q_xyzw)
    n = np.sqrt(x * x + y * y + z * z + w * w)
    x, y, z, w = x / n, y / n, z / n, w / n
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def base_pose_matrix(position, orientation_xyzw) -> np.ndarray:
    T = np.eye(4)
    T[:3, :3] = quat_to_rotmat(orientation_xyzw)
    T[:3, 3] = position
    return T


@dataclass
class PlanningSession:
    """One robot x environment planning context (benchmark-mode equivalent).

    Asset resolution mirrors the reference's benchmark config path: the
    per-robot problemset supplies states, the robot base pose, the
    environment placement and tuned planner hyperparameters
    (``parameter_loader.py:125-139``).
    """

    robot_name: str
    problemset_name: str
    dtype: Any = jnp.float32
    # 'packed' = nearest-cell semantics on the 2-gather bf16 fast path
    # (default; ~3.5x fewer SDF gathers per step). 'nearest' = exact f32
    # reference parity; 'trilinear' = C0 interpolation.
    sdf_mode: str = "packed"
    # apply the problemset's ``planner_params_tuned`` overlay (schedule /
    # restart settings measured on TPU; same step+sample budget as the raw
    # reference params). False = the exact reference hyperparameters.
    use_tuned: bool = True
    overrides: Dict[str, Any] = field(default_factory=dict)
    # non-benchmark mode (reference ``non_benchmark_attributes``): supply
    # explicit states/pose/params and a scene name instead of a problemset
    explicit: Optional[Dict[str, Any]] = None
    # extra scene content (reference Scene.add_object equivalent): voxel
    # grids with world offsets and/or analytic primitives
    extra_grids: Optional[Tuple] = None
    extra_offsets: Optional[Any] = None
    primitives: Optional[Any] = None

    @classmethod
    def from_config(cls, path, dtype: Any = jnp.float32, sdf_mode: str = "packed"):
        """Build a session from a reference-schema ``parameters.yaml``."""
        from vgpmp_tpu.config import load_parameters_yaml

        cfg = load_parameters_yaml(path)
        if cfg.benchmark:
            sess = cls(cfg.robot_name, cfg.problemset_name, dtype=dtype, sdf_mode=sdf_mode)
        else:
            pos, orn = cfg.robot_pos_and_orn or ([0, 0, 0], [0, 0, 0, 1])
            sess = cls(
                cfg.robot_name,
                cfg.environment_name,
                dtype=dtype,
                sdf_mode=sdf_mode,
                explicit=dict(
                    states=cfg.states,
                    robot_position=pos,
                    robot_orientation_xyzw=orn,
                    environment_position=cfg.scene_position,
                    planner_params=cfg.planner_params,
                ),
            )
        sess.trainable = cfg.trainable_mask()
        return sess

    def __post_init__(self):
        self.trainable = None  # default benchmark mask unless from_config sets it
        self.spec: RobotSpec = load_robot(self.robot_name)
        if self.explicit is not None:
            ps = self.explicit
        else:
            ps_path = ASSET_DIR / "problemsets" / f"{self.robot_name}.json"
            problemsets = json.loads(ps_path.read_text())
            if self.problemset_name not in problemsets:
                raise KeyError(
                    f"robot {self.robot_name!r} has no problemset "
                    f"{self.problemset_name!r}; available: {sorted(problemsets)}"
                )
            ps = problemsets[self.problemset_name]
        self.states = np.asarray(ps["states"], dtype=np.float64)
        self.planner_params: Dict[str, Any] = dict(ps["planner_params"])
        if self.use_tuned:
            self.planner_params.update(ps.get("planner_params_tuned", {}))
        self.planner_params.update(self.overrides)

        self.base_pose = base_pose_matrix(
            ps["robot_position"], ps["robot_orientation_xyzw"]
        )
        self.scene_offset = np.asarray(ps["environment_position"], dtype=np.float64)

        # degenerate problemsets ('testing': all-zero states and params, used
        # by the reference's config tests only — data/problemsets/franka.py:42-51,
        # :119-132) load states/pose/params but carry no scene or model
        if int(self.planner_params.get("num_steps", 0)) == 0:
            self.sdf = self.scene = self.model = self.train_config = None
            return

        sdf_path = ASSET_DIR / "scenes" / f"{self.problemset_name}.npz"
        self.sdf = SdfGrid.load(sdf_path, dtype=self.dtype)

        fk = FkModel.from_spec(self.spec, self.base_pose, dtype=self.dtype)
        self.scene = Scene(
            base=self.sdf,
            base_offset=jnp.asarray(self.scene_offset, dtype=self.dtype),
            extra_grids=tuple(self.extra_grids or ()),
            extra_offsets=(
                jnp.asarray(self.extra_offsets, dtype=self.dtype)
                if self.extra_offsets is not None
                else None
            ),
            primitives=self.primitives,
            mode=self.sdf_mode,
        )
        if self.sdf_mode == "packed":
            self.scene = self.scene.packed()
        collision = CollisionModel(
            fk=fk,
            scene=self.scene,
            epsilon=jnp.asarray(self.planner_params["epsilon"], dtype=self.dtype),
        )
        import jax

        # f32 sessions use an f64 linalg island when x64 is available (the
        # conditioned Gram exceeds f32 conditioning headroom; see PlannerModel)
        solve_dtype = None
        if self.dtype == jnp.float32 and jax.config.jax_enable_x64:
            solve_dtype = jnp.float64
        self.model = PlannerModel(
            collision=collision,
            ny=jnp.asarray([0.0, 1.0], dtype=self.dtype),
            limits_low=jnp.asarray(self.spec.limits_low, dtype=self.dtype),
            limits_high=jnp.asarray(self.spec.limits_high, dtype=self.dtype),
            num_samples=int(self.planner_params["num_samples"]),
            num_bases=int(self.planner_params.get("num_bases", 1024)),
            num_inducing=int(self.planner_params["num_inducing"]),
            # default 1e-9 (vs the reference's 1e-6): endpoint-clamp softness
            # is jitter * ||Kuu^{-1} r||, and long-lengthscale problemsets
            # (ur10 industrial, wam lab: l=6) reach 0.15 rad endpoint error at
            # 1e-6. The f64 linalg island + jitter escalation keep 1e-9 safe.
            jitter=float(self.planner_params.get("jitter", 1e-9)),
            solve_dtype=self.planner_params.get("solve_dtype", solve_dtype),
            # escalation retries exist for f32 Cholesky headroom; under the
            # f64 linalg island (cond 1e7-1e9 vs f64's ~1e15 headroom) they
            # can never fire, and each retry adds a full unrolled Cholesky
            # to the compiled graph (measured: escalations 3 -> 0 cuts the
            # round-program compile 173 s -> 120 s at unchanged numerics)
            jitter_escalations=int(
                self.planner_params.get(
                    "jitter_escalations",
                    0 if (self.planner_params.get("solve_dtype", solve_dtype)
                          == jnp.float64) else 3,
                )
            ),
            variance_lower=float(
                self.planner_params.get(
                    "variance_lower",
                    min(0.1, 0.5 * float(self.planner_params["variance"])),
                )
            ),
            velocity_constrained=bool(
                self.planner_params.get("velocity_constrained", False)
            ),
            kernel=str(self.planner_params.get("kernel", "matern52")),
            antithetic=bool(self.planner_params.get("antithetic", False)),
        )
        self.train_config = TrainConfig(
            num_steps=int(self.planner_params["num_steps"]),
            learning_rate=float(self.planner_params["learning_rate"]),
            time_spacing_X=int(self.planner_params["time_spacing_X"]),
            time_spacing_Xnew=int(self.planner_params["time_spacing_Xnew"]),
            lr_peak=float(self.planner_params.get("lr_peak", 0.0)),
            warmup_steps=int(self.planner_params.get("warmup_steps", 10)),
            sigma_anneal=float(self.planner_params.get("sigma_anneal", 1.0)),
            # per-solve redrawn training time grid (the reference's
            # training_loop(randomize=True), utils/miscellaneous.py:90-95).
            # In a restart ensemble each member draws its own grid, so the
            # union penalizes clearance at K x |X| distinct times — pressure
            # on between-waypoint dips the fixed grid never samples.
            randomize_timesteps=bool(
                self.planner_params.get("randomize_timesteps", False)
            ),
        )

    # ------------------------------------------------------------------

    def queries(self) -> Tuple[np.ndarray, np.ndarray]:
        """All C(n, 2) start/goal pairs (``parameter_loader.py:138``).

        Returns (starts ``[Q, L]``, goals ``[Q, L]``).
        """
        pairs = list(itertools.combinations(range(len(self.states)), 2))
        starts = self.states[[a for a, _ in pairs]]
        goals = self.states[[b for _, b in pairs]]
        return starts, goals

    @property
    def num_queries(self) -> int:
        n = len(self.states)
        return n * (n - 1) // 2
