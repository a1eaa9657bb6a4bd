"""Robot specification artifacts.

A :class:`RobotSpec` is the *complete* static description a planner instance
needs about an embodiment — the constants the reference implementation
scatters across ``data/robots/<name>/config.yaml``, PyBullet URDF
introspection (``gpflow_vgpmp/utils/robot.py:482-550``) and the hand-tuned
per-robot sphere-offset corrections (``gpflow_vgpmp/utils/sampler.py:68-101``).

Here all of that is extracted *offline once* (``tools/extract_robot_specs.py``)
into a JSON artifact so the runtime never needs a simulator: the TPU compute
path consumes only the numpy arrays on this dataclass.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

__all__ = ["RobotSpec", "ASSET_DIR", "available_robots", "load_robot"]

ASSET_DIR = Path(__file__).parent / "assets"


@dataclass(frozen=True)
class RobotSpec:
    """Static, simulator-free robot description.

    Shapes: ``dof`` = number of active joints, ``F`` = number of FK frames
    that carry spheres (= ``len(fk_slice)``), ``P`` = total sphere count.
    """

    name: str
    dof: int
    craig_dh: bool            # True -> Craig/modified DH convention (franka)
    dh: np.ndarray            # [dof, 3] columns (d, a, alpha)
    twist: np.ndarray         # [dof] additive joint-angle offset
    fk_slice: np.ndarray      # [F] indices into the (dof+1)-frame FK chain
    sphere_frame: np.ndarray  # [P] index into fk_slice frames per sphere
    sphere_offsets: np.ndarray  # [P, 3] corrected offsets in the DH frame
    sphere_radii: np.ndarray  # [P]
    joint_limits: np.ndarray  # [dof, 2] (high, low) — reference pair order
    velocity_limits: np.ndarray  # [dof, 2] (high, low)
    default_pose: np.ndarray  # [dof]
    meta: Dict = field(default_factory=dict)  # names, provenance, notes

    # ------------------------------------------------------------------

    @property
    def num_spheres(self) -> int:
        return int(self.sphere_radii.shape[0])

    @property
    def num_frames(self) -> int:
        return int(self.fk_slice.shape[0])

    @property
    def limits_high(self) -> np.ndarray:
        return self.joint_limits[:, 0]

    @property
    def limits_low(self) -> np.ndarray:
        return self.joint_limits[:, 1]

    def spheres_per_frame(self) -> np.ndarray:
        """[F] sphere counts per FK frame (reference ``num_spheres_per_link``)."""
        return np.bincount(self.sphere_frame, minlength=self.num_frames)

    # ------------------------------------------------------------- io

    def to_json(self) -> str:
        def _enc(v):
            if isinstance(v, np.ndarray):
                return v.tolist()
            return v

        payload = {
            "name": self.name,
            "dof": self.dof,
            "craig_dh": self.craig_dh,
            "dh": _enc(self.dh),
            "twist": _enc(self.twist),
            "fk_slice": _enc(self.fk_slice),
            "sphere_frame": _enc(self.sphere_frame),
            "sphere_offsets": _enc(self.sphere_offsets),
            "sphere_radii": _enc(self.sphere_radii),
            "joint_limits": _enc(self.joint_limits),
            "velocity_limits": _enc(self.velocity_limits),
            "default_pose": _enc(self.default_pose),
            "meta": self.meta,
        }
        return json.dumps(payload, indent=1)

    @classmethod
    def from_json(cls, text: str) -> "RobotSpec":
        d = json.loads(text)
        f64 = lambda k: np.asarray(d[k], dtype=np.float64)
        i32 = lambda k: np.asarray(d[k], dtype=np.int32)
        return cls(
            name=d["name"],
            dof=int(d["dof"]),
            craig_dh=bool(d["craig_dh"]),
            dh=f64("dh"),
            twist=f64("twist"),
            fk_slice=i32("fk_slice"),
            sphere_frame=i32("sphere_frame"),
            sphere_offsets=f64("sphere_offsets"),
            sphere_radii=f64("sphere_radii"),
            joint_limits=f64("joint_limits"),
            velocity_limits=f64("velocity_limits"),
            default_pose=f64("default_pose"),
            meta=d.get("meta", {}),
        )

    def save(self, path: Optional[Path] = None) -> Path:
        path = path or ASSET_DIR / "robots" / f"{self.name}.json"
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(self.to_json())
        return path


def available_robots() -> List[str]:
    return sorted(p.stem for p in (ASSET_DIR / "robots").glob("*.json"))


def load_robot(name: str) -> RobotSpec:
    path = ASSET_DIR / "robots" / f"{name}.json"
    if not path.exists():
        raise FileNotFoundError(
            f"no robot spec '{name}' — available: {available_robots()}; "
            "generate with tools/extract_robot_specs.py"
        )
    return RobotSpec.from_json(path.read_text())
