#!/usr/bin/env python
"""Offline robot-spec extraction: URDF + YAML -> RobotSpec JSON artifacts.

This is the TPU-native replacement for the reference's runtime PyBullet
introspection (luke-ck/vgpmp): sphere discovery via ``getVisualShapeData``
(``gpflow_vgpmp/utils/robot.py:482-550``) and the per-robot sphere-offset
corrections hard-coded in ``gpflow_vgpmp/utils/sampler.py:68-101`` are run
*once here*, validated against the robot's own config, and baked into a JSON
artifact consumed by the JAX runtime.

Usage:
    python tools/extract_robot_specs.py [--data-dir /root/reference/data]

The data dir must follow the reference layout ``robots/<name>/config.yaml`` +
URDF with spheres encoded as extra <visual> shapes.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vgpmp_tpu.kinematics.urdf import UrdfModel
from vgpmp_tpu.robots import RobotSpec

ROBOTS = ["franka", "wam", "kuka", "ur10"]


def correct_offset(robot: str, index: int, o: np.ndarray) -> np.ndarray:
    """Per-robot sphere-offset correction, transcribed as data.

    The reference aligns URDF link-frame sphere offsets with its DH frames by
    per-index axis swizzles/shifts (``sampler.py:get_mat``, lines 68-101).
    We reproduce those mappings verbatim as data so FK sphere placements
    match the reference's.
    """
    x, y, z = float(o[0]), float(o[1]), float(o[2])
    if robot == "wam":
        if index < 8:
            return np.array([x - 0.045, -y, z])
        if 8 < index <= 12:
            return np.array([x + 0.045, -y - 0.05, z])
        if index > 14:
            return np.array([x, y, z])
        if index == 8:
            return np.array([0.0, 0.0, 0.0])
        return np.array([x, -y, z])
    if robot == "ur10":
        if 0 < index < 7:
            return np.array([z, x, y + 0.163941 + 0.05])
        return np.array([z, x, y])
    if robot == "kuka":
        if 1 < index < 5:
            return np.array([x, -z + 0.18, y])
        if 5 <= index < 8:
            return np.array([x, z, y])
        if 8 <= index < 11:
            return np.array([x, z - 0.18, -y])
        if 11 <= index < 15:
            return np.array([x, -z, y])
        if 15 <= index < 17:
            return np.array([x, z + 0.1, y - 0.06])
        if 17 <= index < 20:
            return np.array([x, z - 0.07, y])
        return np.array([x, y, z])
    return np.array([x, y, z])  # franka: URDF offsets used as-is


def extract(data_dir: Path, name: str) -> RobotSpec:
    robot_dir = data_dir / "robots" / name
    cfg = yaml.safe_load((robot_dir / "config.yaml").read_text())
    model = UrdfModel(str(robot_dir / cfg["path"]))

    spheres = model.spheres_in_link_order()
    assert len(spheres) == cfg["num_spheres"], (
        f"{name}: URDF has {len(spheres)} spheres, config says {cfg['num_spheres']}"
    )
    # The config radius list is authoritative for the likelihood (the reference
    # feeds cfg['radius'] to it, not the URDF radii; ``likelihood.py:44``).
    # URDF radii only cross-check the discovery *ordering* — the reference data
    # itself has small mismatches (e.g. WAM 0.065 vs 0.0675), so warn only.
    radii_cfg = np.asarray(cfg["radius"], dtype=np.float64)
    radii_urdf = np.asarray([s.radius for s in spheres])
    if not np.allclose(radii_cfg, radii_urdf, atol=1e-9):
        bad = np.nonzero(~np.isclose(radii_cfg, radii_urdf))[0]
        print(
            f"  [warn] {name}: URDF sphere radii differ from config at indices "
            f"{bad.tolist()} (config wins, matching reference behavior)"
        )

    # group spheres by carrying link (discovery order) -> frame index per sphere
    frame_of_link: dict = {}
    sphere_frame = []
    for s in spheres:
        if s.link not in frame_of_link:
            frame_of_link[s.link] = len(frame_of_link)
        sphere_frame.append(frame_of_link[s.link])
    n_frames = len(frame_of_link)
    assert n_frames == cfg["num_frames_for_spheres"], (
        f"{name}: {n_frames} sphere-carrying links, config expects "
        f"{cfg['num_frames_for_spheres']}"
    )
    assert n_frames == len(cfg["fk_slice"])

    offsets = np.stack(
        [correct_offset(name, i, s.offset) for i, s in enumerate(spheres)]
    )

    dof = int(cfg["dof"])
    spec = RobotSpec(
        name=name,
        dof=dof,
        craig_dh=bool(cfg["craig_dh_convention"]),
        dh=np.asarray(cfg["dh_parameters"], dtype=np.float64).reshape(dof, 3),
        twist=np.asarray(cfg["twist"], dtype=np.float64).reshape(dof),
        fk_slice=np.asarray(cfg["fk_slice"], dtype=np.int32),
        sphere_frame=np.asarray(sphere_frame, dtype=np.int32),
        sphere_offsets=offsets,
        sphere_radii=radii_cfg,
        joint_limits=np.asarray(cfg["joint_limits"], dtype=np.float64).reshape(dof, 2),
        velocity_limits=np.asarray(cfg["velocity_limits"], dtype=np.float64).reshape(dof, 2),
        default_pose=np.asarray(cfg["default_pose"][:dof], dtype=np.float64),
        meta={
            "active_joints": cfg["active_joints"],
            "active_links": cfg["active_links"],
            "joint_names": cfg["joint_names"],
            "link_name_base": cfg["link_name_base"],
            "link_name_wrist": cfg["link_name_wrist"],
            "urdf": cfg["path"],
            "sphere_links": list(frame_of_link),
            "provenance": (
                "extracted from reference data/robots/%s (config.yaml + %s); "
                "offset corrections per sampler.py:68-101" % (name, cfg["path"])
            ),
        },
    )
    return spec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/root/reference/data", type=Path)
    ap.add_argument("--robots", nargs="*", default=ROBOTS)
    args = ap.parse_args()
    for name in args.robots:
        spec = extract(args.data_dir, name)
        path = spec.save()
        print(
            f"{name}: dof={spec.dof} craig={spec.craig_dh} spheres={spec.num_spheres} "
            f"frames={spec.num_frames} per-frame={spec.spheres_per_frame().tolist()} -> {path}"
        )


if __name__ == "__main__":
    main()
