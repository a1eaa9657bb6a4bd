#!/usr/bin/env python
"""Extract benchmark problemsets (start/goal states, base poses, tuned planner
hyperparameters) from the reference's per-robot problemset modules
(luke-ck/vgpmp ``data/problemsets/{franka,kuka,wam,ur10}.py``) into JSON
artifacts under ``vgpmp_tpu/assets/problemsets/``.

The reference stores this *data* as Python code; we execute each module in a
sandboxed namespace (stubbing its ``problemset`` base-class import) and dump
the returned dictionaries. The ``object_positions`` entry is recorded as the
environment placement for each robot x environment — it matches the committed
``parameters.yaml`` scene position for the wam/bookshelves combination the
reference ships configured (``parameters.yaml:5``).
"""

from __future__ import annotations

import json
import sys
import types
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ASSETS = REPO / "vgpmp_tpu" / "assets" / "problemsets"

ROBOT_ENVS = {
    "franka": ["industrial", "bookshelves", "boxes", "testing"],
    "kuka": ["industrial", "bookshelves", "boxes", "testing"],
    "wam": ["industrial", "bookshelves", "lab", "testing"],
    "ur10": ["industrial", "bookshelves", "testing"],
}


def load_problemset_class(path: Path):
    from abc import ABC

    class _Abstract(ABC):
        pass

    stub = types.ModuleType("problemset")
    stub.AbstractProblemset = _Abstract
    sys.modules["problemset"] = stub
    ns: dict = {}
    exec(compile(path.read_text(), str(path), "exec"), ns)
    return ns["Problemset"]


def main() -> None:
    data_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/root/reference/data")
    ASSETS.mkdir(parents=True, exist_ok=True)
    for robot, envs in ROBOT_ENVS.items():
        cls = load_problemset_class(data_dir / "problemsets" / f"{robot}.py")
        # preserve TPU-tuned overlays added after extraction
        prev_path = ASSETS / f"{robot}.json"
        prev = json.loads(prev_path.read_text()) if prev_path.exists() else {}
        out = {}
        for env in envs:
            try:
                n_states, states = cls.states(env)
                params = cls.planner_params(env)
            except (ValueError, SystemExit):
                continue
            try:
                pos, orn = cls.pos_and_orn(env)
            except (ValueError, SystemExit):
                # boxes/lab lack explicit poses for some robots; identity default
                pos, orn = [0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]
            try:
                obj_pos = cls.object_positions(env)
            except (ValueError, SystemExit):
                obj_pos = [[0.0, 0.0, 0.0]]
            out[env] = {
                "n_states": n_states,
                "states": states,
                "robot_position": pos,
                "robot_orientation_xyzw": orn,
                "environment_position": obj_pos[0],
                "planner_params": params,
            }
            if "planner_params_tuned" in prev.get(env, {}):
                out[env]["planner_params_tuned"] = prev[env]["planner_params_tuned"]
        path = ASSETS / f"{robot}.json"
        path.write_text(json.dumps(out, indent=1))
        print(f"{robot}: {sorted(out)} -> {path}")


if __name__ == "__main__":
    main()
