#!/usr/bin/env python
"""Generate scene SDF voxel-grid artifacts from the reference scene meshes.

The reference requires pre-generated ``.sdf`` text grids that are NOT shipped
in its repo (its loader asserts their existence,
``gpflow_vgpmp/utils/parameter_loader.py:153-159``; they are produced offline
by shelling out to an external SDFGen build, ``gpflow_vgpmp/utils/gen_sdf.py``).
Here we regenerate them with the in-repo native voxelizer and store compact
``.npz`` artifacts.

Sizing follows the reference convention (``gen_sdf.py:50-60``):
``delta = max_extent / dim`` with padding cells each side; we default to a
finer dim=150 (sphere radii are 1.5-15 cm, so ~2-3 cm voxels).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vgpmp_tpu.sdf.gen import load_obj, mesh_to_sdf
from vgpmp_tpu.sdf.grid import SdfGrid

SCENES = {
    "industrial": "industrial/industrial-acd.obj",
    "bookshelves": "bookshelves/bookshelves_center.obj",
    "lab": "lab/lab.obj",
    "boxes": "boxes/boxes-acd.obj",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/root/reference/data", type=Path)
    ap.add_argument("--out-dir", default=None, type=Path)
    ap.add_argument("--dim", type=int, default=150)
    ap.add_argument("--padding", type=int, default=25)
    ap.add_argument("--scenes", nargs="*", default=list(SCENES))
    args = ap.parse_args()
    out_dir = args.out_dir or Path(__file__).resolve().parent.parent / "vgpmp_tpu" / "assets" / "scenes"

    for name in args.scenes:
        mesh = args.data_dir / "scenes" / SCENES[name]
        verts, tris, piece = load_obj(mesh)
        t0 = time.time()
        data, origin, delta = mesh_to_sdf(
            verts, tris, piece, dim=args.dim, padding=args.padding
        )
        dt = time.time() - t0
        path = out_dir / f"{name}.npz"
        SdfGrid.save_npz(
            path,
            data,
            origin,
            delta,
            meta={
                "scene": name,
                "mesh": str(mesh),
                "tris": int(len(tris)),
                "pieces": int(piece.max()) + 1,
                "dims": [int(d) for d in data.shape],
                "delta": delta,
                "origin": [float(v) for v in origin],
                "min_sdf": float(data.min()),
                "max_sdf": float(data.max()),
            },
        )
        print(
            f"{name}: {data.shape} delta={delta:.4f} origin={np.round(origin,3).tolist()} "
            f"range=[{data.min():.3f},{data.max():.3f}] ({dt:.1f}s) -> {path}"
        )


if __name__ == "__main__":
    main()
