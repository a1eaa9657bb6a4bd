#!/usr/bin/env python
"""Mesh extents / offsets / point-cloud export (asset pipeline auxiliary).

Equivalent of the reference's ``gpflow_vgpmp/utils/gen_extents.py`` (which
needs pyassimp): for each mesh, write ``<stem>.extent.txt`` (bbox extent),
``<stem>.offset.txt`` (bbox center) and optionally ``<stem>.xyz`` (vertex
cloud), using the in-repo OBJ loader.

Usage: python tools/gen_extents.py mesh1.obj [mesh2.obj ...] [--xyz] [--out-dir D]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vgpmp_tpu.sdf.gen import load_obj


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("meshes", nargs="+", type=Path)
    ap.add_argument("--xyz", action="store_true", help="also dump vertex cloud")
    ap.add_argument("--out-dir", type=Path, default=None)
    args = ap.parse_args()
    for mesh in args.meshes:
        verts, tris, piece = load_obj(mesh)
        lo, hi = verts.min(axis=0), verts.max(axis=0)
        out_dir = args.out_dir or mesh.parent
        out_dir.mkdir(parents=True, exist_ok=True)
        stem = out_dir / mesh.stem
        np.savetxt(f"{stem}.extent.txt", (hi - lo)[None], fmt="%.8f")
        np.savetxt(f"{stem}.offset.txt", ((hi + lo) / 2)[None], fmt="%.8f")
        if args.xyz:
            np.savetxt(f"{stem}.xyz", verts, fmt="%.6f")
        print(f"{mesh.name}: extent={np.round(hi - lo, 4).tolist()} "
              f"center={np.round((hi + lo) / 2, 4).tolist()} "
              f"({len(verts)} verts, {len(tris)} tris, {piece.max() + 1} pieces)")


if __name__ == "__main__":
    main()
