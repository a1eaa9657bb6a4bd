"""Offline mesh -> SDF generation (asset pipeline).

Replaces the reference's shell-out to the external SDFGen binary
(``gpflow_vgpmp/utils/gen_sdf.py:14-41``) with an in-repo native C++
voxelizer (``vgpmp_tpu/native/sdfgen.cpp``, loaded via ctypes) plus a pure
numpy fallback for tiny test meshes. Grid sizing mirrors the reference's
convention: ``delta = max_extent / dim`` with padding cells on every side
(``gen_sdf.py:50-60``).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Tuple

import numpy as np

__all__ = ["load_obj", "mesh_to_sdf", "native_lib"]

NATIVE_DIR = Path(__file__).parent.parent / "native"


def load_obj(path) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse a Wavefront .obj triangle soup.

    Returns ``(verts [V,3], tris [T,3] int32, piece [T] int32)`` where
    ``piece`` is the object-group id per triangle (``o ...`` lines). Faces
    with >3 vertices are fan-triangulated; negative indices are resolved
    relative to the current vertex count.
    """
    verts: List[List[float]] = []
    tris: List[List[int]] = []
    piece: List[int] = []
    current_piece = 0
    seen_object = False
    for line in Path(path).read_text().splitlines():
        if line.startswith("v "):
            parts = line.split()
            verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
        elif line.startswith(("o ", "g ")):
            if seen_object:
                current_piece += 1
            seen_object = True
        elif line.startswith("f "):
            idx = []
            for tok in line.split()[1:]:
                i = int(tok.split("/")[0])
                idx.append(i - 1 if i > 0 else len(verts) + i)
            for k in range(1, len(idx) - 1):
                tris.append([idx[0], idx[k], idx[k + 1]])
                piece.append(current_piece)
    return (
        np.asarray(verts, dtype=np.float64),
        np.asarray(tris, dtype=np.int32),
        np.asarray(piece, dtype=np.int32),
    )


def native_lib() -> ctypes.CDLL:
    """Load (building if needed) the native voxelizer shared library."""
    so = NATIVE_DIR / "libsdfgen.so"
    if not so.exists():
        subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True, capture_output=True)
    lib = ctypes.CDLL(str(so))
    lib.vgpmp_gen_sdf.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_double,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.vgpmp_gen_sdf.restype = None
    return lib


def _sdf_numpy(verts, tris, piece, origin, delta, dims) -> np.ndarray:
    """Slow numpy twin of the native voxelizer (tests / fallback)."""
    from vgpmp_tpu.sdf._numpy_sdf import sdf_grid_numpy

    return sdf_grid_numpy(verts, tris, piece, origin, delta, dims)


def mesh_to_sdf(
    verts: np.ndarray,
    tris: np.ndarray,
    piece: np.ndarray,
    delta: float | None = None,
    dim: int = 100,
    padding: int = 30,
    use_native: bool = True,
    n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Voxelize a triangle soup into a signed-distance grid.

    Returns ``(data [nx,ny,nz] float32, origin [3], delta)``. Sizing follows
    the reference pipeline (``gen_sdf.py:50-60``): ``delta = max_extent/dim``
    unless given, with ``padding`` cells added on every side.
    """
    lo = verts.min(axis=0)
    hi = verts.max(axis=0)
    extent = hi - lo
    if delta is None:
        delta = float(extent.max()) / dim
    dims = np.ceil(extent / delta).astype(int) + 1 + 2 * padding
    origin = lo - padding * delta

    if use_native:
        lib = native_lib()
        out = np.empty(int(np.prod(dims)), dtype=np.float32)
        verts_c = np.ascontiguousarray(verts, dtype=np.float64)
        tris_c = np.ascontiguousarray(tris, dtype=np.int32)
        piece_c = np.ascontiguousarray(piece, dtype=np.int32)
        origin_c = np.ascontiguousarray(origin, dtype=np.float64)
        if n_threads <= 0:
            import os

            n_threads = os.cpu_count() or 1
        lib.vgpmp_gen_sdf(
            verts_c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(verts_c),
            tris_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(tris_c),
            piece_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), int(piece_c.max()) + 1,
            origin_c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), float(delta),
            int(dims[0]), int(dims[1]), int(dims[2]),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), int(n_threads),
        )
        data = out.reshape(dims)
    else:
        data = _sdf_numpy(verts, tris, piece, origin, delta, dims)
    return data, origin, float(delta)
