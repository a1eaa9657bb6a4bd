"""Pure-numpy SDF voxelizer — slow reference twin of the native C++ one.

Used to cross-validate ``vgpmp_tpu/native/sdfgen.cpp`` on small meshes and as
a fallback where no C++ toolchain exists. Same algorithm: exact point-to-
triangle distances (vectorized over the grid per triangle) and per-piece
ray-parity sign along +x.
"""

from __future__ import annotations

import numpy as np


def _point_tri_dist2(p: np.ndarray, a, b, c) -> np.ndarray:
    """Squared distance from points ``p [N,3]`` to one triangle (a, b, c)."""
    ab, ac = b - a, c - a
    ap = p - a
    d1 = ap @ ab
    d2 = ap @ ac
    bp = p - b
    d3 = bp @ ab
    d4 = bp @ ac
    cp = p - c
    d5 = cp @ ab
    d6 = cp @ ac

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    # region masks (Ericson 5.1.5)
    m_a = (d1 <= 0) & (d2 <= 0)
    m_b = (d3 >= 0) & (d4 <= d3)
    m_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    m_c = (d6 >= 0) & (d5 <= d6)
    m_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    m_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

    with np.errstate(divide="ignore", invalid="ignore"):
        v_ab = np.nan_to_num(d1 / (d1 - d3))
        w_ac = np.nan_to_num(d2 / (d2 - d6))
        w_bc = np.nan_to_num((d4 - d3) / ((d4 - d3) + (d5 - d6)))
        denom = va + vb + vc
        v_in = np.nan_to_num(vb / denom)
        w_in = np.nan_to_num(vc / denom)

    q = a + np.outer(v_in, ab) + np.outer(w_in, ac)  # interior default
    q = np.where(m_bc[:, None], b + np.outer(w_bc, c - b), q)
    q = np.where(m_ac[:, None], a + np.outer(w_ac, ac), q)
    q = np.where(m_ab[:, None], a + np.outer(v_ab, ab), q)
    q = np.where(m_c[:, None], c, q)
    q = np.where(m_b[:, None], b, q)
    q = np.where(m_a[:, None], a, q)
    d = p - q
    return np.einsum("ni,ni->n", d, d)


def sdf_grid_numpy(verts, tris, piece, origin, delta, dims) -> np.ndarray:
    nx, ny, nz = (int(v) for v in dims)
    xs = origin[0] + delta * np.arange(nx)
    ys = origin[1] + delta * np.arange(ny)
    zs = origin[2] + delta * np.arange(nz)
    P = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), axis=-1).reshape(-1, 3)

    best = np.full(P.shape[0], np.inf)
    for t in range(len(tris)):
        a, b, c = verts[tris[t, 0]], verts[tris[t, 1]], verts[tris[t, 2]]
        best = np.minimum(best, _point_tri_dist2(P, a, b, c))
    dist = np.sqrt(best).reshape(nx, ny, nz)

    # sign: per-piece parity of +x ray hits beyond each cell
    eps = delta * 1e-4
    inside = np.zeros((nx, ny, nz), dtype=bool)
    n_pieces = int(piece.max()) + 1 if len(piece) else 1
    for pc in range(n_pieces):
        sel = tris[piece == pc]
        if len(sel) == 0:
            continue
        a = verts[sel[:, 0]]
        b = verts[sel[:, 1]]
        c = verts[sel[:, 2]]
        d1 = b - a
        d2 = c - a
        det = d1[:, 1] * d2[:, 2] - d1[:, 2] * d2[:, 1]
        ok = np.abs(det) > 1e-14
        crossings = np.zeros((nx, ny, nz), dtype=np.int64)
        Y, Z = np.meshgrid(ys + eps, zs + 0.7 * eps, indexing="ij")  # [ny, nz]
        for t in np.nonzero(ok)[0]:
            py = Y - a[t, 1]
            pz = Z - a[t, 2]
            u = (py * d2[t, 2] - pz * d2[t, 1]) / det[t]
            v = (d1[t, 1] * pz - d1[t, 2] * py) / det[t]
            hit = (u >= 0) & (v >= 0) & (u + v <= 1)
            hx = a[t, 0] + u * d1[t, 0] + v * d2[t, 0]
            beyond = hit[None, :, :] & (hx[None, :, :] > xs[:, None, None])
            crossings += beyond
        inside |= (crossings % 2) == 1
    return np.where(inside, -dist, dist).astype(np.float32)
