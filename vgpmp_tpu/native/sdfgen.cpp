// Native mesh -> signed-distance-field voxelizer.
//
// TPU-native replacement for the external SDFGen binary the reference shells
// out to in its offline asset pipeline (luke-ck/vgpmp
// gpflow_vgpmp/utils/gen_sdf.py:14-41). Produces a dense voxel grid of signed
// distances from a triangle soup:
//
//   - magnitude: exact point-to-triangle distance, brute force over triangles
//     with bounding-sphere pruning (scene meshes are small: 38-422 tris);
//   - sign: per-piece ray-parity along +x. Meshes here are unions of closed
//     convex pieces (ACD decompositions) that overlap, so parity is evaluated
//     per piece and a cell is inside the union if it is inside ANY piece —
//     plain global parity would misclassify overlap regions.
//
// Exposed as a C ABI for ctypes; threaded over x-slabs.

#include <cmath>
#include <cstdint>
#include <algorithm>
#include <vector>
#include <thread>

namespace {

struct V3 {
  double x, y, z;
};

inline V3 sub(const V3& a, const V3& b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline double dot(const V3& a, const V3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline V3 cross(const V3& a, const V3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}

// Squared distance from point p to triangle (a,b,c); Ericson, Real-Time
// Collision Detection, section 5.1.5 (closest point on triangle).
double point_tri_dist2(const V3& p, const V3& a, const V3& b, const V3& c) {
  V3 ab = sub(b, a), ac = sub(c, a), ap = sub(p, a);
  double d1 = dot(ab, ap), d2 = dot(ac, ap);
  if (d1 <= 0 && d2 <= 0) { V3 d = sub(p, a); return dot(d, d); }
  V3 bp = sub(p, b);
  double d3 = dot(ab, bp), d4 = dot(ac, bp);
  if (d3 >= 0 && d4 <= d3) { V3 d = sub(p, b); return dot(d, d); }
  double vc = d1 * d4 - d3 * d2;
  if (vc <= 0 && d1 >= 0 && d3 <= 0) {
    double v = d1 / (d1 - d3);
    V3 q = {a.x + v * ab.x, a.y + v * ab.y, a.z + v * ab.z};
    V3 d = sub(p, q); return dot(d, d);
  }
  V3 cp = sub(p, c);
  double d5 = dot(ab, cp), d6 = dot(ac, cp);
  if (d6 >= 0 && d5 <= d6) { V3 d = sub(p, c); return dot(d, d); }
  double vb = d5 * d2 - d1 * d6;
  if (vb <= 0 && d2 >= 0 && d6 <= 0) {
    double w = d2 / (d2 - d6);
    V3 q = {a.x + w * ac.x, a.y + w * ac.y, a.z + w * ac.z};
    V3 d = sub(p, q); return dot(d, d);
  }
  double va = d3 * d6 - d5 * d4;
  if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {
    double w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    V3 q = {b.x + w * (c.x - b.x), b.y + w * (c.y - b.y), b.z + w * (c.z - b.z)};
    V3 d = sub(p, q); return dot(d, d);
  }
  double denom = 1.0 / (va + vb + vc);
  double v = vb * denom, w = vc * denom;
  V3 q = {a.x + ab.x * v + ac.x * w, a.y + ab.y * v + ac.y * w, a.z + ab.z * v + ac.z * w};
  V3 d = sub(p, q); return dot(d, d);
}

// x-coordinate of the intersection of the +x ray through (y, z) with the
// triangle, or NaN if no hit. Ray direction (1,0,0): solve in the yz plane.
double ray_x_hit(double y, double z, const V3& a, const V3& b, const V3& c) {
  double d1y = b.y - a.y, d1z = b.z - a.z;
  double d2y = c.y - a.y, d2z = c.z - a.z;
  double det = d1y * d2z - d1z * d2y;
  if (std::fabs(det) < 1e-14) return std::nan("");
  double py = y - a.y, pz = z - a.z;
  // solve u*(d1y,d1z) + v*(d2y,d2z) = (py,pz)
  double u = (py * d2z - pz * d2y) / det;
  double v = (d1y * pz - d1z * py) / det;
  if (u < 0 || v < 0 || u + v > 1) return std::nan("");
  return a.x + u * (b.x - a.x) + v * (c.x - a.x);
}

}  // namespace

extern "C" {

// out: [nx*ny*nz] float32, C order (x-major: index = (ix*ny + iy)*nz + iz)
void vgpmp_gen_sdf(const double* verts, int n_verts, const int* tris, int n_tris,
                   const int* piece_of_tri, int n_pieces, const double* origin,
                   double delta, int nx, int ny, int nz, float* out, int n_threads) {
  (void)n_verts;
  std::vector<V3> A(n_tris), B(n_tris), C(n_tris), centers(n_tris);
  std::vector<double> radius(n_tris);
  for (int t = 0; t < n_tris; ++t) {
    A[t] = {verts[3 * tris[3 * t] + 0], verts[3 * tris[3 * t] + 1], verts[3 * tris[3 * t] + 2]};
    B[t] = {verts[3 * tris[3 * t + 1]], verts[3 * tris[3 * t + 1] + 1], verts[3 * tris[3 * t + 1] + 2]};
    C[t] = {verts[3 * tris[3 * t + 2]], verts[3 * tris[3 * t + 2] + 1], verts[3 * tris[3 * t + 2] + 2]};
    centers[t] = {(A[t].x + B[t].x + C[t].x) / 3, (A[t].y + B[t].y + C[t].y) / 3,
                  (A[t].z + B[t].z + C[t].z) / 3};
    V3 da = sub(A[t], centers[t]), db = sub(B[t], centers[t]), dc = sub(C[t], centers[t]);
    radius[t] = std::sqrt(std::max(dot(da, da), std::max(dot(db, db), dot(dc, dc))));
  }

  // ---- sign via per-piece parity, computed once per (y, z) column ----------
  // inside[(iy*nz+iz)] bitmask not enough for >64 pieces; use per-cell bool
  // computed from sorted hit lists per piece.
  std::vector<std::vector<std::vector<double>>> hits(
      (size_t)ny * nz);  // per column, per piece, sorted x hits
  const double eps = delta * 1e-4;  // jitter to dodge edge-exact hits
  for (int iy = 0; iy < ny; ++iy) {
    for (int iz = 0; iz < nz; ++iz) {
      double y = origin[1] + delta * iy + eps;
      double z = origin[2] + delta * iz + eps * 0.7;
      auto& col = hits[(size_t)iy * nz + iz];
      col.assign(n_pieces, {});
      for (int t = 0; t < n_tris; ++t) {
        double hx = ray_x_hit(y, z, A[t], B[t], C[t]);
        if (!std::isnan(hx)) col[piece_of_tri[t]].push_back(hx);
      }
      for (auto& v : col) std::sort(v.begin(), v.end());
    }
  }

  auto worker = [&](int ix0, int ix1) {
    for (int ix = ix0; ix < ix1; ++ix) {
      double px = origin[0] + delta * ix;
      for (int iy = 0; iy < ny; ++iy) {
        double py = origin[1] + delta * iy;
        for (int iz = 0; iz < nz; ++iz) {
          double pz = origin[2] + delta * iz;
          V3 p = {px, py, pz};
          double best = 1e30;
          for (int t = 0; t < n_tris; ++t) {
            double dx = px - centers[t].x, dy = py - centers[t].y, dz = pz - centers[t].z;
            double cd = std::sqrt(dx * dx + dy * dy + dz * dz) - radius[t];
            if (cd * cd >= best && cd > 0) continue;
            best = std::min(best, point_tri_dist2(p, A[t], B[t], C[t]));
          }
          // inside the union if inside any piece: odd # of hits beyond px
          bool inside = false;
          const auto& col = hits[(size_t)iy * nz + iz];
          for (int pc = 0; pc < n_pieces && !inside; ++pc) {
            const auto& v = col[pc];
            size_t beyond = v.end() - std::upper_bound(v.begin(), v.end(), px);
            inside = (beyond % 2) == 1;
          }
          double d = std::sqrt(best);
          out[((size_t)ix * ny + iy) * nz + iz] = (float)(inside ? -d : d);
        }
      }
    }
  };

  n_threads = std::max(1, n_threads);
  std::vector<std::thread> pool;
  int chunk = (nx + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int lo = t * chunk, hi = std::min(nx, lo + chunk);
    if (lo < hi) pool.emplace_back(worker, lo, hi);
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"
