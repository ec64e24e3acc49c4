// Quadric-error-metric (QEM) edge-collapse mesh decimation.
//
// Serving-side LOD: the hierarchical decode + marching-tetrahedra path
// emits ~230k-vertex meshes at 256^3 (BASELINE.md "serve e2e" row) whose
// density is set by the *grid*, not by the geometry — flat chair panels
// carry thousands of coplanar triangles. Downstream consumers (preview
// renderers, physics colliders, bandwidth-bound clients) want a
// geometry-adaptive budget, which is exactly what Garland–Heckbert
// quadric decimation provides: collapse the edges whose removal costs
// the least summed squared plane distance, so error concentrates where
// the surface is flat.
//
// Design notes (kept deliberately standard):
// - per-vertex quadrics = area-weighted plane quadrics of incident
//   faces; boundary edges add a perpendicular constraint plane weighted
//   by edge length^2 so open rims (grid-clipped surfaces) don't shrink;
// - lazy min-heap with per-vertex version stamps (no decrease-key);
// - collapse validity = link condition (shared neighbours of the edge
//   == apexes of its shared faces; rejects pinches that would create
//   non-manifold fins) + normal-flip / degenerate-face rejection;
// - new vertex position = argmin of the combined quadric when the 3x3
//   solve is well-conditioned, else best of (midpoint, endpoints) —
//   the cost used for ordering is always the position actually chosen.
//
// Single-threaded: decimation is inherently sequential in heap order.
// Measured ~4.7 us/input-face (115k-face sphere, 10x decimation, 545 ms
// on this 1-core host) after the adjacency-compaction fix in
// do_collapse. Concurrent `simp_run` calls on different meshes are safe
// (no globals), which is how serve_meshes' mesh-worker threads overlap
// LOD across shapes.
#pragma once

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <queue>
#include <unordered_map>
#include <vector>

#include "../marching_cubes/mt_core.hpp"

namespace qem {

// Symmetric 4x4 plane quadric, upper triangle:
// [0]aa [1]ab [2]ac [3]ad [4]bb [5]bc [6]bd [7]cc [8]cd [9]dd
struct Quad {
  double m[10] = {0, 0, 0, 0, 0, 0, 0, 0, 0, 0};
  void add_plane(double a, double b, double c, double d, double w) {
    m[0] += w * a * a; m[1] += w * a * b; m[2] += w * a * c;
    m[3] += w * a * d; m[4] += w * b * b; m[5] += w * b * c;
    m[6] += w * b * d; m[7] += w * c * c; m[8] += w * c * d;
    m[9] += w * d * d;
  }
  void add(const Quad& o) {
    for (int i = 0; i < 10; ++i) m[i] += o.m[i];
  }
  double eval(double x, double y, double z) const {
    return m[0] * x * x + 2 * m[1] * x * y + 2 * m[2] * x * z
         + 2 * m[3] * x + m[4] * y * y + 2 * m[5] * y * z
         + 2 * m[6] * y + m[7] * z * z + 2 * m[8] * z + m[9];
  }
  // argmin position: solve [A | -b] from the quadric's gradient = 0.
  bool solve(double out[3]) const {
    const double a11 = m[0], a12 = m[1], a13 = m[2];
    const double a22 = m[4], a23 = m[5], a33 = m[7];
    const double b1 = -m[3], b2 = -m[6], b3 = -m[8];
    const double det = a11 * (a22 * a33 - a23 * a23)
                     - a12 * (a12 * a33 - a23 * a13)
                     + a13 * (a12 * a23 - a22 * a13);
    // relative conditioning guard: compare against the matrix scale so
    // tiny-but-valid area-weighted quadrics still solve
    const double scale = std::fabs(a11) + std::fabs(a22) + std::fabs(a33);
    if (std::fabs(det) < 1e-10 * scale * scale * scale + 1e-300)
      return false;
    out[0] = (b1 * (a22 * a33 - a23 * a23) - a12 * (b2 * a33 - a23 * b3)
              + a13 * (b2 * a23 - a22 * b3)) / det;
    out[1] = (a11 * (b2 * a33 - a23 * b3) - b1 * (a12 * a33 - a23 * a13)
              + a13 * (a12 * b3 - b2 * a13)) / det;
    out[2] = (a11 * (a22 * b3 - b2 * a23) - a12 * (a12 * b3 - b2 * a13)
              + b1 * (a12 * a23 - a22 * a13)) / det;
    return std::isfinite(out[0]) && std::isfinite(out[1])
        && std::isfinite(out[2]);
  }
};

namespace detail {

using V3 = std::array<double, 3>;

inline V3 sub(const V3& a, const V3& b) {
  return {a[0] - b[0], a[1] - b[1], a[2] - b[2]};
}
inline V3 cross(const V3& a, const V3& b) {
  return {a[1] * b[2] - a[2] * b[1], a[2] * b[0] - a[0] * b[2],
          a[0] * b[1] - a[1] * b[0]};
}
inline double dot(const V3& a, const V3& b) {
  return a[0] * b[0] + a[1] * b[1] + a[2] * b[2];
}
inline double norm(const V3& a) { return std::sqrt(dot(a, a)); }

struct HeapEntry {
  double cost;
  int64_t u, v;
  uint32_t su, sv;  // stamp snapshots; stale when either moved on
  V3 pos;
  bool operator>(const HeapEntry& o) const { return cost > o.cost; }
};

}  // namespace detail

class Simplifier {
 public:
  Simplifier(const float* verts, int64_t nv, const int64_t* faces,
             int64_t nf)
      : V_(nv), F_(nf), fdead_(nf, 0), vdead_(nv, 0), Q_(nv),
        stamp_(nv, 0), vf_(nv) {
    using detail::V3;
    for (int64_t i = 0; i < nv; ++i)
      V_[i] = {verts[3 * i], verts[3 * i + 1], verts[3 * i + 2]};
    alive_f_ = 0;
    for (int64_t i = 0; i < nf; ++i) {
      F_[i] = {faces[3 * i], faces[3 * i + 1], faces[3 * i + 2]};
      if (F_[i][0] == F_[i][1] || F_[i][1] == F_[i][2]
          || F_[i][0] == F_[i][2]) {
        fdead_[i] = 1;  // degenerate input face
        continue;
      }
      ++alive_f_;
      for (int k = 0; k < 3; ++k) vf_[F_[i][k]].push_back(i);
      // boundary/edge bookkeeping counts EVERY alive face, including
      // zero-area slivers (index-distinct faces whose crossings landed
      // on lattice points): skipping those here would misclassify the
      // interior edges they share with regular faces as boundary and
      // pin them with constraint planes
      for (int k = 0; k < 3; ++k) {
        const int64_t a = F_[i][k], b = F_[i][(k + 1) % 3];
        ++ecount_[ekey(a, b)];
      }
      const V3 n = detail::cross(detail::sub(V_[F_[i][1]], V_[F_[i][0]]),
                                 detail::sub(V_[F_[i][2]], V_[F_[i][0]]));
      const double len = detail::norm(n);
      if (len < 1e-300) continue;  // no plane quadric from a sliver
      const double area = 0.5 * len;
      const V3 un = {n[0] / len, n[1] / len, n[2] / len};
      const double d = -detail::dot(un, V_[F_[i][0]]);
      for (int k = 0; k < 3; ++k)
        Q_[F_[i][k]].add_plane(un[0], un[1], un[2], d, area);
    }
    add_boundary_constraints();
  }

  // Decimate until <= target_faces alive or the cheapest remaining
  // collapse costs more than max_error (ignored when < 0).
  void run(int64_t target_faces, double max_error) {
    std::priority_queue<detail::HeapEntry,
                        std::vector<detail::HeapEntry>,
                        std::greater<detail::HeapEntry>> heap;
    for (const auto& kv : ecount_) {
      const int64_t a = static_cast<int64_t>(kv.first >> 32);
      const int64_t b = static_cast<int64_t>(kv.first & 0xffffffffu);
      push_edge(heap, a, b);
    }
    std::vector<int64_t> nbrs;
    while (alive_f_ > target_faces && !heap.empty()) {
      detail::HeapEntry e = heap.top();
      heap.pop();
      if (vdead_[e.u] || vdead_[e.v] || stamp_[e.u] != e.su
          || stamp_[e.v] != e.sv)
        continue;  // stale
      if (max_error >= 0 && e.cost > max_error) break;
      if (!collapse_ok(e.u, e.v, e.pos)) continue;
      do_collapse(e.u, e.v, e.pos);
      // re-seed the moved vertex's edges
      neighbours(e.u, nbrs);
      for (int64_t w : nbrs) push_edge(heap, e.u, w);
    }
  }

  mt::MeshOut compact() const {
    mt::MeshOut out;
    std::vector<int64_t> remap(V_.size(), -1);
    std::vector<char> used(V_.size(), 0);
    for (size_t i = 0; i < F_.size(); ++i)
      if (!fdead_[i])
        for (int k = 0; k < 3; ++k) used[F_[i][k]] = 1;
    int64_t n = 0;
    for (size_t i = 0; i < V_.size(); ++i)
      if (used[i]) {
        remap[i] = n++;
        out.verts.push_back(static_cast<float>(V_[i][0]));
        out.verts.push_back(static_cast<float>(V_[i][1]));
        out.verts.push_back(static_cast<float>(V_[i][2]));
      }
    for (size_t i = 0; i < F_.size(); ++i)
      if (!fdead_[i])
        for (int k = 0; k < 3; ++k)
          out.faces.push_back(remap[F_[i][k]]);
    return out;
  }

 private:
  using V3 = detail::V3;

  static uint64_t ekey(int64_t a, int64_t b) {
    if (a > b) std::swap(a, b);
    return (static_cast<uint64_t>(a) << 32) | static_cast<uint64_t>(b);
  }

  void add_boundary_constraints() {
    // plane through the boundary edge, perpendicular to its one face,
    // weighted by edge length^2 * penalty: rims resist tangential
    // shrinkage but still allow sliding along straight boundary runs
    constexpr double kBoundaryPenalty = 1e3;
    for (size_t i = 0; i < F_.size(); ++i) {
      if (fdead_[i]) continue;
      for (int k = 0; k < 3; ++k) {
        const int64_t a = F_[i][k], b = F_[i][(k + 1) % 3];
        if (ecount_[ekey(a, b)] != 1) continue;
        const V3 ed = detail::sub(V_[b], V_[a]);
        const V3 fn = detail::cross(
            detail::sub(V_[F_[i][1]], V_[F_[i][0]]),
            detail::sub(V_[F_[i][2]], V_[F_[i][0]]));
        V3 pn = detail::cross(ed, fn);
        const double len = detail::norm(pn);
        if (len < 1e-300) continue;
        pn = {pn[0] / len, pn[1] / len, pn[2] / len};
        const double d = -detail::dot(pn, V_[a]);
        const double w = kBoundaryPenalty * detail::dot(ed, ed);
        Q_[a].add_plane(pn[0], pn[1], pn[2], d, w);
        Q_[b].add_plane(pn[0], pn[1], pn[2], d, w);
      }
    }
  }

  template <typename Heap>
  void push_edge(Heap& heap, int64_t u, int64_t v) {
    if (u == v || vdead_[u] || vdead_[v]) return;
    Quad q = Q_[u];
    q.add(Q_[v]);
    // candidates: quadric argmin (when solvable), midpoint, endpoints
    V3 best = {(V_[u][0] + V_[v][0]) / 2, (V_[u][1] + V_[v][1]) / 2,
               (V_[u][2] + V_[v][2]) / 2};
    double bc = q.eval(best[0], best[1], best[2]);
    for (const V3& c : {V_[u], V_[v]}) {
      const double cc = q.eval(c[0], c[1], c[2]);
      if (cc < bc) { bc = cc; best = c; }
    }
    double s[3];
    if (q.solve(s)) {
      const double cc = q.eval(s[0], s[1], s[2]);
      if (cc < bc) { bc = cc; best = {s[0], s[1], s[2]}; }
    }
    heap.push({std::max(bc, 0.0), u, v, stamp_[u], stamp_[v], best});
  }

  // alive faces currently containing vertex u (vf_ lists are lazily
  // filtered: they may hold dead faces or faces that dropped u)
  void faces_of(int64_t u, std::vector<int64_t>& out) const {
    out.clear();
    for (int64_t fi : vf_[u]) {
      if (fdead_[fi]) continue;
      const auto& f = F_[fi];
      if (f[0] == u || f[1] == u || f[2] == u) out.push_back(fi);
    }
  }

  void neighbours(int64_t u, std::vector<int64_t>& out) const {
    out.clear();
    for (int64_t fi : vf_[u]) {
      if (fdead_[fi]) continue;
      const auto& f = F_[fi];
      if (f[0] != u && f[1] != u && f[2] != u) continue;
      for (int k = 0; k < 3; ++k)
        if (f[k] != u) out.push_back(f[k]);
    }
    std::sort(out.begin(), out.end());
    out.erase(std::unique(out.begin(), out.end()), out.end());
  }

  bool collapse_ok(int64_t u, int64_t v, const V3& p) {
    auto& fu = scratch_fu_;
    auto& fv = scratch_fv_;
    faces_of(u, fu);
    faces_of(v, fv);
    // shared faces = faces containing the edge
    int shared = 0;
    for (int64_t fi : fu) {
      const auto& f = F_[fi];
      if (f[0] == v || f[1] == v || f[2] == v) ++shared;
    }
    if (shared == 0) return false;  // edge no longer exists
    // link condition: every common neighbour must be the apex of a
    // shared face, else collapsing pinches a non-manifold edge
    auto& nu = scratch_nu_;
    auto& nv_ = scratch_nv_;
    neighbours(u, nu);
    neighbours(v, nv_);
    int common = 0;
    for (int64_t w : nu)
      if (w != v && std::binary_search(nv_.begin(), nv_.end(), w))
        ++common;
    if (common != shared) return false;
    // normal-flip / degeneracy rejection on every surviving face
    for (const auto* fl : {&fu, &fv}) {
      const int64_t moved = (fl == &fu) ? u : v;
      for (int64_t fi : *fl) {
        const auto& f = F_[fi];
        if (f[0] == u || f[1] == u || f[2] == u)
          if (f[0] == v || f[1] == v || f[2] == v)
            continue;  // shared face: deleted by the collapse
        V3 a = V_[f[0]], b = V_[f[1]], c = V_[f[2]];
        const V3 n0 = detail::cross(detail::sub(b, a), detail::sub(c, a));
        V3 a2 = (f[0] == moved) ? p : a;
        V3 b2 = (f[1] == moved) ? p : b;
        V3 c2 = (f[2] == moved) ? p : c;
        const V3 n1 = detail::cross(detail::sub(b2, a2),
                                    detail::sub(c2, a2));
        const double l1 = detail::norm(n1);
        if (l1 < 1e-14) return false;                  // degenerates
        if (detail::dot(n0, n1) <= 0) return false;    // flips
      }
    }
    return true;
  }

  void do_collapse(int64_t u, int64_t v, const V3& p) {
    V_[u] = p;
    Q_[u].add(Q_[v]);
    vdead_[v] = 1;
    ++stamp_[u];
    ++stamp_[v];
    faces_of(v, scratch_fv_);
    for (int64_t fi : scratch_fv_) {
      auto& f = F_[fi];
      if (f[0] == u || f[1] == u || f[2] == u) {
        fdead_[fi] = 1;  // contained the edge -> degenerate
        --alive_f_;
        continue;
      }
      for (int k = 0; k < 3; ++k)
        if (f[k] == v) f[k] = u;
      vf_[u].push_back(fi);
    }
    // compact u's adjacency in place: collapses append v's surviving
    // faces and strand dead ones, and without this the lazily-filtered
    // lists grow past the true degree — O(total collapses) scans made
    // decimation ~15 us/face; compaction keeps it amortized O(degree)
    auto& lst = vf_[u];
    size_t w = 0;
    for (int64_t fi : lst) {
      if (fdead_[fi]) continue;
      const auto& f = F_[fi];
      if (f[0] == u || f[1] == u || f[2] == u) lst[w++] = fi;
    }
    lst.resize(w);
  }

  std::vector<V3> V_;
  std::vector<std::array<int64_t, 3>> F_;
  std::vector<char> fdead_, vdead_;
  std::vector<Quad> Q_;
  std::vector<uint32_t> stamp_;
  std::vector<std::vector<int64_t>> vf_;
  std::unordered_map<uint64_t, int> ecount_;
  int64_t alive_f_ = 0;
  // per-instance scratch (single-threaded decimation; avoids the
  // alloc-per-candidate cost in collapse_ok/do_collapse)
  std::vector<int64_t> scratch_fu_, scratch_fv_, scratch_nu_,
      scratch_nv_;
};

// verts [nv*3] f32, faces [nf*3] i64 -> decimated MeshOut.
// target_faces: stop at or below this face count (0 = only the
// max_error criterion). max_error < 0 disables the error ceiling.
inline mt::MeshOut simplify(const float* verts, int64_t nv,
                            const int64_t* faces, int64_t nf,
                            int64_t target_faces, double max_error) {
  Simplifier s(verts, nv, faces, nf);
  s.run(target_faces, max_error);
  return s.compact();
}

}  // namespace qem
