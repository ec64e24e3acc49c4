// BVH over a triangle soup: closest-point queries + fast generalized
// winding number (Barill et al. 2018 dipole approximation) for robust
// inside/outside classification of possibly non-watertight meshes.
// Self-contained; replaces the GL-based visible-surface signing of the
// lineage preprocessing stage with a headless method (SURVEY.md s2.4).
#pragma once
#include <algorithm>
#include <cfloat>
#include <cstdint>
#include <numeric>
#include <vector>

#include "vec3.hpp"

struct Tri {
  Vec3 a, b, c;
  Vec3 centroid() const { return (a + b + c) / 3.0f; }
  Vec3 area_normal() const { return cross(b - a, c - a) * 0.5f; }
};

struct BvhNode {
  Vec3 lo, hi;          // AABB
  Vec3 wn_center;       // area-weighted centroid (winding dipole)
  Vec3 wn_normal;       // summed area-weighted normals
  float wn_radius = 0;  // bounding radius around wn_center
  int left = -1, right = -1;  // children; leaf if left < 0
  int begin = 0, end = 0;     // triangle range (leaf)
};

class Bvh {
 public:
  explicit Bvh(std::vector<Tri> tris, int leaf_size = 8)
      : tris_(std::move(tris)), leaf_size_(leaf_size) {
    order_.resize(tris_.size());
    std::iota(order_.begin(), order_.end(), 0);
    nodes_.reserve(tris_.size() / 2 + 1);
    root_ = build(0, static_cast<int>(tris_.size()));
  }

  const Tri& tri(int sorted_idx) const { return tris_[order_[sorted_idx]]; }

  // Unsigned distance + closest point.
  float closest(const Vec3& p, Vec3* closest_pt = nullptr) const {
    float best = FLT_MAX;
    Vec3 best_pt;
    closest_rec(root_, p, best, best_pt);
    if (closest_pt) *closest_pt = best_pt;
    return std::sqrt(best);
  }

  // Generalized winding number (~1 inside, ~0 outside).
  double winding(const Vec3& p, float beta = 2.0f) const {
    return winding_rec(root_, p, beta) / (4.0 * M_PI);
  }

 private:
  static float box_dist2(const Vec3& p, const Vec3& lo, const Vec3& hi) {
    float d2 = 0;
    for (int i = 0; i < 3; ++i) {
      float v = p[i], l = lo[i], h = hi[i];
      float d = v < l ? l - v : (v > h ? v - h : 0);
      d2 += d * d;
    }
    return d2;
  }

  int build(int begin, int end) {
    BvhNode n;
    n.lo = {FLT_MAX, FLT_MAX, FLT_MAX};
    n.hi = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
    Vec3 wsum{0, 0, 0};
    double area_sum = 0;
    Vec3 nsum{0, 0, 0};
    for (int i = begin; i < end; ++i) {
      const Tri& t = tris_[order_[i]];
      n.lo = vmin(n.lo, vmin(t.a, vmin(t.b, t.c)));
      n.hi = vmax(n.hi, vmax(t.a, vmax(t.b, t.c)));
      Vec3 an = t.area_normal();
      float area = norm(an);
      nsum += an;
      wsum += t.centroid() * area;
      area_sum += area;
    }
    n.wn_normal = nsum;
    n.wn_center = area_sum > 0 ? wsum / static_cast<float>(area_sum)
                               : (n.lo + n.hi) * 0.5f;
    float r2 = 0;
    for (int i = begin; i < end; ++i) {
      const Tri& t = tris_[order_[i]];
      for (const Vec3* v : {&t.a, &t.b, &t.c})
        r2 = std::fmax(r2, norm2(*v - n.wn_center));
    }
    n.wn_radius = std::sqrt(r2);
    n.begin = begin;
    n.end = end;
    int idx = static_cast<int>(nodes_.size());
    nodes_.push_back(n);
    if (end - begin > leaf_size_) {
      Vec3 ext = n.hi - n.lo;
      int axis = ext.x > ext.y ? (ext.x > ext.z ? 0 : 2)
                               : (ext.y > ext.z ? 1 : 2);
      int mid = (begin + end) / 2;
      std::nth_element(order_.begin() + begin, order_.begin() + mid,
                       order_.begin() + end, [&](int ia, int ib) {
                         return tris_[ia].centroid()[axis]
                                < tris_[ib].centroid()[axis];
                       });
      int l = build(begin, mid);
      int r = build(mid, end);
      nodes_[idx].left = l;
      nodes_[idx].right = r;
    }
    return idx;
  }

  void closest_rec(int ni, const Vec3& p, float& best2, Vec3& best_pt) const {
    const BvhNode& n = nodes_[ni];
    if (box_dist2(p, n.lo, n.hi) >= best2) return;
    if (n.left < 0) {
      for (int i = n.begin; i < n.end; ++i) {
        const Tri& t = tris_[order_[i]];
        Vec3 q = closest_point_triangle(p, t.a, t.b, t.c);
        float d2 = norm2(q - p);
        if (d2 < best2) {
          best2 = d2;
          best_pt = q;
        }
      }
      return;
    }
    float dl = box_dist2(p, nodes_[n.left].lo, nodes_[n.left].hi);
    float dr = box_dist2(p, nodes_[n.right].lo, nodes_[n.right].hi);
    if (dl < dr) {
      closest_rec(n.left, p, best2, best_pt);
      closest_rec(n.right, p, best2, best_pt);
    } else {
      closest_rec(n.right, p, best2, best_pt);
      closest_rec(n.left, p, best2, best_pt);
    }
  }

  // Exact solid angle of one triangle as seen from p (van Oosterom-Strackee).
  static double tri_solid_angle(const Vec3& p, const Tri& t) {
    Vec3 a = t.a - p, b = t.b - p, c = t.c - p;
    double la = norm(a), lb = norm(b), lc = norm(c);
    double num = dot(a, cross(b, c));
    double den = la * lb * lc + dot(a, b) * lc + dot(b, c) * la
                 + dot(c, a) * lb;
    return 2.0 * std::atan2(num, den);
  }

  // Returns the solid-angle sum (NOT divided by 4*pi).
  double winding_rec(int ni, const Vec3& p, float beta) const {
    const BvhNode& n = nodes_[ni];
    Vec3 d = p - n.wn_center;
    double r = norm(d);
    if (r > beta * n.wn_radius) {
      // far-field dipole: sum_t A_t n_t . (p - c) / |p - c|^3
      return -dot(n.wn_normal, d) / (r * r * r);
    }
    if (n.left < 0) {
      double s = 0;
      for (int i = n.begin; i < n.end; ++i)
        s += tri_solid_angle(p, tris_[order_[i]]);
      return s;
    }
    return winding_rec(n.left, p, beta) + winding_rec(n.right, p, beta);
  }

  std::vector<Tri> tris_;
  std::vector<int> order_;
  std::vector<BvhNode> nodes_;
  int leaf_size_;
  int root_;
};
