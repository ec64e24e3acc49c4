// preprocess_mesh: mesh file -> SDF sample set (.npz with pos/neg [N,4]).
//
// TPU-native replacement for the lineage's GL-based C++ preprocessing
// stage (canonical DeepSDF PreprocessMesh; the mounted reference carries
// no code, README.md:1): headless BVH closest-point distances signed by a
// fast generalized winding number, so non-watertight meshes work without
// a GPU/EGL context. Sampling contract matches data/analytic.py:
// 95% surface-biased (two Gaussian shells, std 0.05 / 0.0158 after
// unit-sphere normalization) + 5% uniform in [-1,1]^3.
//
// Usage: preprocess_mesh <mesh.(obj|ply)> <out.npz> [num_samples=500000]
#include <array>
#include <atomic>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <thread>
#include <vector>

#include "../common/bvh.hpp"
#include "../common/mesh_io.hpp"
#include "../common/npy.hpp"
#include "../common/vec3.hpp"

namespace {

// Normalizes in place; reports the applied transform (x' = (x-center)*scale)
// so consumers can map decoded geometry back to source coordinates.
void normalize_unit_sphere(Mesh* m, Vec3* out_center, float* out_scale,
                           float padding = 1.03f) {
  Vec3 lo{FLT_MAX, FLT_MAX, FLT_MAX}, hi{-FLT_MAX, -FLT_MAX, -FLT_MAX};
  for (const Vec3& v : m->verts) {
    lo = vmin(lo, v);
    hi = vmax(hi, v);
  }
  Vec3 center = (lo + hi) * 0.5f;
  float r = 0;
  for (const Vec3& v : m->verts) r = std::fmax(r, norm(v - center));
  float s = 1.0f / (r * padding);
  for (Vec3& v : m->verts) v = (v - center) * s;
  *out_center = center;
  *out_scale = s;
}

std::vector<Vec3> sample_surface(const Mesh& m, size_t n, std::mt19937* rng) {
  std::vector<double> cum(m.faces.size());
  double acc = 0;
  for (size_t i = 0; i < m.faces.size(); ++i) {
    const auto& f = m.faces[i];
    acc += norm(cross(m.verts[f[1]] - m.verts[f[0]],
                      m.verts[f[2]] - m.verts[f[0]])) * 0.5;
    cum[i] = acc;
  }
  if (!(acc > 0.0)) return {};  // all-degenerate surface: caller errors
  std::uniform_real_distribution<double> ud(0.0, acc);
  std::uniform_real_distribution<float> uf(0.0f, 1.0f);
  std::vector<Vec3> out;
  out.reserve(n);
  for (size_t i = 0; i < n; ++i) {
    double x = ud(*rng);
    size_t t = std::lower_bound(cum.begin(), cum.end(), x) - cum.begin();
    const auto& f = m.faces[t];
    float u = uf(*rng), v = uf(*rng);
    if (u + v > 1) {
      u = 1 - u;
      v = 1 - v;
    }
    out.push_back(m.verts[f[0]] + (m.verts[f[1]] - m.verts[f[0]]) * u
                  + (m.verts[f[2]] - m.verts[f[0]]) * v);
  }
  return out;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: %s <mesh.(obj|ply)> <out.npz> [num_samples]\n",
                 argv[0]);
    return 2;
  }
  const std::string mesh_path = argv[1];
  const std::string out_path = argv[2];
  const size_t n_total = argc > 3 ? std::strtoull(argv[3], nullptr, 10)
                                  : 500000;

  Mesh mesh = load_mesh(mesh_path);
  // Hostile-input guard (mesh_io.hpp sanitize_mesh): out-of-range
  // indices, NaN/Inf vertices, and exact-degenerate faces are dropped
  // with a warning instead of poisoning the BVH / normalization.
  const size_t dropped = sanitize_mesh(&mesh);
  if (dropped)
    std::fprintf(stderr, "warning: %s: dropped %zu invalid face(s)\n",
                 mesh_path.c_str(), dropped);
  if (mesh.faces.empty()) {
    std::fprintf(stderr, "empty mesh (after sanitization): %s\n",
                 mesh_path.c_str());
    return 1;
  }
  Vec3 norm_center;
  float norm_scale;
  normalize_unit_sphere(&mesh, &norm_center, &norm_scale);

  std::vector<Tri> tris;
  tris.reserve(mesh.faces.size());
  for (const auto& f : mesh.faces)
    tris.push_back({mesh.verts[f[0]], mesh.verts[f[1]], mesh.verts[f[2]]});
  Bvh bvh(std::move(tris));

  // Build query set: two Gaussian shells around surface samples + uniform.
  std::mt19937 rng(0);
  const size_t n_surf = static_cast<size_t>(n_total * 0.95);
  const size_t n_unif = n_total - n_surf;
  const size_t half = n_surf / 2;
  std::vector<Vec3> base = sample_surface(mesh, n_surf, &rng);
  if (base.empty()) {
    std::fprintf(stderr, "degenerate mesh (zero surface area): %s\n",
                 mesh_path.c_str());
    return 1;
  }
  std::vector<Vec3> queries;
  queries.reserve(n_total);
  std::normal_distribution<float> g1(0.0f, 0.05f), g2(0.0f, 0.0158f);
  for (size_t i = 0; i < n_surf; ++i) {
    auto& g = i < half ? g1 : g2;
    queries.push_back(base[i] + Vec3{g(rng), g(rng), g(rng)});
  }
  std::uniform_real_distribution<float> uc(-1.0f, 1.0f);
  for (size_t i = 0; i < n_unif; ++i)
    queries.push_back({uc(rng), uc(rng), uc(rng)});

  // Signed distances, multithreaded.
  std::vector<float> sdf(queries.size());
  const unsigned n_threads = std::max(1u, std::thread::hardware_concurrency());
  std::atomic<size_t> next{0};
  auto worker = [&]() {
    size_t i;
    while ((i = next.fetch_add(256)) < queries.size()) {
      size_t end = std::min(i + 256, queries.size());
      for (; i < end; ++i) {
        float d = bvh.closest(queries[i]);
        double w = bvh.winding(queries[i]);
        sdf[i] = w > 0.5 ? -d : d;
      }
    }
  };
  std::vector<std::thread> pool;
  for (unsigned t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();

  // Split by sign into [N,4] rows (xyz, sdf).
  std::vector<float> pos, neg;
  pos.reserve(queries.size() * 2);
  neg.reserve(queries.size() * 2);
  for (size_t i = 0; i < queries.size(); ++i) {
    auto& dst = sdf[i] >= 0 ? pos : neg;
    dst.push_back(queries[i].x);
    dst.push_back(queries[i].y);
    dst.push_back(queries[i].z);
    dst.push_back(sdf[i]);
  }
  const float center_arr[3] = {norm_center.x, norm_center.y, norm_center.z};
  const float scale_arr[1] = {norm_scale};
  // GT surface samples for Chamfer evaluation (the canonical lineage's
  // SampleVisibleMeshSurface stage, folded into this tool): a prefix of
  // the area-weighted surface draws, in normalized coordinates.
  const size_t n_gt = std::min<size_t>(30000, base.size());
  std::vector<float> surf;
  surf.reserve(n_gt * 3);
  for (size_t i = 0; i < n_gt; ++i) {
    surf.push_back(base[i].x);
    surf.push_back(base[i].y);
    surf.push_back(base[i].z);
  }
  npy::save_npz_f32(out_path, {
      {"pos", {pos.data(), {pos.size() / 4, 4}}},
      {"neg", {neg.data(), {neg.size() / 4, 4}}},
      {"center", {center_arr, {3}}},
      {"scale", {scale_arr, {1}}},
      {"surface", {surf.data(), {n_gt, 3}}},
  });
  std::printf("%s: %zu samples (%zu pos, %zu neg) -> %s\n",
              mesh_path.c_str(), queries.size(), pos.size() / 4,
              neg.size() / 4, out_path.c_str());
  return 0;
}
