// ctest suite for the native tools (SURVEY.md s4.8): BVH distance +
// winding oracles on golden meshes, marching-tetrahedra geometry/topology,
// zip/npy writer structure.
#include <cassert>
#include <cmath>
#include <cstdio>
#include <map>
#include <set>
#include <vector>

#include "../common/bvh.hpp"
#include "../common/npy.hpp"
#include "../marching_cubes/mt_core.hpp"
#include "../simplify/qem_core.hpp"

static int failures = 0;
#define CHECK(cond)                                                  \
  do {                                                               \
    if (!(cond)) {                                                   \
      std::printf("FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond);    \
      ++failures;                                                    \
    }                                                                \
  } while (0)

// Unit cube [-0.5, 0.5]^3 as 12 triangles, outward CCW winding.
static std::vector<Tri> cube_tris() {
  const float h = 0.5f;
  Vec3 v[8];
  for (int i = 0; i < 8; ++i)
    v[i] = {(i & 1) ? h : -h, (i & 2) ? h : -h, (i & 4) ? h : -h};
  int quads[6][4] = {
      {0, 2, 3, 1},  // z = -h (normal -z)
      {4, 5, 7, 6},  // z = +h
      {0, 1, 5, 4},  // y = -h
      {2, 6, 7, 3},  // y = +h
      {0, 4, 6, 2},  // x = -h
      {1, 3, 7, 5},  // x = +h
  };
  std::vector<Tri> tris;
  for (auto& q : quads) {
    tris.push_back({v[q[0]], v[q[1]], v[q[2]]});
    tris.push_back({v[q[0]], v[q[2]], v[q[3]]});
  }
  return tris;
}

static void test_bvh_distance_and_winding() {
  Bvh bvh(cube_tris());
  // distances
  CHECK(std::fabs(bvh.closest({0.9f, 0, 0}) - 0.4f) < 1e-5f);
  CHECK(std::fabs(bvh.closest({0, 0, 0}) - 0.5f) < 1e-5f);
  CHECK(std::fabs(bvh.closest({0.5f, 0.5f, 0.5f})) < 1e-6f);
  Vec3 far{1.5f, 1.5f, 1.5f};
  CHECK(std::fabs(bvh.closest(far) - std::sqrt(3.0f)) < 1e-5f);
  // winding: inside ~1, outside ~0 (dipole + exact near field)
  CHECK(bvh.winding({0, 0, 0}) > 0.9);
  CHECK(bvh.winding({0.3f, -0.2f, 0.1f}) > 0.9);
  CHECK(bvh.winding({0.9f, 0, 0}) < 0.1);
  CHECK(bvh.winding({1.5f, 1.5f, 1.5f}) < 0.1);
  // grazing points just off faces
  CHECK(bvh.winding({0.49f, 0, 0}) > 0.5);
  CHECK(bvh.winding({0.51f, 0, 0}) < 0.5);
}

static void test_mt_sphere() {
  const int R = 33;
  std::vector<float> grid(static_cast<size_t>(R) * R * R);
  const float origin[3] = {-1, -1, -1};
  const float spacing = 2.0f / (R - 1);
  for (int x = 0; x < R; ++x)
    for (int y = 0; y < R; ++y)
      for (int z = 0; z < R; ++z) {
        float px = -1 + spacing * x, py = -1 + spacing * y,
              pz = -1 + spacing * z;
        grid[(static_cast<size_t>(x) * R + y) * R + z] =
            std::sqrt(px * px + py * py + pz * pz) - 0.5f;
      }
  mt::MeshOut m = mt::extract(grid.data(), R, 0.0f, origin, spacing);
  size_t nv = m.verts.size() / 3, nf = m.faces.size() / 3;
  CHECK(nv > 500 && nf > 500);
  // all vertices within one cell of the true radius
  float max_err = 0;
  for (size_t i = 0; i < nv; ++i) {
    float r = std::sqrt(m.verts[3 * i] * m.verts[3 * i]
                        + m.verts[3 * i + 1] * m.verts[3 * i + 1]
                        + m.verts[3 * i + 2] * m.verts[3 * i + 2]);
    max_err = std::fmax(max_err, std::fabs(r - 0.5f));
  }
  CHECK(max_err < spacing);
  // Euler characteristic of the welded closed genus-0 surface: V-E+F == 2
  std::set<std::pair<int64_t, int64_t>> edges;
  for (size_t i = 0; i < nf; ++i) {
    int64_t a = m.faces[3 * i], b = m.faces[3 * i + 1],
            c = m.faces[3 * i + 2];
    edges.insert({std::min(a, b), std::max(a, b)});
    edges.insert({std::min(b, c), std::max(b, c)});
    edges.insert({std::min(a, c), std::max(a, c)});
  }
  CHECK(static_cast<int64_t>(nv) - static_cast<int64_t>(edges.size())
            + static_cast<int64_t>(nf) == 2);
}

static void test_mt_linear_field() {
  const int R = 9;
  std::vector<float> grid(static_cast<size_t>(R) * R * R);
  const float origin[3] = {-1, -1, -1};
  const float spacing = 2.0f / (R - 1);
  for (int x = 0; x < R; ++x)
    for (int y = 0; y < R; ++y)
      for (int z = 0; z < R; ++z)
        grid[(static_cast<size_t>(x) * R + y) * R + z] =
            (-1 + spacing * x) - 0.3f;
  mt::MeshOut m = mt::extract(grid.data(), R, 0.0f, origin, spacing);
  CHECK(m.verts.size() > 0);
  for (size_t i = 0; i < m.verts.size() / 3; ++i)
    CHECK(std::fabs(m.verts[3 * i] - 0.3f) < 1e-6f);
}

static void test_qem_simplify_sphere() {
  // decimate the MC sphere: face budget honored, surface stays on the
  // sphere, closed genus-0 topology survives (V - E + F == 2)
  const int R = 33;
  std::vector<float> grid(static_cast<size_t>(R) * R * R);
  const float origin[3] = {-1, -1, -1};
  const float spacing = 2.0f / (R - 1);
  for (int x = 0; x < R; ++x)
    for (int y = 0; y < R; ++y)
      for (int z = 0; z < R; ++z) {
        float px = -1 + spacing * x, py = -1 + spacing * y,
              pz = -1 + spacing * z;
        grid[(static_cast<size_t>(x) * R + y) * R + z] =
            std::sqrt(px * px + py * py + pz * pz) - 0.5f;
      }
  mt::MeshOut m = mt::extract(grid.data(), R, 0.0f, origin, spacing);
  const int64_t nf_in = static_cast<int64_t>(m.faces.size() / 3);
  const int64_t target = nf_in / 8;
  mt::MeshOut s = qem::simplify(m.verts.data(), m.verts.size() / 3,
                                m.faces.data(), nf_in, target, -1.0);
  const int64_t nv = static_cast<int64_t>(s.verts.size() / 3);
  const int64_t nf = static_cast<int64_t>(s.faces.size() / 3);
  CHECK(nf <= target && nf > target / 2);
  float max_err = 0;
  for (int64_t i = 0; i < nv; ++i) {
    float r = std::sqrt(s.verts[3 * i] * s.verts[3 * i]
                        + s.verts[3 * i + 1] * s.verts[3 * i + 1]
                        + s.verts[3 * i + 2] * s.verts[3 * i + 2]);
    max_err = std::fmax(max_err, std::fabs(r - 0.5f));
  }
  CHECK(max_err < 2 * spacing);  // decimated chord sag stays ~cell-size
  std::set<std::pair<int64_t, int64_t>> edges;
  std::map<std::pair<int64_t, int64_t>, int> ecnt;
  for (int64_t i = 0; i < nf; ++i) {
    int64_t f[3] = {s.faces[3 * i], s.faces[3 * i + 1],
                    s.faces[3 * i + 2]};
    CHECK(f[0] != f[1] && f[1] != f[2] && f[0] != f[2]);
    CHECK(f[0] >= 0 && f[0] < nv && f[1] >= 0 && f[1] < nv && f[2] >= 0
          && f[2] < nv);
    for (int k = 0; k < 3; ++k) {
      auto e = std::minmax(f[k], f[(k + 1) % 3]);
      edges.insert(e);
      ++ecnt[e];
    }
  }
  CHECK(static_cast<int64_t>(nv) - static_cast<int64_t>(edges.size())
            + nf == 2);
  for (auto& kv : ecnt) CHECK(kv.second == 2);  // stays closed manifold
}

static void test_qem_simplify_noise_mesh() {
  // adversarial input: random-sign grid -> maximal crossing density,
  // many open rims, many components. Output must stay a valid
  // manifold-or-boundary mesh at an aggressive budget. (Run under
  // -DLDM_SANITIZE=ON this also sweeps the EdgeMap/boundary paths.)
  const int R = 13;
  std::vector<float> grid(static_cast<size_t>(R) * R * R);
  uint64_t s = 0x9e3779b97f4a7c15ull;  // splitmix64 stream
  for (auto& g : grid) {
    s += 0x9e3779b97f4a7c15ull;
    uint64_t z = s;
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
    z ^= z >> 31;
    g = static_cast<float>(static_cast<int64_t>(z)) / 9.22e18f;
  }
  const float origin[3] = {-1, -1, -1};
  mt::MeshOut m = mt::extract(grid.data(), R, 0.0f, origin,
                              2.0f / (R - 1));
  const int64_t nf_in = static_cast<int64_t>(m.faces.size() / 3);
  CHECK(nf_in > 2000);
  mt::MeshOut q = qem::simplify(m.verts.data(), m.verts.size() / 3,
                                m.faces.data(), nf_in, nf_in / 5, -1.0);
  const int64_t nv = static_cast<int64_t>(q.verts.size() / 3);
  const int64_t nf = static_cast<int64_t>(q.faces.size() / 3);
  CHECK(nf > 0 && nf <= nf_in / 5 + nf_in / 20);  // best-effort budget
  std::map<std::pair<int64_t, int64_t>, int> ecnt;
  for (int64_t i = 0; i < nf; ++i) {
    int64_t f[3] = {q.faces[3 * i], q.faces[3 * i + 1],
                    q.faces[3 * i + 2]};
    CHECK(f[0] != f[1] && f[1] != f[2] && f[0] != f[2]);
    CHECK(f[0] >= 0 && f[0] < nv && f[1] >= 0 && f[1] < nv && f[2] >= 0
          && f[2] < nv);
    for (int k = 0; k < 3; ++k)
      ++ecnt[std::minmax(f[k], f[(k + 1) % 3])];
  }
  for (auto& kv : ecnt) CHECK(kv.second <= 2);  // no non-manifold fins
}

static void test_npz_structure() {
  // minimal structural check: magic numbers + sizes land where expected
  float a[8] = {1, 2, 3, 4, 5, 6, 7, 8};
  const char* path = "/tmp/native_test.npz";
  npy::save_npz_f32(path, {{"pos", {a, {2, 4}}}});
  FILE* f = std::fopen(path, "rb");
  CHECK(f != nullptr);
  uint32_t sig = 0;
  std::fread(&sig, 4, 1, f);
  CHECK(sig == 0x04034b50u);  // local file header magic
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  CHECK(size > 32 + 7);  // header + "pos.npy" + data + central dir
  std::fclose(f);
}

int main() {
  test_bvh_distance_and_winding();
  test_mt_sphere();
  test_mt_linear_field();
  test_qem_simplify_sphere();
  test_qem_simplify_noise_mesh();
  test_npz_structure();
  if (failures == 0) std::printf("ALL NATIVE TESTS PASSED\n");
  return failures == 0 ? 0 : 1;
}
